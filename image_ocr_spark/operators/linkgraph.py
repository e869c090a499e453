"""Host-level link graph + exact-integer PageRank centrality.

Production web pipelines weight and prune crawl frontiers with host-level
link centrality (Common Crawl publishes harmonic/PageRank host ranks;
CCNet/RefinedWeb-style curation uses them as quality priors).  This module
builds that signal from raw pages in three composable stages:

1. **extract_links(pages)** — (url, href) per anchor, via one Arrow pass
   that calls the pycore extractor (pycore/links.py) per row: the Spark
   output is byte-identical to pure Python by construction, the same
   single-source-of-truth discipline as the tokenizer.  Scan-stage only.
2. **resolve_edges(links)** — (src_host, dst_host) per link: pure SQL
   string expressions (absolute http(s), protocol-relative, and
   site-relative hrefs; ALL '://'-less scheme hrefs and #-only dropped;
   scheme-specific default-port strip shared with functions/urls.py).
   DuckDB replays every branch bit-for-bit (tests/test_linkgraph.py).
3. **host_rank(edges)** — damped PageRank over the host multigraph in
   EXACT INTEGERS (micro-rank units, `div` integer division in both
   engines), so a fixed round count is replayed value-identically by an
   unrolled materialized-CTE DuckDB oracle — the same determinism recipe
   as Lloyd/k-means++ (operators/similarity.py).

Scale shape (the 100 TB story):
- link extraction rides the scan (no shuffle; hrefs are a few dozen
  strings per page);
- the edge relation aggregates to (src, dst, weight) — host pairs, which
  is ~10^9 rows for the whole web, NOT 10^12 (the per-page fan-in
  collapses in the map-side combine);
- each rank round is ONE shuffle (contributions grouped by dst host) and
  the loop carries the iterative-loop discipline proven in
  dedup_components: per-round EAGER localCheckpoint (plan growth is
  ~k^rounds without truncation — measured 104 s/round by iteration 4 in
  r04), exact RDD-id release of the previous round's storage, fixed
  round count (PageRank contracts geometrically at rate = damping; 8-12
  rounds is the production norm, and a fixed K is what makes the oracle
  replayable).

Dangling hosts (no out-links) keep receiving the base teleport mass but
redistribute nothing — the standard "mass leaks" simplification; ranks
remain a deterministic total order, which is all a quality prior needs.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from image_ocr_spark.operators.dedup import _ckpt_rdd_id, _unpersist_rdd_ids
from image_ocr_spark.pycore.links import find_links

DEFAULT_ROUNDS = 8
DEFAULT_DAMPING_MILLI = 850
RANK_SCALE = 1_000_000  # one host's initial rank, in micro-rank units

# rank checkpoints of past host_rank calls (same contract as
# dedup._CC_CKPT_IDS: NOT auto-released — a localCheckpoint unpersist
# destroys the data; call release_rank_checkpoints once consumed).
_RANK_CKPT_IDS: set = set()


def release_rank_checkpoints(spark) -> None:
    """Free the checkpoint storage of ALL previously returned host_rank
    results (they become unusable — localCheckpoints have no lineage)."""
    _unpersist_rdd_ids(spark.sparkContext, set(_RANK_CKPT_IDS))
    _RANK_CKPT_IDS.clear()


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    with_text: bool = False,
) -> DataFrame:
    """(url, href[, anchor]) — one row per anchor with a non-empty href,
    in document order; with_text=True adds the anchor's visible text
    (pycore find_links window semantics).  One Arrow pass over
    (url, html); everything else is pruned before the Python boundary
    (the fat-column discipline of the tokenizer)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            out_url, out_href, out_text = [], [], []
            for u, h in zip(urls, htmls):
                for href, text in find_links(h or b""):
                    out_url.append(u)
                    out_href.append(href)
                    if with_text:
                        out_text.append(text)
            cols = [pa.array(out_url, pa.string()), pa.array(out_href, pa.string())]
            names = ["url", "href"]
            if with_text:
                cols.append(pa.array(out_text, pa.string()))
                names.append("anchor")
            yield pa.RecordBatch.from_arrays(cols, names)

    schema = "url string, href string" + (", anchor string" if with_text else "")
    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInArrow(run, schema)


def _strip_default_port(hostport: Column, scheme: Column) -> Column:
    """Scheme-specific default-port strip (functions/urls.py rule:
    http://h:443 is a DISTINCT origin and must not be conflated)."""
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )


def resolve_edges(
    links: DataFrame,
    url_col: str = "url",
    href_col: str = "href",
    keep_cols: tuple = (),
) -> DataFrame:
    """(src_host, dst_host) per link — pure per-row string expressions
    (scan stage, shuffle-free, DuckDB-replayable).

    Branches, in order:
    - non-navigational schemes (any '^scheme:' href without '://':
      mailto:, javascript:, data:, tel:, skype:, about:, ...) and
      fragment-only hrefs -> dropped;
    - absolute http(s)://host/...  -> dst = lowercased host, scheme's
      default port stripped;
    - absolute OTHER-scheme hrefs (ftp:// ...) -> dropped (not part of
      the http host graph);
    - protocol-relative //host/... -> dst host with the SRC scheme's
      default-port rule (that is the scheme the link inherits);
    - everything else (site-relative /a, a/b, ../c, ?q) -> dst = src
      host.
    Rows whose src url has no parseable host are dropped.
    """
    href = F.btrim(F.col(href_col))
    src_scheme = F.lower(F.regexp_extract(F.col(url_col), "^([A-Za-z]+)://", 1))
    src_host = F.lower(
        F.regexp_extract(F.col(url_col), "^[A-Za-z]+://([^/?#]+)", 1)
    )
    src_host = _strip_default_port(src_host, src_scheme)

    href_scheme = F.lower(
        F.regexp_extract(href, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    abs_host = F.lower(F.regexp_extract(href, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    proto_rel_host = F.lower(F.regexp_extract(href, "^//([^/?#]+)", 1))

    # Any scheme-prefixed href WITHOUT '://' is non-navigational for the
    # host graph (mailto:, javascript:, data:, tel:, but also skype:,
    # news:, about:blank, ...) — a fixed allowdeny list let the long tail
    # fall through to the site-relative branch and self-link the source
    # host.  RFC 3986: a relative reference cannot contain ':' in its
    # first path segment, so the colon test cannot misfire on one.
    # Scheme'd '://' hrefs are branched below (http/https kept, others
    # dropped there).
    dropped = (
        (href == "")
        | href.startswith("#")
        | (href.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") & (href_scheme == ""))
    )
    dst = (
        F.when(
            href_scheme != "",
            F.when(
                href_scheme.isin("http", "https"),
                _strip_default_port(abs_host, href_scheme),
            ).otherwise(F.lit(None).cast("string")),
        )
        .when(href.startswith("//"), _strip_default_port(proto_rel_host, src_scheme))
        .otherwise(src_host)
    )
    return (
        links.select(
            src_host.alias("src_host"),
            F.when(dropped, F.lit(None).cast("string")).otherwise(dst).alias(
                "dst_host"
            ),
            *[F.col(c) for c in keep_cols],
        )
        .filter(
            F.col("dst_host").isNotNull()
            & (F.col("dst_host") != "")
            & (F.col("src_host") != "")
        )
    )


def host_rank(
    edges: DataFrame,
    rounds: int = DEFAULT_ROUNDS,
    damping_milli: int = DEFAULT_DAMPING_MILLI,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """(host, rank) — damped PageRank over the host multigraph after
    ``rounds`` synchronous iterations, in exact micro-rank integers.

    r_0(v) = RANK_SCALE for every host seen as a source or target;
    r_{t+1}(v) = base + (damping_milli * contrib_t(v)) div 1000, where
    contrib_t(v) = sum over in-edges (u,v) of (r_t(u) * w_uv) div W_u,
    base = ((1000 - damping_milli) * RANK_SCALE) div 1000, w_uv = link
    multiplicity and W_u = total out-weight of u (column ``tw``).  All divisions are
    integer `div` on longs — deterministic across partitionings and
    engines, so the unrolled DuckDB oracle matches value-for-value.
    """
    if rounds < 1:
        raise ValueError("host_rank needs rounds >= 1")
    src, dst = F.col(src_col), F.col(dst_col)
    # static per-edge relation: weight + source out-weight, checkpointed
    # once (it is re-joined every round)
    w = edges.groupBy(src.alias("src"), dst.alias("dst")).agg(
        F.count(F.lit(1)).alias("w")
    )
    outw = w.groupBy("src").agg(F.sum("w").alias("tw"))
    wj = w.join(outw, "src").localCheckpoint(eager=True)
    wj_id = _ckpt_rdd_id(wj)

    nodes = (
        edges.select(src.alias("host"))
        .unionByName(edges.select(dst.alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes_id = _ckpt_rdd_id(nodes)

    base = ((1000 - damping_milli) * RANK_SCALE) // 1000
    r = nodes.withColumn("rank", F.lit(RANK_SCALE).cast("long"))
    prev_id = None
    sc = edges.sparkSession.sparkContext
    for _ in range(rounds):
        contrib = (
            wj.join(r, wj["src"] == r["host"])
            .select("dst", F.expr("(rank * w) div tw").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        r_next = nodes.join(contrib, nodes["host"] == contrib["dst"], "left").select(
            "host",
            (
                F.lit(base)
                + F.expr(f"({damping_milli} * coalesce(contrib, 0L)) div 1000")
            ).alias("rank"),
        )
        # eager checkpoint = this round's materialization AND plan
        # truncation (dedup_components discipline); then free last round
        r = r_next.localCheckpoint(eager=True)
        new_id = _ckpt_rdd_id(r)
        if prev_id is not None:
            _unpersist_rdd_ids(sc, {prev_id})
        prev_id = new_id
    _unpersist_rdd_ids(sc, {wj_id, nodes_id})
    if prev_id is not None:
        _RANK_CKPT_IDS.add(prev_id)
    return r


def anchor_term_stats(
    pages: DataFrame,
    k: int = 5,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(dst_host, term, cnt, rank) — the top-k incoming anchor-text terms
    per target host, the classic "what the web calls this site" curation
    signal (anchor text is how link-based quality priors describe a
    target; cf. the anchor-text features of web search ranking and the
    link-text corpora distilled from Common Crawl).

    Scale shape: link+text extraction rides the scan (one Arrow pass),
    edge resolution is per-row expressions with the anchor column
    carried through, and the counting is ONE (dst_host, term) shuffle
    with map-side combine — hot terms collapse per map partition before
    moving.  The final top-k is a per-host window over the already
    aggregated (host, term) relation, which is |hosts| * |distinct
    terms| — web-vocabulary sized, not corpus sized.

    Terms are exact-space tokens of the anchor text (empties dropped),
    unfolded — the established cross-engine-identical tokenization;
    rank ties break term-ascending so the relation is deterministic.
    """
    from pyspark.sql import Window

    links = extract_links(pages, url_col, html_col, with_text=True)
    edges = resolve_edges(links, keep_cols=("anchor",))
    terms = (
        edges.select(
            "dst_host",
            F.explode(F.split(F.col("anchor"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    return (
        terms.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dst_host", "term", "cnt", F.col("rank").cast("long"))
    )


def robots_flags(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, robots_noindex, robots_nofollow) per page — the meta-robots
    gate (pycore/robots.py) as a scan-stage relation: corpus builders
    left_anti the noindex urls out before extraction, and the link graph
    drops a nofollow page's out-edges before resolve_edges (see
    tests/test_linkgraph.py for both compositions).

    Kept as a slim per-page flags relation (url + 2 booleans) rather
    than flags-on-pages so the fat html column crosses the Python
    boundary only here; in a production pipeline the same pycore call
    folds into the tokenizer's existing Arrow pass — one decode per page
    total."""
    from image_ocr_spark.pycore.robots import page_robots

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            ni, nf = [], []
            for h in htmls:
                a, b = page_robots(h or b"")
                ni.append(a)
                nf.append(b)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(ni), pa.array(nf)],
                ["url", "robots_noindex", "robots_nofollow"],
            )

    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInArrow(
        run, "url string, robots_noindex boolean, robots_nofollow boolean"
    )


def canonical_urls(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, canonical) — the page's declared rel=canonical target ('' if
    none).  Same one-Arrow-pass shape as extract_links; pycore
    (pycore/canonical.py) is the single source of truth."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..pycore.canonical import canonical_url

        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            canon = [canonical_url(h or b"") for h in htmls]
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()), pa.array(canon, pa.string())],
                ["url", "canonical"],
            )

    rows = pages.select(F.col(url_col).alias("url"), F.col(html_col).alias("html"))
    return rows.mapInArrow(run, "url string, canonical string")


def canonical_groups(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(canon_key, n_pages, representative): pages collapsed onto their
    declared canonical target — the dedup the web hands you for free,
    run BEFORE content hashing so variant URLs (tracking params,
    pagination, mirrors) never reach the byte-level dedups.  canon_key is
    the declared target when present else the page's own url; the
    representative is the url that IS its own canonical when one exists
    (else min url, deterministic).  One shuffle, map-side combined."""
    c = canonical_urls(pages, url_col, html_col)
    keyed = c.select(
        F.when(F.col("canonical") != "", F.col("canonical"))
        .otherwise(F.col("url"))
        .alias("canon_key"),
        "url",
    )
    return keyed.groupBy("canon_key").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.coalesce(
            F.min(F.when(F.col("url") == F.col("canon_key"), F.col("url"))),
            F.min("url"),
        ).alias("representative"),
    )
