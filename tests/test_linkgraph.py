"""Host link graph + integer PageRank (operators/linkgraph.py):

- href extraction: pycore unit semantics + Spark==pycore parity over the
  generated fixture corpus (the tokenizer's byte-identity discipline);
- edge resolution: every branch replayed by a DuckDB value oracle;
- host_rank: unrolled materialized-CTE DuckDB oracle, value-identical
  ranks over a deterministic cross-host multigraph derived from the
  fixture documents; storage released after the loop.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from image_ocr_spark.operators.linkgraph import (
    DEFAULT_DAMPING_MILLI,
    RANK_SCALE,
    extract_links,
    host_rank,
    release_rank_checkpoints,
    resolve_edges,
)
from image_ocr_spark.pycore.links import find_hrefs
from tests.conftest import SF_DIR

# ---------------------------------------------------------------- pycore


def test_find_hrefs_semantics():
    html = (
        b"<html><body>"
        b"<a href='/one'>1</a>"
        b'<A HREF="http://x.com/two?a=1">2</A>'
        b"<a class='z' href=bare/three>3</a>"
        b"<a name='anchor-no-href'>4</a>"
        b"<a href=''>empty</a>"
        b"<a href='  '>ws</a>"
        b"<!-- <a href='/commented-out'>no</a> -->"
        b"<abbr href='/not-an-anchor'>no</abbr>"
        b"<a\nhref='/newline'>5</a>"
        b"</body></html>"
    )
    assert find_hrefs(html) == [
        "/one",
        "http://x.com/two?a=1",
        "bare/three",
        "/newline",
    ]


def test_find_hrefs_never_raises_on_garbage():
    for raw in (b"", b"\xff\xfe\x00garbage", b"<a href=", b"<" * 4096, None or b"<a "):
        assert isinstance(find_hrefs(raw), list)


def test_extract_links_matches_pycore(spark, documents):
    """Spark Arrow pass == pure-Python extraction, page by page, over the
    generated fixture corpus (same single-source-of-truth guarantee as
    the tokenizer)."""
    from image_ocr_spark.operators.generate import generate_pages

    pages = generate_pages(documents.limit(200))
    got = {}
    for r in extract_links(pages).collect():
        got.setdefault(r.url, []).append(r.href)
    want = {}
    for r in pages.select("url", "html").collect():
        hrefs = find_hrefs(r.html or b"")
        if hrefs:
            want[r.url] = hrefs
    assert got == want
    assert sum(len(v) for v in want.values()) > 200  # fixture pages link


# ------------------------------------------------------------ resolution

LINK_ROWS = [
    # (src url, href) — one per resolution branch
    ("http://Src.example/a", "/relative/path"),
    ("http://src.example:80/a", "other/rel?q=1"),
    ("https://src.example:443/a", "../up"),
    ("http://src.example/a", "?query-only"),
    ("http://src.example/a", "http://DST.example/x"),
    ("http://src.example/a", "https://dst.example:443/x"),
    ("http://src.example/a", "http://dst.example:8080/x"),
    ("http://src.example/a", "HTTPS://dst.example/x"),
    ("http://src.example/a", "//proto.example:80/x"),
    ("https://src.example/a", "//proto.example:443/x"),
    ("http://src.example/a", "ftp://files.example/x"),
    ("http://src.example/a", "mailto:a@b.c"),
    ("http://src.example/a", "javascript:void(0)"),
    ("http://src.example/a", "tel:+1555"),
    ("http://src.example/a", "data:text/plain,hi"),
    ("http://src.example/a", "#frag-only"),
    # long-tail '://'-less schemes: must drop, never self-link (r06 fix)
    ("http://src.example/a", "skype:someone?call"),
    ("http://src.example/a", "news:comp.lang.python"),
    ("http://src.example/a", "about:blank"),
    ("http://src.example/a", "MAILTO:CAPS@b.c"),
    ("http://src.example/a", "./seg:colon-later"),
    ("not-a-url", "/x"),
]


def test_resolve_edges_matches_oracle(spark):
    links = spark.createDataFrame(LINK_ROWS, "url string, href string")
    got = sorted(
        (r.src_host, r.dst_host) for r in resolve_edges(links).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW links AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}', '{h}')" for u, h in LINK_ROWS)
        + ") t(url, href)"
    )
    want = sorted(
        (a, b)
        for a, b in con.execute(
            r"""
WITH resolved AS (
  SELECT
    CASE WHEN lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) = 'http'
         THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), ':80$', '')
         WHEN lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) = 'https'
         THEN regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), ':443$', '')
         ELSE lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) END AS src_host,
    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS src_scheme,
    trim(href) AS h
  FROM links
), branched AS (
  SELECT src_host,
    CASE
      WHEN h = '' OR h LIKE '#%'
           OR (regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*:')
               AND regexp_extract(h, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '')
        THEN NULL
      WHEN regexp_extract(h, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) <> '' THEN
        CASE lower(regexp_extract(h, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          WHEN 'http'  THEN regexp_replace(lower(regexp_extract(h, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':80$', '')
          WHEN 'https' THEN regexp_replace(lower(regexp_extract(h, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':443$', '')
          ELSE NULL END
      WHEN h LIKE '//%' THEN
        CASE src_scheme
          WHEN 'http'  THEN regexp_replace(lower(regexp_extract(h, '^//([^/?#]+)', 1)), ':80$', '')
          WHEN 'https' THEN regexp_replace(lower(regexp_extract(h, '^//([^/?#]+)', 1)), ':443$', '')
          ELSE lower(regexp_extract(h, '^//([^/?#]+)', 1)) END
      ELSE src_host END AS dst_host
  FROM resolved
)
SELECT src_host, dst_host FROM branched
WHERE dst_host IS NOT NULL AND dst_host <> '' AND src_host <> ''
"""
        ).fetchall()
    )
    con.close()
    assert got == want
    # spot-check the semantics the branches encode
    assert ("src.example", "dst.example") in got  # default ports stripped
    assert ("src.example", "dst.example:8080") in got  # real port kept
    assert ("src.example", "proto.example") in got  # proto-relative
    assert not any(d.startswith("files") for _, d in got)  # ftp dropped
    assert all(s != "not-a-url" for s, _ in got)  # unparseable src dropped


def test_resolve_edges_is_shuffle_free(spark):
    links = spark.createDataFrame(LINK_ROWS, "url string, href string")
    plan = resolve_edges(links)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -------------------------------------------------------------- PageRank

ROUNDS = 6
HOSTS = 17


def _edges(spark):
    """Deterministic cross-host multigraph: every doc contributes 3 edges
    host(doc_id%H) -> host(min((doc_id+s)%H, (doc_id*3+s)%H)), s=1..3 —
    the min of two uniforms SKEWS in-links toward low-numbered hosts, so
    ranks must differentiate; repeated (weighted) edges and self-loops
    both occur and the rank must handle them."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    return docs.select(
        F.concat(F.lit("host"), (F.col("doc_id") % HOSTS)).alias("src_host"),
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit("host"),
                        F.least(
                            (F.col("doc_id") + s) % HOSTS,
                            (F.col("doc_id") * 3 + s) % HOSTS,
                        ),
                    )
                    for s in (1, 2, 3)
                ]
            )
        ).alias("dst_host"),
    )


def _rank_oracle():
    base = ((1000 - DEFAULT_DAMPING_MILLI) * RANK_SCALE) // 1000
    sql = f"""
WITH docs AS (SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')),
edges AS MATERIALIZED (
  SELECT 'host' || (doc_id % {HOSTS}) AS src,
         'host' || least((doc_id + s) % {HOSTS}, (doc_id * 3 + s) % {HOSTS}) AS dst
  FROM docs, unnest([1, 2, 3]) t(s)
),
w AS MATERIALIZED (SELECT src, dst, count(*)::BIGINT AS w FROM edges GROUP BY 1, 2),
outw AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS tw FROM w GROUP BY 1),
nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)
),
r0 AS MATERIALIZED (SELECT host, {RANK_SCALE}::BIGINT AS rank FROM nodes)
"""
    for t in range(ROUNDS):
        sql += f""",
r{t + 1} AS MATERIALIZED (
  SELECT n.host,
         ({base} + ({DEFAULT_DAMPING_MILLI} * coalesce(c.contrib, 0)) // 1000)::BIGINT AS rank
  FROM nodes n LEFT JOIN (
    SELECT w.dst AS host, sum((r.rank * w.w) // o.tw)::BIGINT AS contrib
    FROM w JOIN outw o ON w.src = o.src JOIN r{t} r ON w.src = r.host
    GROUP BY w.dst
  ) c ON n.host = c.host
)"""
    return sql + f"\nSELECT host, rank FROM r{ROUNDS} ORDER BY host"


def test_host_rank_matches_unrolled_oracle(spark):
    got = sorted(
        (r.host, r.rank) for r in host_rank(_edges(spark), rounds=ROUNDS).collect()
    )
    con = duckdb.connect()
    want = con.execute(_rank_oracle()).fetchall()
    con.close()
    assert got == [tuple(r) for r in want]
    ranks = [r for _, r in got]
    assert len(set(ranks)) > 1  # non-degenerate: hosts differentiate
    assert all(r > 0 for r in ranks)
    release_rank_checkpoints(spark)


def test_host_rank_releases_intermediate_storage(spark):
    """After the loop only the FINAL rank checkpoint is held; after the
    release call, nothing of ours remains (storage-census discipline)."""
    sc = spark.sparkContext
    before = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    r = host_rank(_edges(spark), rounds=3)
    r.count()
    after = {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    assert len(after - before) == 1  # the final checkpoint, nothing else
    release_rank_checkpoints(spark)
    assert {
        int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()
    } - before == set()


def test_pages_to_rank_end_to_end(spark, documents):
    """Full chain on fixture pages: extract -> resolve -> rank. Fixture
    links are site-relative, so every host must appear with rank > 0."""
    from image_ocr_spark.operators.generate import generate_pages

    pages = generate_pages(documents.limit(120))
    edges = resolve_edges(extract_links(pages))
    ranks = host_rank(edges, rounds=2).collect()
    assert len(ranks) > 0
    assert all(r.rank > 0 for r in ranks)
    release_rank_checkpoints(spark)


# ----------------------------------------------------------- anchor text


def test_find_links_semantics():
    from image_ocr_spark.pycore.links import ANCHOR_TEXT_MAX, find_links

    html = (
        b"<html><body>"
        b"<a href='/a'>plain text</a>"
        b"<a href='/b'>with <b>inner</b> <i>markup</i></a>"
        b"<a href='/c'>  spaced \n out  </a>"
        b"<a href='/d'><img src='x.png'></a>"
        b"<a href='/e'>outer <a href='/f'>inner</a></a>"
        b"<a href='/g'>never closed"
        b"</body></html>"
    )
    links = find_links(html)
    assert [h for h, _ in links] == ["/a", "/b", "/c", "/d", "/e", "/f", "/g"]
    texts = dict(links)
    assert texts["/a"] == "plain text"
    assert texts["/b"] == "with inner markup"  # tags stripped, ws collapsed
    assert texts["/c"] == "spaced out"
    assert texts["/d"] == ""  # image-only anchor
    # overlapping (illegal-HTML) anchors each read to their nearest
    # close; the inner open tag is stripped as markup, so the outer
    # anchor's text includes the inner's — deterministic, documented
    assert texts["/e"] == "outer inner"
    assert texts["/f"] == "inner"
    assert texts["/g"] == ""  # unclosed to EOF -> no text
    # window cap: a close beyond ANCHOR_TEXT_MAX truncates, and a tag cut
    # mid-way by the cap does not leak into the text
    far = b"<a href='/far'>" + b"word " * 200 + b"<img src='y'></a>"
    (href, text), = find_links(far)
    assert href == "/far"
    assert len(text) <= ANCHOR_TEXT_MAX
    assert "<" not in text and text.startswith("word word")


def test_find_hrefs_unchanged_by_text_extraction():
    """find_hrefs delegates to find_links: href extraction is literally
    the same scan (regression pin for the r05 refactor)."""
    html = (
        b"<a href='/one'>1</a><A HREF=\"http://x.com/two\">2</A>"
        b"<a class='z' href=bare/three>3</a><a name='nohref'>4</a>"
    )
    assert find_hrefs(html) == ["/one", "http://x.com/two", "bare/three"]


def test_extract_links_with_text_matches_pycore(spark, documents):
    from image_ocr_spark.operators.generate import generate_pages
    from image_ocr_spark.operators.linkgraph import extract_links
    from image_ocr_spark.pycore.links import find_links

    pages = generate_pages(documents.limit(150))
    got = {}
    for r in extract_links(pages, with_text=True).collect():
        got.setdefault(r.url, []).append((r.href, r.anchor))
    want = {}
    for r in pages.select("url", "html").collect():
        links = find_links(r.html or b"")
        if links:
            want[r.url] = links
    assert got == want


ANCHOR_LINK_ROWS = [
    # (src url, href, anchor text) — term counting across resolution branches
    ("http://s1.example/p", "http://t.example/x", "great docs"),
    ("http://s1.example/p", "https://t.example:443/y", "great api"),
    ("http://s2.example/p", "//t.example/z", "docs"),
    ("http://s2.example/p", "/local", "self link"),
    ("http://s2.example/p", "mailto:a@b.c", "dropped entirely"),
    ("http://s3.example/p", "http://t.example/w", "great"),
    ("http://s3.example/p", "http://t.example/v", ""),
]


def test_anchor_term_stats_counting_matches_oracle(spark):
    """The counting+ranking half on literal links: resolve with anchor
    passthrough, one (host, term) count, per-host top-k with the
    deterministic tie-break — replayed by DuckDB by value."""
    from image_ocr_spark.operators.linkgraph import resolve_edges
    from pyspark.sql import Window

    links = spark.createDataFrame(
        ANCHOR_LINK_ROWS, "url string, href string, anchor string"
    )
    edges = resolve_edges(links, keep_cols=("anchor",))
    terms = (
        edges.select("dst_host", F.explode(F.split("anchor", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("dst_host").orderBy(F.desc("cnt"), F.asc("term"))
    got = sorted(
        tuple(r)
        for r in terms.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("dst_host", "term", "cnt", F.col("rank").cast("long"))
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW links AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}', '{h}', '{a}')" for u, h, a in ANCHOR_LINK_ROWS)
        + ") t(url, href, anchor)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH resolved AS (
  SELECT lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS src_host,
         trim(href) AS h, anchor
  FROM links
), branched AS (
  SELECT CASE
      WHEN h = '' OR h LIKE '#%'
           OR (regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*:')
               AND regexp_extract(h, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = '')
        THEN NULL
      WHEN regexp_extract(h, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) <> ''
        THEN regexp_replace(lower(regexp_extract(h, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':(80|443)$', '')
      WHEN h LIKE '//%' THEN lower(regexp_extract(h, '^//([^/?#]+)', 1))
      ELSE src_host END AS dst_host,
    anchor
  FROM resolved
), terms AS (
  SELECT dst_host, unnest(string_split(anchor, ' ')) AS term FROM branched
  WHERE dst_host IS NOT NULL
), counted AS (
  SELECT dst_host, term, count(*)::BIGINT AS cnt FROM terms
  WHERE term <> '' GROUP BY 1, 2
)
SELECT dst_host, term, cnt,
       row_number() OVER (PARTITION BY dst_host ORDER BY cnt DESC, term ASC)::BIGINT
         AS rank
FROM counted QUALIFY rank <= 2
"""
        ).fetchall()
    )
    con.close()
    assert got == want
    # the aggregate signal: t.example's dominant incoming term is 'great'
    top = {(h, r): t for h, t, _, r in got}
    assert top[("t.example", 1)] == "great"


def test_anchor_term_stats_end_to_end(spark, documents):
    """Full chain over fixture pages: every reported term must actually
    appear in some page's anchor text (pycore recount), ranks are
    contiguous from 1, and counts are positive."""
    from image_ocr_spark.operators.generate import generate_pages
    from image_ocr_spark.operators.linkgraph import anchor_term_stats
    from image_ocr_spark.pycore.links import find_links

    pages = generate_pages(documents.limit(100))
    rows = anchor_term_stats(pages, k=3).collect()
    assert rows
    seen_terms = set()
    for r in pages.select("html").collect():
        for _, text in find_links(r.html or b""):
            seen_terms.update(t for t in text.split(" ") if t)
    by_host = {}
    for r in rows:
        assert r.cnt > 0
        assert r.term in seen_terms
        by_host.setdefault(r.dst_host, []).append(r.rank)
    for host, ranks in by_host.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), host


def test_find_links_linear_on_hostile_many_anchors():
    """20k href anchors sharing ONE distant close tag: the memoized
    next-close pointer keeps the scan O(n) (a naive per-anchor find
    would be O(k*n) ~ 10^9 char touches here)."""
    import time

    from image_ocr_spark.pycore.links import find_links

    raw = b"<a href='/x'>t " * 20000 + b"</a>"
    t0 = time.time()
    links = find_links(raw)
    elapsed = time.time() - t0
    assert len(links) == 20000
    assert elapsed < 3.0, elapsed


# ------------------------------------------------------------ meta-robots


def test_page_robots_semantics():
    from image_ocr_spark.pycore.robots import page_robots

    cases = [
        (b"<html><head></head><body>x</body></html>", (False, False)),
        (b"<meta name='robots' content='noindex'>", (True, False)),
        (b'<META NAME="ROBOTS" CONTENT="NOFOLLOW">', (False, True)),
        (b"<meta name=robots content=none>", (True, True)),
        (b"<meta name='robots' content=' noindex , nofollow '>", (True, True)),
        (b"<meta name='robots' content='all'>", (False, False)),
        (b"<meta name='robots' content='noarchive, nosnippet'>", (False, False)),
        # multiple metas OR together (restrictive union)
        (
            b"<meta name='robots' content='noindex'>"
            b"<meta name='robots' content='nofollow'>",
            (True, True),
        ),
        # other meta names never fire
        (b"<meta name='googlebot' content='noindex'>", (False, False)),
        (b"<meta charset='utf-8'><meta name='viewport' content='x'>", (False, False)),
        # commented-out meta is stripped before scanning
        (b"<!-- <meta name='robots' content='noindex'> -->", (False, False)),
        # content before name, bare values, self-closing
        (b"<meta content='noindex' name='robots' />", (True, False)),
    ]
    for raw, want in cases:
        assert page_robots(raw) == want, raw


def test_page_robots_never_raises_on_garbage():
    from image_ocr_spark.pycore.robots import page_robots

    for raw in (b"", b"\xff\xfe\x00garbage", b"<meta name=", b"<" * 4096):
        assert page_robots(raw) == (False, False)


ROBOTS_PAGES = [
    ("http://a.example/keep", b"<html><body><a href='/x'>link</a></body></html>"),
    (
        "http://a.example/noindex",
        b"<html><head><meta name='robots' content='noindex'></head>"
        b"<body><a href='/y'>link</a></body></html>",
    ),
    (
        "http://b.example/nofollow",
        b"<html><head><meta name='robots' content='nofollow'></head>"
        b"<body><a href='http://t.example/z'>out</a></body></html>",
    ),
    (
        "http://b.example/none",
        b"<html><head><meta name='robots' content='none'></head>"
        b"<body><a href='/w'>link</a></body></html>",
    ),
]


def test_robots_flags_matches_pycore_and_composes(spark):
    """Spark flags == pycore per page; the two compositions the operator
    exists for: noindex pages drop out of the corpus, nofollow (and
    none) pages contribute zero link-graph edges."""
    from image_ocr_spark.operators.linkgraph import robots_flags
    from image_ocr_spark.pycore.robots import page_robots

    pages = spark.createDataFrame(ROBOTS_PAGES, "url string, html binary")
    flags = robots_flags(pages)
    got = {r.url: (r.robots_noindex, r.robots_nofollow) for r in flags.collect()}
    want = {u: page_robots(h) for u, h in ROBOTS_PAGES}
    assert got == want

    # corpus gate: anti-join the noindex urls
    kept = pages.join(
        flags.filter(F.col("robots_noindex")).select("url"),
        on="url",
        how="left_anti",
    )
    assert {r.url for r in kept.collect()} == {
        "http://a.example/keep",
        "http://b.example/nofollow",
    }

    # link-graph gate: drop nofollow pages' out-edges before resolution
    followable = pages.join(
        flags.filter(F.col("robots_nofollow")).select("url"),
        on="url",
        how="left_anti",
    )
    edges = resolve_edges(extract_links(followable)).collect()
    srcs = {r.src_host for r in edges}
    assert srcs == {"a.example"}  # both b.example pages are nofollow/none


def test_robots_flags_plan_is_scan_stage(spark):
    from image_ocr_spark.operators.linkgraph import robots_flags

    pages = spark.createDataFrame(ROBOTS_PAGES, "url string, html binary")
    plan = (
        robots_flags(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan


def test_find_links_close_tag_name_boundary():
    """r05 review regression: </abbr> (and any other a-prefixed close
    tag) must NOT end an anchor's text, and data-href= must not count as
    an href attribute."""
    from image_ocr_spark.pycore.links import find_links

    (href, text), = find_links(
        b"<a href='/x'>read the <abbr>REP</abbr> spec today</a>"
    )
    assert (href, text) == ("/x", "read the REP spec today")
    assert find_links(b"<a data-href='/wrong'>t</a>") == []
    (href2, _), = find_links(b"<a data-href='/wrong' href='/right'>t</a>")
    assert href2 == "/right"


def test_page_robots_attribute_name_boundary():
    """r05 review regression: data-name=/data-content= never count as
    the robots name/content attributes."""
    from image_ocr_spark.pycore.robots import page_robots

    assert page_robots(b"<meta data-name='robots' content='noindex'>") == (
        False,
        False,
    )
    assert page_robots(
        b"<meta data-name='x' name='robots' content='noindex'>"
    ) == (True, False)
    assert page_robots(
        b"<meta name='robots' data-content='all' content='nofollow'>"
    ) == (False, True)
