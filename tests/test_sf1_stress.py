"""sf1.0 stress tier (VERDICT r03 item 5): the pair battery + flagship
byte identity at ANOTHER 10x — 50k docs (+50k injected variants inside the
dedup queries) and 5k embeddings, synthesized DETERMINISTICALLY from sf0.1
into .bench/sf1.0 once.  Both engines read the same parquet, so the
driver's oracle strings apply unchanged — this is the same correctness
gate at 100x the smallest fixture.

Opt-in (slow, ~minutes): SPARK_GRAFT_STRESS=1 python -m pytest
tests/test_sf1_stress.py -q -s
Measured walls are printed per query and recorded in BASELINE.md (round 4).
"""

import math
import os
import time

import duckdb
import pytest

import __spark_entry__ as entrymod

SRC_DIR = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench",
    "sf1.0",
)
STRESS = os.environ.get("SPARK_GRAFT_STRESS") == "1"
REPLICAS = 10
ID_STRIDE = 10_000_000  # far above sf0.1 ids, far below VARIANT_OFFSET

PAIR_QUERIES = [
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "fingerprint_pairs",
    "dedup_embedding",
    "dedup_substrings",  # r05: exact token-window scrub at 100x
    "bpe_vocab",  # r05 late: merge table value-identical at 100x
    "flagship_extract",
    "corpus_select",
    "decontaminate",
]


def _ensure_sf1(spark) -> None:
    """Replicate sf0.1 10x with distinct ids; texts get a per-replica
    suffix (near-dup structure stays per-replica instead of exploding into
    10-doc cross-replica dup groups), embeddings a per-replica additive
    offset (distinct directions)."""
    from pyspark.sql import functions as F

    marker = os.path.join(SF1_DIR, "_SYNTH_OK")
    if os.path.exists(marker):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    docs = spark.read.parquet(f"{SRC_DIR}/documents.parquet")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r") * ID_STRIDE).alias("doc_id"),
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" r"),
                F.col("_r").cast("string"),
            ).alias("text"),
            "lang",
        )
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(SF1_DIR, "documents.parquet"))
    )
    emb = spark.read.parquet(f"{SRC_DIR}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_r") * ID_STRIDE).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + F.col("_r").cast("float") * F.lit(0.013),
            ).alias("embedding"),
        )
        .repartition(4)
        .write.mode("overwrite")
        .parquet(os.path.join(SF1_DIR, "embeddings.parquet"))
    )
    with open(marker, "w") as fh:
        fh.write("ok")


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def spark():
    """Module override of the shared local[4] session: the sf1.0 tier gets
    16 cores (the bench HI level), matching how BASELINE.md reports it.

    getOrCreate returns any EXISTING session regardless of master (review
    r4 finding): when the full suite already holds the shared local[4]
    session, stopping "our" session here would kill the SparkContext for
    every later test module.  So: reuse a pre-existing session untouched
    (the tier then runs at that session's parallelism), and only
    create-and-stop when this module runs standalone — the documented
    BASELINE.md configuration."""
    from pyspark.sql import SparkSession

    from image_ocr_spark.session import get_spark

    existing = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None
    )
    if existing is not None and not existing.sparkContext._jsc.sc().isStopped():
        yield existing
        return
    spark = get_spark(
        "local[16]", app_name="sf1-stress", shuffle_partitions=32
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def sf1(spark):
    _ensure_sf1(spark)
    return SF1_DIR


@pytest.fixture(scope="module")
def duck(sf1):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf1}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
@pytest.mark.parametrize("name", PAIR_QUERIES)
def test_pair_query_at_sf1(spark, sf1, duck, name):
    q = entrymod.queries()[name]
    t0 = time.time()
    sdf = q(spark, sf1)
    srows = [tuple(r) for r in sdf.collect()]
    spark_s = time.time() - t0
    t0 = time.time()
    cur = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    duck_s = time.time() - t0
    print(
        f"\n[sf1.0] {name}: rows={len(srows)} spark={spark_s:.1f}s "
        f"oracle={duck_s:.1f}s"
    )
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    assert _rowset(sdf.columns, srows) == _rowset(dcols, drows)


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
def test_bloom_incremental_at_sf1(spark, sf1, duck):
    """Bloom incremental dedup at 100x: OLD = even ids (~25k docs), NEW =
    odd ids + 10k re-submitted old texts.  The confirm path must equal
    the exact anti-join by value; the bitmap is sized 16 bits/key."""
    from pyspark.sql import functions as F

    from image_ocr_spark.operators.bloom import incremental_new
    from image_ocr_spark.operators.dedup import VARIANT_OFFSET

    m_bits, k = 1 << 22, 7
    docs = spark.read.parquet(f"{sf1}/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        old.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + VARIANT_OFFSET).alias("doc_id"), "text"
        )
    )
    t0 = time.time()
    got = sorted(
        r.doc_id for r in incremental_new(old, new, "text", m_bits, k).collect()
    )
    spark_s = time.time() - t0
    t0 = time.time()
    want = sorted(
        r[0]
        for r in duck.execute(
            f"""
WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
new AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {VARIANT_OFFSET}, text FROM documents WHERE doc_id % 4 = 0
)
SELECT doc_id FROM new WHERE text NOT IN (SELECT text FROM old)
"""
        ).fetchall()
    )
    duck_s = time.time() - t0
    print(
        f"\n[sf1.0] bloom_incremental: rows={len(got)} spark={spark_s:.1f}s "
        f"oracle={duck_s:.1f}s"
    )
    assert got == want


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
def test_host_rank_at_sf1(spark, sf1, duck):
    """PageRank at 100x: a deterministic skewed multigraph (~150k edges,
    1009 hosts) ranked for 6 rounds, value-identical to the unrolled
    DuckDB oracle — proves the integer arithmetic stays exact when each
    round's contributions sum across many partitions."""
    from pyspark.sql import functions as F

    from image_ocr_spark.operators.linkgraph import (
        DEFAULT_DAMPING_MILLI,
        RANK_SCALE,
        host_rank,
        release_rank_checkpoints,
    )

    hosts_n, rounds = 1009, 6
    docs = spark.read.parquet(f"{sf1}/documents.parquet").select("doc_id")
    edges = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % hosts_n)).alias("src_host"),
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit("h"),
                        F.least(
                            (F.col("doc_id") + s) % hosts_n,
                            (F.col("doc_id") * 3 + s) % hosts_n,
                        ),
                    )
                    for s in (1, 2, 3)
                ]
            )
        ).alias("dst_host"),
    )
    t0 = time.time()
    got = sorted(
        (r.host, r.rank) for r in host_rank(edges, rounds=rounds).collect()
    )
    spark_s = time.time() - t0
    release_rank_checkpoints(spark)

    base = ((1000 - DEFAULT_DAMPING_MILLI) * RANK_SCALE) // 1000
    sql = f"""
WITH edges AS MATERIALIZED (
  SELECT 'h' || (doc_id % {hosts_n}) AS src,
         'h' || least((doc_id + s) % {hosts_n}, (doc_id * 3 + s) % {hosts_n}) AS dst
  FROM documents, unnest([1, 2, 3]) t(s)
),
w AS MATERIALIZED (SELECT src, dst, count(*)::BIGINT AS w FROM edges GROUP BY 1, 2),
outw AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS tw FROM w GROUP BY 1),
nodes AS MATERIALIZED (
  SELECT DISTINCT host FROM (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)
),
r0 AS MATERIALIZED (SELECT host, {RANK_SCALE}::BIGINT AS rank FROM nodes)
"""
    for t in range(rounds):
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
    sql += f"\nSELECT host, rank FROM r{rounds} ORDER BY host"
    t0 = time.time()
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    duck_s = time.time() - t0
    print(
        f"\n[sf1.0] host_rank (hosts={hosts_n}, rounds={rounds}): "
        f"spark={spark_s:.1f}s oracle={duck_s:.1f}s"
    )
    assert got == want
    assert len({r for _, r in got}) > 1


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
def test_lm_quality_at_sf1(spark, sf1, duck):
    """CCNet-style bigram familiarity at 100x: vocabulary trained over
    ~50k docs (deterministic top-V with gram-ascending tie-break across
    many more distinct grams than at sf0.001) and every doc scored —
    both stages value-identical to the DuckDB replay."""
    from image_ocr_spark.operators.lmquality import familiarity_scores

    # the replicated fixture holds only ~1.2k distinct bigrams; V must
    # sit well below that so vocabulary membership actually partitions
    # the grams and scores differentiate
    vocab_size = 256
    docs = spark.read.parquet(f"{sf1}/documents.parquet").select(
        "doc_id", "text"
    )
    t0 = time.time()
    got = sorted(tuple(r) for r in familiarity_scores(docs, vocab_size=vocab_size).collect())
    spark_s = time.time() - t0
    t0 = time.time()
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
WITH toks AS (
  SELECT doc_id, str_split(coalesce(text, ''), ' ') AS tk FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(tk[1:len(tk)-1], (x, i) -> x || ' ' || tk[i+1])) AS gram
  FROM toks
), vocab AS (
  SELECT gram FROM grams GROUP BY gram
  ORDER BY count(*) DESC, gram ASC LIMIT {vocab_size}
), scored AS (
  SELECT g.doc_id, count(*) AS n_grams,
         count(*) FILTER (WHERE g.gram IN (SELECT gram FROM vocab)) AS n_known
  FROM grams g GROUP BY g.doc_id
)
SELECT t.doc_id,
       coalesce(s.n_grams, 0)::BIGINT,
       coalesce(s.n_known, 0)::BIGINT,
       (CASE WHEN coalesce(s.n_grams, 0) = 0 THEN 0
             ELSE (1000000 * s.n_known) // s.n_grams END)::BIGINT
FROM documents t LEFT JOIN scored s USING (doc_id)
"""
        ).fetchall()
    )
    duck_s = time.time() - t0
    print(
        f"\n[sf1.0] lm_quality (V={vocab_size}): rows={len(got)} "
        f"spark={spark_s:.1f}s oracle={duck_s:.1f}s"
    )
    assert got == want
    assert len({f for *_, f in got}) > 10  # scores differentiate


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
def test_no_cached_relation_leaks_after_battery(spark):
    """Storage census (VERDICT r03 item 9): after the whole sf1.0 battery,
    the only persisted relations allowed are the per-(session, sf)
    extraction caches the entry module owns — a leak like r03's
    dedup_components projection-unpersist would show up here as unbounded
    growth."""
    from image_ocr_spark.operators.dedup import (
        release_component_checkpoints,
        release_sig_caches,
    )
    from image_ocr_spark.operators.similarity import release_assign_caches

    import __spark_entry__ as e

    release_sig_caches()
    release_component_checkpoints(spark)
    release_assign_caches()
    e.clear_extract_cache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    leftover = len(jmap)
    assert leftover <= 2, (
        f"{leftover} persisted RDDs remain after cache release — "
        "an operator is leaking storage"
    )


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
def test_dsir_at_sf1(spark, sf1, duck):
    """DSIR at 100x: 50k-doc source, 10k-doc target slice.  The count
    stage must equal the DuckDB replay exactly; weights are spot-replayed
    in Python on a 300-doc sample (exact integers, no tolerance)."""
    import hashlib
    import re as _re
    import time

    from pyspark.sql import functions as F

    from image_ocr_spark.operators.dsir import (
        dsir_log_table,
        dsir_weights,
        ngram_bucket_counts,
    )

    n_buckets = 4096
    docs = spark.read.parquet(f"{sf1}/documents.parquet").select(
        "doc_id", "text"
    )
    target = docs.filter(F.col("doc_id") % 5 == 0)
    t0 = time.time()
    sc_rows = sorted(
        (r.bucket, r.cnt)
        for r in ngram_bucket_counts(docs, n_buckets).collect()
    )
    tc_rows = sorted(
        (r.bucket, r.cnt)
        for r in ngram_bucket_counts(target, n_buckets).collect()
    )
    counts_s = time.time() - t0

    sql = """
WITH t AS (
  SELECT doc_id, list_filter(
           regexp_split_to_array(coalesce(text, ''), '[ \\n\\t\\r]+'),
           w -> w <> '') AS ws
  FROM documents {where}
),
grams AS (
  SELECT unnest(ws) AS gram FROM t
  UNION ALL
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]))
  FROM t
)
SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % {n} AS bucket,
       count(*)::BIGINT AS cnt
FROM grams GROUP BY 1"""
    t0 = time.time()
    want_sc = sorted(
        tuple(r)
        for r in duck.execute(sql.format(where="", n=n_buckets)).fetchall()
    )
    want_tc = sorted(
        tuple(r)
        for r in duck.execute(
            sql.format(where="WHERE doc_id % 5 = 0", n=n_buckets)
        ).fetchall()
    )
    duck_s = time.time() - t0
    assert sc_rows == want_sc and tc_rows == want_tc

    table = dsir_log_table(sc_rows, tc_rows, n_buckets)
    lut = dict(table)
    t0 = time.time()
    w = {
        r.doc_id: (r.n_feats, r.weight_milli)
        for r in dsir_weights(docs, table, n_buckets).collect()
    }
    weights_s = time.time() - t0
    sample = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id") % 167 == 0).collect()
    }
    for doc_id, text in sample.items():
        words = [x for x in _re.split(r"[ \n\t\r]+", text or "") if x]
        grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
        if not grams:
            assert doc_id not in w
            continue
        want = sum(
            lut[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets]
            for g in grams
        )
        assert w[doc_id] == (len(grams), want)
    print(
        f"\n[sf1.0] dsir: docs={docs.count()} buckets={n_buckets} "
        f"counts={counts_s:.1f}s weights={weights_s:.1f}s "
        f"oracle={duck_s:.1f}s sampled={len(sample)}"
    )
    assert len(sample) > 100


@pytest.mark.skipif(not STRESS, reason="set SPARK_GRAFT_STRESS=1 (slow)")
def test_frontier_family_at_sf1(spark):
    """Frontier operators at crawl-round scale (VERDICT r05 item 9):
    1M urls across 10k hosts.  Robots: 10k robots.txt parsed once
    (host-sized Arrow), 1M LIKE verdicts; sitemaps: 10k XML documents
    totalling 1M entries; canonical collapse: 1M pages.  Verdicts and
    group counts assert against the closed-form synthesis; walls are
    printed for BASELINE.md."""
    import time

    from pyspark.sql import functions as F

    from image_ocr_spark.operators.linkgraph import canonical_groups
    from image_ocr_spark.operators.robotsfrontier import (
        apply_robots,
        robots_rules,
        sitemap_entries,
    )

    n_urls, n_hosts = 1_000_000, 10_000
    robots_txt = (
        "User-agent: trainbot\n"
        "Disallow: /private/\n"
        "Allow: /private/public*\n"
        "Disallow: /*.tmp$\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )

    ids = spark.range(n_urls)
    sid = F.col("id").cast("string")
    hid = F.col("id") % n_hosts
    host = F.concat(F.lit("h"), hid.cast("string"), F.lit(".example"))
    k = F.col("id") % 5
    path = (
        F.when(k == 0, F.concat(F.lit("/private/secret"), sid))
        .when(k == 1, F.concat(F.lit("/private/public"), sid))
        .when(k == 2, F.concat(F.lit("/f"), sid, F.lit(".tmp")))
        .when(k == 3, F.concat(F.lit("/f"), sid, F.lit(".tmp.txt")))
        .otherwise(F.concat(F.lit("/ok/"), sid))
    )
    urls = ids.select(
        host.alias("host"), F.concat(F.lit("http://"), host, path).alias("url")
    ).persist()
    assert urls.count() == n_urls
    robots = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
        F.when(F.col("id") % 3 != 0, F.lit(robots_txt))
        .otherwise(F.lit(None).cast("string"))
        .alias("robots_txt"),
    )
    t0 = time.time()
    rules = robots_rules(robots, agent="trainbot/1.0")
    allowed = (
        apply_robots(urls, rules)
        .agg(F.sum(F.col("robots_allowed").cast("long")).alias("a"))
        .collect()[0]
        .a
    )
    robots_s = time.time() - t0
    # closed form: no-robots hosts (hid%3==0) allow everything; the rest
    # allow k in {1,3,4}.  ids stride host and k independently-ish; count
    # exactly via the same arithmetic.
    want_allowed = ids.select(
        F.sum(
            F.when((hid % 3 == 0) | k.isin(1, 3, 4), 1).otherwise(0)
        ).alias("a")
    ).collect()[0].a
    assert allowed == want_allowed
    print(f"\n[sf1.0 frontier] robots gate: {n_urls} urls / {n_hosts} hosts "
          f"wall {robots_s:.1f}s ({n_urls / robots_s / 1e3:.0f}k urls/s)")

    # sitemaps: 100 entries per host, 1M total
    t0 = time.time()
    block = F.concat(
        F.lit("<url><loc>http://"), host, F.lit("/d"), sid,
        F.lit("?a=1&amp;b=2</loc><priority>0."),
        (F.col("id") % 10).cast("string"), F.lit("</priority></url>"),
    )
    xml = (
        ids.select(host.alias("host"), block.alias("b"))
        .groupBy("host")
        .agg(F.concat(F.lit("<urlset>"), F.concat_ws("", F.collect_list("b")),
                      F.lit("</urlset>")).alias("sitemap_xml"))
    )
    ent = sitemap_entries(xml).persist()
    n_ent = ent.count()
    prio = ent.agg(F.sum("priority_milli").alias("p")).collect()[0].p
    sitemap_s = time.time() - t0
    assert n_ent == n_urls
    want_prio = ids.agg(F.sum((F.col("id") % 10) * 100).alias("p")).collect()[0].p
    assert prio == want_prio  # quantization exact across 1M entries
    assert ent.filter(~F.col("loc").contains("?a=1&b=2")).count() == 0
    ent.unpersist()
    print(f"[sf1.0 frontier] sitemap parse: {n_ent} entries / {n_hosts} "
          f"hosts wall {sitemap_s:.1f}s ({n_ent / sitemap_s / 1e3:.0f}k entries/s)")

    # canonical collapse: triples point at a base url (q_canonical_groups
    # geometry at 2000x)
    t0 = time.time()
    g = ((F.col("id") - F.col("id") % 3) / 3).cast("long") % n_hosts
    mk = lambda c: F.concat(F.lit("http://h"), g.cast("string"), F.lit(".example/p"), c)
    url = mk(sid)
    base = mk((F.col("id") - F.col("id") % 3).cast("string"))
    m = F.col("id") % 3
    html = (
        F.when(m == 0, F.concat(F.lit('<link rel="canonical" href="'), url, F.lit('">x')))
        .when(m == 1, F.concat(F.lit('<link rel="canonical" href="'), base, F.lit('">y')))
        .otherwise(F.lit("<p>solo</p>"))
    )
    pages = ids.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    groups = canonical_groups(pages).persist()
    n_groups = groups.count()
    n_pairs = groups.filter(F.col("n_pages") == 2).count()
    canon_s = time.time() - t0
    # n_urls % 3 == 1: ids 0..999999 -> 333334 bases (last base solo),
    # 333333 pairs, 333333 solo m==2 pages
    assert n_groups == 333_334 + 333_333
    assert n_pairs == 333_333
    groups.unpersist()
    urls.unpersist()
    print(f"[sf1.0 frontier] canonical collapse: {n_urls} pages wall "
          f"{canon_s:.1f}s ({n_urls / canon_s / 1e3:.0f}k pages/s)")
