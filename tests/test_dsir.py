"""DSIR importance resampling: exact-integer tri-engine checks.

The float log exists only in the driver-side quantization step
(dsir_log_table); everything an engine computes is integer-exact, so the
checks here are equality, not tolerance."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from image_ocr_spark.operators.dsir import (
    dsir_log_table,
    dsir_weights,
    ngram_bucket_counts,
)
from tests.conftest import SF_DIR

N_BUCKETS = 512  # small space so the fixture corpus populates buckets densely


def _py_grams(text):
    words = [w for w in __import__("re").split(r"[ \n\t\r]+", text or "") if w]
    return words + [f"{a} {b}" for a, b in zip(words, words[1:])]


def _py_bucket(gram, n_buckets):
    import hashlib

    h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
    return ((h % n_buckets) + n_buckets) % n_buckets


_COUNTS_SQL = f"""
WITH t AS (
  SELECT list_filter(
           regexp_split_to_array(coalesce(text, ''), '[ \\n\\t\\r]+'),
           w -> w <> '') AS ws
  FROM {{src}}
),
grams AS (
  SELECT unnest(ws) AS gram FROM t
  UNION ALL
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM t
)
SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % {N_BUCKETS} AS bucket,
       count(*)::BIGINT AS cnt
FROM grams GROUP BY 1
"""


@pytest.fixture(scope="module")
def corpora(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    source = docs
    target = docs.filter(F.col("doc_id") % 5 == 0)  # shifted subset
    return source, target


def test_bucket_counts_match_duckdb(spark, corpora):
    """Stage 1: the hashed-ngram count tables replay exactly in DuckDB
    (md5-prefix bucket hash, unigram+bigram features, integer counts)."""
    source, target = corpora
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW target AS SELECT * FROM documents WHERE doc_id % 5 = 0"
    )
    for df, view in ((source, "documents"), (target, "target")):
        got = sorted(
            (r.bucket, r.cnt)
            for r in ngram_bucket_counts(df, N_BUCKETS).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_COUNTS_SQL.format(src=view)).fetchall()
        )
        assert got == want and len(got) > 0
    con.close()


def test_weights_are_exact_integers(spark, corpora):
    """Stage 3: per-doc weight_milli is an exact integer sum — Spark
    equals a pure-Python replay over the same quantized score table."""
    source, target = corpora
    sc = [(r.bucket, r.cnt) for r in ngram_bucket_counts(source, N_BUCKETS).collect()]
    tc = [(r.bucket, r.cnt) for r in ngram_bucket_counts(target, N_BUCKETS).collect()]
    table = dsir_log_table(sc, tc, N_BUCKETS)
    lut = dict(table)
    got = {
        r.doc_id: (r.n_feats, r.weight_milli)
        for r in dsir_weights(source, table, N_BUCKETS).collect()
    }
    texts = {r.doc_id: r.text for r in source.collect()}
    checked = 0
    for doc_id, text in texts.items():
        grams = _py_grams(text)
        if not grams:
            assert doc_id not in got  # featureless docs carry no weight row
            continue
        want = sum(lut[_py_bucket(g, N_BUCKETS)] for g in grams)
        assert got[doc_id] == (len(grams), want)
        checked += 1
    assert checked == len(got) > 0


def test_log_table_quantization():
    """The one float (ln) is driver-side and quantized: smoothing keeps
    empty buckets finite and equal counts score ~0."""
    table = dict(dsir_log_table([(0, 50), (1, 50)], [(0, 50), (1, 50)], 4))
    assert table[0] == table[1] == 0  # identical distributions
    assert table[2] == table[3]  # both unseen -> same smoothed score
    skew = dict(dsir_log_table([(0, 99), (1, 1)], [(0, 1), (1, 99)], 2))
    assert skew[1] > 0 > skew[0]  # target-heavy bucket scores positive
    assert skew[1] == int(round(math.log(100 / 102 * 102 / 2) * 1000))


def test_target_like_docs_score_higher(spark, corpora):
    """Distribution-shift sanity: documents IN the target subset average
    a higher importance weight than the rest of the corpus."""
    source, target = corpora
    sc = [(r.bucket, r.cnt) for r in ngram_bucket_counts(source, N_BUCKETS).collect()]
    tc = [(r.bucket, r.cnt) for r in ngram_bucket_counts(target, N_BUCKETS).collect()]
    w = dsir_weights(source, dsir_log_table(sc, tc, N_BUCKETS), N_BUCKETS)
    rows = w.select(
        (F.col("doc_id") % 5 == 0).alias("in_target"),
        (F.col("weight_milli") / F.col("n_feats")).alias("per_feat"),
    ).groupBy("in_target").agg(F.avg("per_feat").alias("m")).collect()
    means = {r.in_target: r.m for r in rows}
    assert means[True] > means[False]
