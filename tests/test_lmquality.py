"""CCNet-style bigram-familiarity quality gate (operators/lmquality.py):
DuckDB replays BOTH stages — vocabulary training (count + deterministic
top-V) and scan-stage scoring — with exact integer equality, and the
physical plan is asserted shuffle-free on the scoring side."""

import duckdb
import pytest

from tests.conftest import SF_DIR

VOCAB = 512


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


ORACLE_GRAMS = """
WITH toks AS (
  SELECT doc_id, str_split(coalesce(text, ''), ' ') AS tk FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(tk[1:len(tk)-1],
                               (x, i) -> x || ' ' || tk[i+1])) AS gram
  FROM toks
)
"""

ORACLE_VOCAB = (
    ORACLE_GRAMS
    + f"""
SELECT gram, count(*) AS cnt FROM grams
GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT {VOCAB}
"""
)


def test_vocab_matches_oracle(spark, documents):
    from image_ocr_spark.operators.lmquality import train_bigram_vocab

    got = [
        (r.gram, r.cnt)
        for r in train_bigram_vocab(documents, VOCAB).collect()
    ]
    want = _duck(ORACLE_VOCAB)
    assert got == want


def test_scores_match_oracle(spark, documents):
    from image_ocr_spark.operators.lmquality import familiarity_scores

    got = {
        r.doc_id: (r.n_grams, r.n_known, r.familiarity_micro)
        for r in familiarity_scores(documents, vocab_size=VOCAB).collect()
    }
    want = {
        d: (n, k, fam)
        for d, n, k, fam in _duck(
            ORACLE_GRAMS
            + f"""
, vocab AS (
  SELECT gram FROM grams GROUP BY gram
  ORDER BY count(*) DESC, gram ASC LIMIT {VOCAB}
), scored AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         count(*) FILTER (WHERE g.gram IN (SELECT gram FROM vocab))
           AS n_known
  FROM grams g GROUP BY g.doc_id
)
SELECT t.doc_id,
       coalesce(s.n_grams, 0) AS n_grams,
       coalesce(s.n_known, 0) AS n_known,
       CASE WHEN coalesce(s.n_grams, 0) = 0 THEN 0
            ELSE (1000000 * s.n_known) // s.n_grams END AS familiarity_micro
FROM documents t LEFT JOIN scored s USING (doc_id)
"""
        )
    }
    assert got == want


def test_degenerate_rows(spark):
    from image_ocr_spark.operators.lmquality import familiarity_scores

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "single"), (3, ""), (4, None), (5, "a b")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.n_grams, r.n_known, r.familiarity_micro)
        for r in familiarity_scores(df, vocab_size=2).collect()
    }
    # corpus grams: "a b" x3, "b a", "b c" -> vocab(2) = {a b, b a}
    assert rows[1] == (4, 3, 750_000)
    assert rows[2] == (0, 0, 0)
    assert rows[3] == (0, 0, 0)
    assert rows[4] == (0, 0, 0)
    assert rows[5] == (1, 1, 1_000_000)


def test_scoring_is_shuffle_free(spark, documents):
    """With a pre-trained vocab the scoring pass must plan to a scan +
    one Arrow eval — no Exchange anywhere (the model ships by broadcast,
    not by join)."""
    from image_ocr_spark.operators.lmquality import familiarity_scores

    plan = (
        familiarity_scores(documents, vocab=["a b", "b c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan
