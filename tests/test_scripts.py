"""Unicode-script histograms: Spark == DuckDB == Python on the same
explicit codepoint intervals (exact integers, no property classes)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from image_ocr_spark.functions.scripts import SCRIPT_BLOCKS, script_columns

SAMPLES = [
    (0, "hello world plain latin"),
    (1, "Привет мир и ещё немного текста"),
    (2, "日本語のテキストとひらがなとカタカナ"),
    (3, "한국어 텍스트 조금"),
    (4, "مرحبا بالعالم"),
    (5, "mixed латиница and 漢字 with हिन्दी"),
    (6, ""),
    (7, None),
    (8, "1234 !!! ---"),  # nothing counted: dominant ''
    (9, "νερό and น้ำ and מים"),
    (10, "𠀀𠀁𠀂"),  # U+20000 block, latin-free so han dominates
]


def _py_counts(text):
    t = text or ""
    out = {}
    for name, blocks in SCRIPT_BLOCKS:
        out[name] = sum(
            1 for ch in t if any(lo <= ord(ch) <= hi for lo, hi in blocks)
        )
    return out


def test_spark_matches_python_and_duckdb(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    out = df.select("doc_id", *script_columns(F.col("text")))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    rows = {r.doc_id: r.asDict() for r in out.collect()}

    con = duckdb.connect()
    for doc_id, text in SAMPLES:
        want = _py_counts(text)
        got = rows[doc_id]
        for name, _ in SCRIPT_BLOCKS:
            assert got[f"n_{name}"] == want[name], (doc_id, name)
            # DuckDB leg: same class, same count
            cls = "[" + "".join(
                f"\\x{{{lo:X}}}-\\x{{{hi:X}}}"
                for lo, hi in dict(SCRIPT_BLOCKS)[name]
            ) + "]"
            d = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text or "", cls]
            ).fetchone()[0]
            assert d == want[name], (doc_id, name, "duckdb")
        assert got["n_chars"] == len(text or "")
    con.close()


def test_dominant_script_and_share(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    rows = {
        r.doc_id: (r.dominant_script, r.dominant_share_milli)
        for r in df.select("doc_id", *script_columns(F.col("text"))).collect()
    }
    assert rows[0] == ("latin", 1000)
    assert rows[1] == ("cyrillic", 1000)
    assert rows[2][0] in ("katakana", "hiragana", "han")
    assert rows[3][0] == "hangul"
    assert rows[6] == ("", 0) and rows[7] == ("", 0) and rows[8] == ("", 0)
    assert rows[10][0] == "han"  # astral plane counted as code points
    # mixed doc: share strictly below 1000, above 0
    assert 0 < rows[5][1] < 1000


def test_tie_breaks_by_list_order(spark):
    # one latin char + one cyrillic char: equal counts, latin is earlier
    df = spark.createDataFrame([(0, "aб")], "doc_id long, text string")
    r = df.select(*script_columns(F.col("text"))).collect()[0]
    assert r.n_latin == 1 and r.n_cyrillic == 1
    assert r.dominant_script == "latin" and r.dominant_share_milli == 500
