"""Driver-contract simulation: run every __spark_entry__ query AND its
DuckDB oracle at sf0.01, compare row count + column names + order-insensitive
values (the same shape as the driver's CORRECTNESS gate)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_query_has_oracle():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every query is oracle-checked unless declared rows-only (each of those
    # is covered by a single-process comparison elsewhere in tests/)
    missing = set(qs) - set(os_)
    assert missing == entrymod.ROWS_ONLY_QUERIES, (
        f"queries without oracle: {missing}"
    )


# Spark simpleString type -> the Arrow type DuckDB must produce for the
# driver's pandas value-hash to match (r01 lesson: DuckDB widens sums to
# HUGEINT -> float64 through pandas, hash-red even with equal values)
_SPARK_TO_ARROW = {
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "string": "string",
    "boolean": "bool",
    "double": "double",
    "float": "float",
}


def _arrow_name(t) -> str:
    s = str(t)
    return {"large_string": "string", "utf8": "string", "large_utf8": "string"}.get(s, s)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0
        return
    atab = duck.execute(sql).arrow()
    dcols = atab.column_names
    drows = [tuple(d[c] for c in dcols) for d in atab.to_pylist()]
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    # dtype-strict: the driver hashes pandas values, so 6.0 != 6
    for f in sdf.schema.fields:
        want = _SPARK_TO_ARROW.get(f.dataType.simpleString())
        if want is None:
            continue  # arrays/structs handled by the value comparison
        got = _arrow_name(atab.schema.field(f.name).type)
        assert got == want, f"{name}.{f.name}: oracle dtype {got}, spark {want}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert _rowset(scols, srows) == _rowset(dcols, drows), f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "text", "doc_type"} <= set(df.columns)
