"""Rotated-out driver rows stay value-checked.

The driver registry is capped at 50 slots; rows hash-green for several
consecutive rounds rotate out to admit novel operators (rotation policy:
COVERAGE.md).  This test replays every retired (query, oracle) pair —
the SAME pair the driver used to check — against DuckDB at SF_DIR, so a
regression in a retired operator still fails the suite the round it
happens, and the r04 failure mode (shipped work outside any oracle
window) cannot silently reopen through rotation.
"""

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _oracle_rows(sql, cols):
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    df = con.execute(sql).fetch_df()
    assert set(df.columns) == set(cols), (sorted(df.columns), sorted(cols))
    out = sorted(tuple(row[c] for c in cols) for _, row in df.iterrows())
    con.close()
    return out


def _retired():
    import __spark_entry__ as e

    q, o = e.retired_queries(), e.retired_oracle_sql()
    assert set(q) == set(o)
    return sorted(q)


@pytest.mark.parametrize("name", _retired())
def test_retired_row_still_matches_oracle(spark, name):
    import __spark_entry__ as e

    df = e.retired_queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    got = sorted(tuple(r[c] for c in cols) for r in df.collect())
    want = _oracle_rows(e.retired_oracle_sql()[name], cols)
    assert len(got) == len(want) > 0, (name, len(got), len(want))
    mism = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mism, (name, mism[:3])


def test_registry_is_exactly_fifty_and_disjoint_from_retired():
    import __spark_entry__ as e

    live, retired = set(e.queries()), set(e.retired_queries())
    assert len(live) == 50
    assert set(e.oracle_sql()) == live
    assert not (live & retired), live & retired
