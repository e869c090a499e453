"""rel=canonical extraction + canonical-collapse dedup."""

import duckdb
import pytest
from pyspark.sql import functions as F

from image_ocr_spark.operators.linkgraph import canonical_groups, canonical_urls
from image_ocr_spark.pycore.canonical import canonical_url


@pytest.mark.parametrize(
    "html,want",
    [
        (b'<link rel="canonical" href="http://h/x">', "http://h/x"),
        (b"<link href='http://h/y' rel='canonical'>", "http://h/y"),  # attr order
        (b"<link rel=canonical href=http://h/bare>", "http://h/bare"),
        (b'<link rel="Canonical alternate" href="http://h/t">', "http://h/t"),
        (b'<link rel="alternate" href="http://h/no">', ""),  # wrong rel
        (b'<link rel="canonicalish" href="http://h/no">', ""),  # token, not substring
        (b'<!-- <link rel="canonical" href="http://h/c"> -->', ""),  # commented out
        (b'<link rel="canonical">', ""),  # no href
        (b'<link data-rel="canonical" href="http://h/no">', ""),  # attr boundary
        (
            b'<link rel="canonical" href="http://h/1">'
            b'<link rel="canonical" href="http://h/2">',
            "http://h/1",  # first wins
        ),
        (b"", ""),
        (b"<link rel=", ""),  # truncated garbage never raises
    ],
)
def test_canonical_extraction(html, want):
    assert canonical_url(html) == want


def test_spark_matches_pycore_and_groups(spark):
    # 3 variant urls declare one canonical home; one standalone page;
    # one page whose canonical target is also present as a page itself
    rows = [
        ("http://h/a?utm=1", b'<link rel="canonical" href="http://h/a">x'),
        ("http://h/a?utm=2", b'<link rel="canonical" href="http://h/a">y'),
        ("http://h/a", b'<link rel="canonical" href="http://h/a">home'),
        ("http://h/solo", b"<p>no link tag</p>"),
        ("http://h/m1", b'<link rel="canonical" href="http://h/m">'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r.canonical for r in canonical_urls(pages).collect()}
    assert got == {u: canonical_url(h) for u, h in rows}

    g = {
        r.canon_key: (r.n_pages, r.representative)
        for r in canonical_groups(pages).collect()
    }
    assert g == {
        # the self-canonical page is the representative of its group
        "http://h/a": (3, "http://h/a"),
        "http://h/solo": (1, "http://h/solo"),
        # target absent from the corpus: min url is the deterministic rep
        "http://h/m": (1, "http://h/m1"),
    }
    # DuckDB replays the collapse from the extracted relation
    con = duckdb.connect()
    con.execute("CREATE TABLE c(url VARCHAR, canonical VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?,?)", list(got.items()))
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
            SELECT coalesce(nullif(canonical, ''), url) AS k,
                   count(*)::BIGINT,
                   coalesce(
                     min(CASE WHEN url = coalesce(nullif(canonical, ''), url)
                              THEN url END),
                     min(url))
            FROM c GROUP BY 1
            """
        ).fetchall()
    }
    con.close()
    assert g == want


def test_canonical_composes_with_exact_dedup(spark, documents):
    """Generated fixture pages don't declare canonicals (extraction yields
    '' corpus-wide, every page is its own group) — the collapse is then a
    no-op ahead of content dedup, which is exactly the right default."""
    from image_ocr_spark.operators.generate import generate_pages

    pages = generate_pages(documents.filter(F.col("doc_id") < 60))
    g = canonical_groups(pages)
    n_pages = pages.count()
    assert g.count() == n_pages
    assert g.agg(F.sum("n_pages")).first()[0] == n_pages
    assert g.filter(F.col("canon_key") != F.col("representative")).count() == 0
