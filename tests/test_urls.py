"""URL canonicalizer unit tests (edge cases beyond the driver fixture)."""

from pyspark.sql import functions as F

from image_ocr_spark.functions.urls import normalize_url


def _norm(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    rows = df.select("raw", normalize_url(F.col("raw")).alias("c")).collect()
    return {r.raw: r.c for r in rows}


def test_url_normalize_edges(spark):
    got = _norm(
        spark,
        [
            "HTTP://WWW.Example.COM:80/A/B?utm_source=x#frag",
            "https://example.com:443/",
            "https://example.com/x?b=2&a=1&a=0",
            "http://example.com/x?utm_a=1&utm_b=2",
            "http://example.com/x?",
            "https://example.com:8443/x",
            "http://example.com/UPPER/Path",
        ],
    )
    assert got["HTTP://WWW.Example.COM:80/A/B?utm_source=x#frag"] == (
        "http://www.example.com/A/B"
    )
    assert got["https://example.com:443/"] == "https://example.com/"
    # params sorted, duplicates kept (a=0 before a=1)
    assert got["https://example.com/x?b=2&a=1&a=0"] == (
        "https://example.com/x?a=0&a=1&b=2"
    )
    assert got["http://example.com/x?utm_a=1&utm_b=2"] == "http://example.com/x"
    assert got["http://example.com/x?"] == "http://example.com/x"
    # non-default port preserved
    assert got["https://example.com:8443/x"] == "https://example.com:8443/x"
    # default-port strip is SCHEME-SPECIFIC: :443 on http / :80 on https
    # are distinct origins and must survive (review r3 finding)
    cross = _norm(
        spark, ["http://example.com:443/x", "https://example.com:80/x"]
    )
    assert cross["http://example.com:443/x"] == "http://example.com:443/x"
    assert cross["https://example.com:80/x"] == "https://example.com:80/x"
    # path case preserved
    assert got["http://example.com/UPPER/Path"] == "http://example.com/UPPER/Path"


def test_pii_redaction_golden(spark):
    """Fixed-order PII scrub: every rule fires, placeholders don't cascade,
    non-PII digits survive."""
    from pyspark.sql import functions as F

    from image_ocr_spark.functions.pii import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io, ip 192.168.1.200, card "
             "4111 1111 1111 1111, call +81-90-1234, tel 03-1234-5678, "
             "office (555) 123-4567, year 2024 price 99, ver 1.2-3.4-567")],
        "id long, t string",
    )
    row = df.select(
        redact_pii(F.col("t")).alias("clean"), *pii_counts(F.col("t"))
    ).collect()[0]
    assert row.clean == (
        "mail <EMAIL>, ip <IP>, card <CARD>, call <PHONE>, "
        "tel <PHONE>, office <PHONE>, year 2024 price 99, ver 1.2-3.4-567"
    )
    assert (row.n_email, row.n_ip, row.n_card, row.n_phone) == (1, 1, 1, 3)


def test_pii_domestic_phone_vs_dates(spark):
    """The domestic-hyphenated alternative must not eat ISO dates or a
    hyphenated card run (card placeholder lands first; counts are
    sequential so the run is not recounted as a phone)."""
    from pyspark.sql import functions as F

    from image_ocr_spark.functions.pii import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(1, "date 2024-01-02, card 4111-1111-1111-1111, ssn 123-45-6789")],
        "id long, t string",
    )
    row = df.select(
        redact_pii(F.col("t")).alias("clean"), *pii_counts(F.col("t"))
    ).collect()[0]
    assert row.clean == "date 2024-01-02, card <CARD>, ssn <PHONE>"
    assert (row.n_card, row.n_phone) == (1, 1)
