"""Sitemap XML parsing: protocol fields, hostile input, namespace
prefixes, CDATA/entities, and the Spark explosion's pycore parity."""

import pytest
from pyspark.sql import functions as F

from image_ocr_spark.pycore.sitemap import parse_sitemap

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://h.example/a?x=1&amp;y=2</loc>
    <lastmod>2026-01-15</lastmod>
    <changefreq>WEEKLY</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[http://h.example/cdata&raw]]></loc></url>
  <url><lastmod>2026-01-01</lastmod></url><!-- no loc: dropped -->
  <url><loc> http://h.example/pad </loc><priority>bogus</priority>
      <changefreq>sometimes</changefreq></url>
  <url><loc>http://h.example/clamp</loc><priority>7</priority></url>
</urlset>"""

_INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.example/s1.xml</loc><lastmod>2026-02-02</lastmod></sitemap>
  <sm:sitemap xmlns:sm="x"><sm:loc>http://h.example/s2.xml</sm:loc></sm:sitemap>
</sitemapindex>"""


def test_urlset_fields():
    got = parse_sitemap(_URLSET)
    assert got["sitemaps"] == []
    assert got["urls"] == [
        ("http://h.example/a?x=1&y=2", "2026-01-15", "weekly", 800),
        ("http://h.example/cdata&raw", "", "", 500),
        ("http://h.example/pad", "", "", 500),   # bad freq/prio -> defaults
        ("http://h.example/clamp", "", "", 1000),  # priority clamped
    ]


def test_sitemapindex_and_namespace_prefix():
    got = parse_sitemap(_INDEX)
    assert got["urls"] == []
    assert got["sitemaps"] == [
        ("http://h.example/s1.xml", "2026-02-02"),
        ("http://h.example/s2.xml", ""),
    ]


def test_hostile_input_never_raises():
    for garbage in (None, "", "not xml", "<url><loc>", "<urlset>" * 1000,
                    "<url><loc>\x00\xff</loc></url>"):
        got = parse_sitemap(garbage)
        assert isinstance(got["urls"], list)
    # unterminated CDATA, nested lookalikes
    assert parse_sitemap("<url><loc><![CDATA[x</loc></url>")["urls"] == []


def test_spark_explosion_matches_pycore(spark):
    from image_ocr_spark.operators.robotsfrontier import sitemap_entries

    rows = [("h1", _URLSET), ("h2", _INDEX), ("h3", None), ("h4", "junk")]
    df = spark.createDataFrame(rows, "host string, sitemap_xml string")
    out = sitemap_entries(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = [
        (r.host, r.kind, r.loc, r.lastmod, r.changefreq, r.priority_milli)
        for r in out.collect()
    ]
    want = []
    for host, xml in rows:
        p = parse_sitemap(xml or "")
        for loc, lastmod, freq, prio in p["urls"]:
            want.append((host, "url", loc, lastmod, freq, prio))
        for loc, lastmod in p["sitemaps"]:
            want.append((host, "sitemap", loc, lastmod, "", 0))
    assert sorted(got) == sorted(want) and len(got) == 6


def test_priority_hostile_numerics_never_raise():
    """Overflow hardening (r06 self-probe): inf / -inf / nan / 400-digit
    priorities clamp or default instead of raising out of the
    never-raise parser."""
    for val, want in (
        ("9" * 400, 1000), ("inf", 1000), ("1e400", 1000),
        ("-inf", 0), ("nan", 500), ("-3", 0), ("0.8", 800),
    ):
        got = parse_sitemap(
            f"<url><loc>http://h/x</loc><priority>{val}</priority></url>"
        )
        assert got["urls"][0][3] == want, val[:12]
