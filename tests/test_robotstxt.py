"""RFC 9309 robots.txt engine: parser semantics, matcher vs the
published examples, Spark==pycore parity on a synthesized per-host
fixture, and a DuckDB replay of the LIKE-compiled verdict."""

import duckdb
import pytest
from pyspark.sql import functions as F

from image_ocr_spark.operators.robotsfrontier import (
    apply_robots,
    robots_rules,
    url_path,
)
from image_ocr_spark.pycore.robotstxt import (
    _match,
    allowed,
    parse_robots_txt,
    select_group,
    to_like,
)


def test_group_accumulation_and_merge():
    txt = """
User-agent: a
User-agent: b
Disallow: /x
User-agent: a
Disallow: /y
Sitemap: http://e/s.xml
User-agent: c
Disallow: /z
"""
    g = parse_robots_txt(txt)
    assert g["a"] == [(False, "/x"), (False, "/y")]
    assert g["b"] == [(False, "/x")]
    # sitemap is a non-group record: it neither attaches nor breaks
    # user-agent accumulation, so c starts a fresh group normally
    assert g["c"] == [(False, "/z")]


def test_parser_edge_cases():
    g = parse_robots_txt(
        "User-agent: *\n"
        "Disallow:\n"            # empty disallow: allows all -> no rule
        "disallow: /a # tail comment\n"
        "ALLOW: /a/b\n"
        "Crawl-delay: 10\n"
        "garbage line without colon\n"
        "Unknown-field: x\n"
    )
    assert g["*"] == [(False, "/a"), (True, "/a/b")]
    assert parse_robots_txt(None) == {}
    assert parse_robots_txt("Disallow: /orphan") == {}  # rule before any UA


def test_group_selection_longest_token_then_star():
    g = parse_robots_txt(
        "User-agent: foo\nDisallow: /f\n"
        "User-agent: foobar\nDisallow: /fb\n"
        "User-agent: *\nDisallow: /s\n"
    )
    assert select_group(g, "FooBar-News/1.0") == [(False, "/fb")]
    assert select_group(g, "foo/2") == [(False, "/f")]
    assert select_group(g, "otherbot") == [(False, "/s")]
    assert select_group({}, "any") == []


@pytest.mark.parametrize(
    "pattern,path,want",
    [
        ("/", "/anything", True),
        ("/fish", "/fish.html", True),          # prefix
        ("/fish", "/Fish.asp", False),          # case-sensitive
        ("/fish*", "/fishheads/yummy.html", True),
        ("/fish/", "/fish", False),
        ("/*.php", "/folder/filename.php", True),
        ("/*.php", "/windows.PHP", False),
        ("/*.php$", "/filename.php", True),
        ("/*.php$", "/filename.php?parameters", False),
        ("/fish*.php", "/fishheads/catfish.php?parameters", True),
        ("/ab$", "/ab", True),
        ("/ab$", "/abc", False),
        ("/a*b$", "/aXbYb", True),              # anchored: later alignment
        ("/a*bb*b$", "/abbb", True),
        ("/p*", "/p", True),                    # trailing * matches empty
    ],
)
def test_match_reference_examples(pattern, path, want):
    """The wildcard/anchor examples published with RFC 9309 / the Google
    robots.txt spec, plus the lazy-vs-anchored alignment cases."""
    assert _match(pattern, path) is want


def test_precedence_longest_match_allow_wins():
    rules = [(True, "/p"), (False, "/")]
    assert allowed(rules, "/page") is True
    rules = [(True, "/folder"), (False, "/folder")]
    assert allowed(rules, "/folder/page") is True  # tie -> allow
    rules = [(True, "/page"), (False, "/*.htm")]
    assert allowed(rules, "/page.htm") is False  # 6 > 5
    assert allowed([], "/x") is True


_FIXTURE = """
User-agent: trainbot
Disallow: /private/
Allow: /private/public*
Disallow: /*.tmp$
Disallow: /cgi%bin/_x
User-agent: *
Disallow: /
"""


@pytest.fixture(scope="module")
def frontier(spark, documents):
    """Deterministic per-host robots + a url frontier derived from
    doc_ids (paths hit every rule branch incl. LIKE metacharacters)."""
    hosts = 7
    robots = spark.createDataFrame(
        [(f"h{i}.example", _FIXTURE if i % 3 else None) for i in range(hosts)],
        "host string, robots_txt string",
    )
    k = F.col("doc_id") % 6
    path = (
        F.when(k == 0, F.lit("/private/secret"))
        .when(k == 1, F.concat(F.lit("/private/public"), F.col("doc_id")))
        .when(k == 2, F.concat(F.lit("/files/f"), F.col("doc_id"), F.lit(".tmp")))
        .when(k == 3, F.lit("/files/keep.tmp.txt"))
        .when(k == 4, F.lit("/cgi%bin/_x"))
        .otherwise(F.concat(F.lit("/ok/"), F.col("doc_id")))
    )
    urls = documents.select(
        F.concat(F.lit("h"), (F.col("doc_id") % hosts), F.lit(".example")).alias("host"),
        F.concat(
            F.lit("http://h"), F.col("doc_id") % hosts, F.lit(".example"), path
        ).alias("url"),
    )
    return robots, urls


def test_spark_matches_pycore_on_fixture(spark, frontier):
    robots, urls = frontier
    rules = robots_rules(robots, agent="trainbot/1.2")
    assert "Exchange" not in (
        rules._jdf.queryExecution().executedPlan().toString()
    )
    got = {r.url: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    rb = {r.host: r.robots_txt for r in robots.collect()}
    checked = 0
    for r in urls.collect():
        sel = select_group(parse_robots_txt(rb.get(r.host) or ""), "trainbot/1.2")
        path = r.url.split(".example", 1)[1] or "/"
        assert got[r.url] == allowed(sel, path), (r.url, sel)
        checked += 1
    # url strings repeat across doc_ids (same host+path bucket), so the
    # verdict map is distinct-url-sized while every row was checked
    assert checked == urls.count() and len(got) > 0


def test_duckdb_replays_like_verdict(spark, frontier):
    """The LIKE-compiled rules are engine-portable: DuckDB computes the
    same per-url verdict from the exported rule rows (most-specific via
    max_by on 2*plen + allow)."""
    robots, urls = frontier
    rules = robots_rules(robots, agent="trainbot/1.2")
    rule_rows = [
        (r.host, x.is_allow, x.like_pat, x.plen)
        for r in rules.collect()
        for x in r.rules
    ]
    url_rows = [(r.host, r.url) for r in urls.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE rules(host VARCHAR, is_allow BOOLEAN, like_pat VARCHAR, plen INT)")
    con.executemany("INSERT INTO rules VALUES (?,?,?,?)", rule_rows)
    con.execute("CREATE TABLE urls(host VARCHAR, url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?,?)", url_rows)
    want = dict(
        con.execute(
            """
            SELECT u.url,
                   coalesce(arg_max(r.is_allow, 2 * r.plen + r.is_allow::INT), true)
            FROM urls u
            LEFT JOIN rules r
              ON u.host = r.host
             AND coalesce(nullif(regexp_replace(u.url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), ''), '/')
                 LIKE r.like_pat ESCAPE '\\'
            GROUP BY u.url
            """
        ).fetchall()
    )
    con.close()
    got = {r.url: r.robots_allowed for r in apply_robots(urls, rules).collect()}
    assert got == want and len(got) > 0


def test_to_like_trailing_metachar_parity():
    """to_like must keep prefix semantics when a rule ends in a LIKE
    metacharacter that gets escaped: '/foo%' is a PREFIX rule per RFC
    9309 (the % is literal), so the compiled LIKE needs a trailing live
    '%'.  Conversely '/foo\\*' ends in a live wildcard ('\\\\%') and must
    NOT get a redundant-but-harmless extra one treated as escaped.
    Verify every (pattern, path) cell agrees between pycore _match and
    DuckDB LIKE on the compiled string."""
    patterns = [
        "/foo%",        # trailing literal % -> prefix rule
        "/foo_",        # trailing literal _ -> prefix rule
        "/foo\\",       # trailing literal backslash -> prefix rule
        "/foo\\*",      # literal backslash then wildcard
        "/foo%$",       # anchored literal %
        "/foo*",        # trailing wildcard
        "/fo%o",        # interior literal %
        "/a_b%c\\d",    # all three metachars interior
    ]
    paths = [
        "/foo%", "/foo%bar", "/foo", "/foox", "/foo_", "/foo_tail",
        "/foo\\", "/foo\\tail", "/fooX", "/fo%o/z", "/a_b%c\\d/e",
        "/a-b-c-d", "/", "/foo*lit",
    ]
    con = duckdb.connect()
    for pat in patterns:
        like = to_like(pat)
        for path in paths:
            want = _match(pat, path)
            got = con.execute(
                "SELECT ? LIKE ? ESCAPE '\\'", [path, like]
            ).fetchone()[0]
            assert got == want, (pat, like, path, got, want)
    con.close()


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [
            ("http://h.example/a/b?q=1#f",),
            ("https://h.example",),
            ("http://h.example/",),
        ],
        "url string",
    )
    got = [r.p for r in df.select(url_path(F.col("url")).alias("p")).collect()]
    assert got == ["/a/b?q=1#f", "/", "/"]


def test_extras_and_host_meta(spark):
    from image_ocr_spark.operators.robotsfrontier import robots_host_meta
    from image_ocr_spark.pycore.robotstxt import (
        parse_robots_extras,
        select_crawl_delay,
    )

    txt = (
        "User-agent: a\nCrawl-delay: 1.5\nDisallow: /x\n"
        "Sitemap: http://e/s1.xml\n"
        "User-agent: *\nCrawl-delay: bogus\nCrawl-delay: 10\n"
        "Sitemap: http://e/s2.xml\n"
    )
    sm, d = parse_robots_extras(txt)
    assert sm == ["http://e/s1.xml", "http://e/s2.xml"]
    assert d == {"a": 1500, "*": 10000}
    assert select_crawl_delay(d, "a-bot/2") == 1500
    assert select_crawl_delay(d, "other") == 10000
    assert select_crawl_delay({}, "x") == 0

    robots = spark.createDataFrame(
        [("h1", txt), ("h2", None), ("h3", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    meta = robots_host_meta(robots, agent="a-bot/2")
    assert "Exchange" not in (
        meta._jdf.queryExecution().executedPlan().toString()
    )
    got = {r.host: (r.crawl_delay_milli, list(r.sitemaps)) for r in meta.collect()}
    assert got == {
        "h1": (1500, ["http://e/s1.xml", "http://e/s2.xml"]),
        "h2": (0, []),
        "h3": (0, []),
    }


def test_rule_cap_bounds_adversarial_robots(spark):
    """A million-rule robots.txt must not make every URL of the host pay
    O(rules): the parse keeps the first max_rules (real parsers bound the
    same way), and verdicts from the kept prefix still apply."""
    txt = "User-agent: *\n" + "".join(
        f"Disallow: /junk{i}/\n" for i in range(2000)
    )
    robots = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    capped = robots_rules(robots, agent="anybot", max_rules=100)
    rows = capped.collect()[0].rules
    assert len(rows) == 100 and rows[0].like_pat == "/junk0/%"
    urls = spark.createDataFrame(
        [("h", "http://h/junk5/x"), ("h", "http://h/junk1999/x")],
        "host string, url string",
    )
    got = {r.url: r.robots_allowed for r in apply_robots(urls, capped).collect()}
    assert got == {
        "http://h/junk5/x": False,      # inside the kept prefix
        "http://h/junk1999/x": True,    # beyond the cap: fail-open
    }


def test_parsers_never_raise_on_fuzzed_bytes():
    """Deterministic fuzz: hashlib-derived byte soup, markup fragments,
    and truncated real inputs through all three frontier parsers — the
    never-raise policy the tokenizer's fuzz tests pin, applied here."""
    import hashlib

    from image_ocr_spark.pycore.canonical import canonical_url
    from image_ocr_spark.pycore.robotstxt import (
        parse_robots_extras,
        parse_robots_txt,
    )
    from image_ocr_spark.pycore.sitemap import parse_sitemap

    seeds = []
    for i in range(64):
        blob = hashlib.sha256(bytes([i])).digest() * 8
        seeds.append(blob)
        seeds.append(blob.replace(b"\x00", b"<"))
    frags = [
        b"<link rel=", b"<urlset><url><loc>", b"User-agent: \xff\xfe",
        _FIXTURE.encode()[:37], b"<sitemap",
    ]
    for raw in seeds + frags:
        txt = raw.decode("latin-1")
        assert isinstance(parse_robots_txt(txt), dict)
        assert isinstance(parse_robots_extras(txt), tuple)
        assert isinstance(parse_sitemap(txt), dict)
        assert isinstance(canonical_url(raw), str)


def test_crawl_delay_hostile_numerics_never_raise():
    """Overflow hardening (r06 self-probe): 400-digit / inf / 1e400
    crawl-delays CLAMP to a day instead of raising OverflowError out of
    the never-raise parser; nan and negatives are ignored."""
    from image_ocr_spark.pycore.robotstxt import (
        parse_robots_extras,
        select_crawl_delay,
    )

    for val, want in (
        ("9" * 400, 86_400_000), ("inf", 86_400_000), ("1e400", 86_400_000),
        ("nan", 0), ("-inf", 0), ("-5", 0), ("2.5", 2500),
    ):
        _, d = parse_robots_extras(
            f"User-agent: a\nCrawl-delay: {val}\nDisallow: /x"
        )
        assert select_crawl_delay(d, "a") == want, val[:12]
