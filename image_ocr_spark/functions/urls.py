"""URL canonicalization for crawl pipelines (per-row, shuffle-free).

Dedup keyed on raw url strings over-counts: the same page arrives as
HTTP://Host.com:80/a?utm_source=x#frag and http://host.com/a.  The
canonicalizer applies the standard safe normalizations (RFC 3986 §6 +
the de-facto tracking-param strip):

  - scheme and host lowercased (path/query case preserved)
  - default ports dropped (:80, :443)
  - fragment dropped
  - utm_* tracking parameters dropped
  - remaining query parameters sorted (order-insensitive equivalence)

Everything is built from split/filter/array_join string expressions with
explicit ASCII classes, so the DuckDB oracle reproduces each step
bit-for-bit (list comprehensions mirror the higher-order functions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_url(raw: Column) -> Column:
    """Canonical form of an absolute http(s) URL column."""
    nofrag = F.regexp_replace(raw, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(nofrag, "^[A-Za-z]+://([^/?#]+)", 1))
    # the DEFAULT port is scheme-specific: http://h:443 is a distinct
    # origin from http://h and must NOT be conflated (review r3 finding)
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_extract(nofrag, "^[A-Za-z]+://[^/?#]+(.*)$", 1)
    path = F.element_at(F.split(rest, "\\?", 2), 1)
    query = F.when(
        F.contains(rest, F.lit("?")), F.element_at(F.split(rest, "\\?", 2), 2)
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qtail = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qtail)
