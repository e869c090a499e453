"""Sitemap parsing (sitemaps.org XML protocol) — frontier discovery.

The companion to robotstxt.py: robots.txt names sitemap URLs, sitemaps
name the site's pages (with freshness hints a recrawl scheduler uses).
Handles both document kinds:

- ``<urlset>`` -> page entries: (loc, lastmod, changefreq, priority)
- ``<sitemapindex>`` -> child sitemap entries: (loc, lastmod)

Parsing is the house regex-scanner style, NOT an XML library: linear on
hostile input, never raises, namespace-prefix tolerant (``<sm:url>``
matches), CDATA and entity-decoded locs, unknown elements ignored.
Field normalization follows the protocol spec:

- ``lastmod`` is W3C datetime; kept as the raw string (date-sortable
  for the YYYY-MM-DD prefix) — schedulers compare lexically;
- ``priority`` is 0.0-1.0; quantized to integer MILLI (house rule),
  clamped to [0, 1000], default 500 (the spec's 0.5);
- ``changefreq`` lowercased, restricted to the spec's vocabulary, else
  empty string;
- entries without a ``<loc>`` are dropped; loc is trimmed and
  XML-unescaped (&amp; etc.), CDATA unwrapped.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

# one element regex per field: first-char-disjoint alternation is not
# needed here because each pattern is anchored on its own tag name
_URL_BLOCK_RE = re.compile(
    r"<(?:\w+:)?(url|sitemap)\b[^>]*>(.*?)</(?:\w+:)?\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_FIELD_RES = {
    name: re.compile(
        rf"<(?:\w+:)?{name}\b[^>]*>(.*?)</(?:\w+:)?{name}\s*>",
        re.IGNORECASE | re.DOTALL,
    )
    for name in ("loc", "lastmod", "changefreq", "priority")
}
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)
_FREQS = frozenset(
    ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")
)
_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'",
}


def _text(block: str, field: str) -> str:
    m = _FIELD_RES[field].search(block)
    if not m:
        return ""
    v = m.group(1)
    cm = _CDATA_RE.search(v)
    if cm:
        v = cm.group(1)
    for ent, ch in _ENTITIES.items():
        v = v.replace(ent, ch)
    v = v.strip()
    # field values are URLs / datetimes / tokens — markup debris left by
    # malformed nesting or an unterminated CDATA means the element is
    # broken, and a broken entry is dropped, not half-read
    return "" if "<" in v else v


def _priority_milli(raw: str) -> int:
    if not raw:
        return 500
    try:
        p = float(raw)
    except ValueError:
        return 500
    if p != p:  # float('nan') parses; int(round(nan)) raises
        return 500
    # clamp in FLOAT space first: inf / 400-digit values overflowed
    # int(round(p * 1000)) before the int-space min/max could apply
    # (never-raise parser; found by self-probe r06)
    return int(round(min(max(p, 0.0), 1.0) * 1000))


Entry = Tuple[str, str, str, int]  # (loc, lastmod, changefreq, priority_milli)


def parse_sitemap(text: str) -> Dict[str, List]:
    """{'urls': [Entry...], 'sitemaps': [(loc, lastmod)...]} — both kinds
    in one pass so an index document nested oddly still yields whatever
    it declares.  Never raises; garbage in -> empty lists."""
    urls: List[Entry] = []
    children: List[Tuple[str, str]] = []
    for m in _URL_BLOCK_RE.finditer(text or ""):
        kind, block = m.group(1).lower(), m.group(2)
        loc = _text(block, "loc")
        if not loc:
            continue
        lastmod = _text(block, "lastmod")
        if kind == "url":
            freq = _text(block, "changefreq").lower()
            urls.append(
                (
                    loc,
                    lastmod,
                    freq if freq in _FREQS else "",
                    _priority_milli(_text(block, "priority")),
                )
            )
        else:
            children.append((loc, lastmod))
    return {"urls": urls, "sitemaps": children}
