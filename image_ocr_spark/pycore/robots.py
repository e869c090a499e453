"""Meta-robots directives — the page-level index/follow gate.

Web corpora built from crawls respect the page's own exclusion signals:
a `<meta name="robots" content="noindex">` page must not enter the
training corpus, and a `nofollow` page contributes no edges to the link
graph (cf. the robots handling every production crawler applies and the
REP meta-tag convention formalized alongside RFC 9309).  The reference
has no crawl concept; this is a beyond-reference curation operator like
the link graph it composes with (operators/linkgraph.py).

Semantics (deterministic, hostile-input-safe):
- charset handling is the page tokenizer's (decode_html), and comments /
  declarations are stripped first, so a commented-out meta never fires;
- every `<meta ...>` tag whose name attribute is `robots`
  (case-insensitive, trimmed) contributes its content directives;
  multiple robots metas OR together (the restrictive union);
- directives are comma-separated tokens, trimmed, case-insensitive:
  `noindex` and `nofollow` set their flags, `none` sets both, `all` and
  unknown tokens are ignored (the permissive default is no flags);
- attribute values may be double-quoted, single-quoted, or bare — the
  same first-char-disjoint alternation as the href scanner (links.py),
  linear on hostile input.
"""

from __future__ import annotations

import re
from typing import Tuple

from image_ocr_spark.pycore.htmltok import _COMMENT_RE, _DECL_RE, decode_html

_META_TAG_RE = re.compile(r"<[Mm][Ee][Tt][Aa](?=[\s/>])[^>]*>")
# the (?<![\w-]) boundary keeps the attribute match off other attributes'
# suffixes (data-name= / data-content= must not count — r05 review fix)
_NAME_RE = re.compile(
    r"""(?<![\w-])name\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE,
)
_CONTENT_RE = re.compile(
    r"""(?<![\w-])content\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE,
)


def page_robots(raw: bytes) -> Tuple[bool, bool]:
    """(noindex, nofollow) for a raw HTML page.  Never raises: garbage
    decodes best-effort and yields (False, False)."""
    html = decode_html(raw)
    html = _COMMENT_RE.sub(" ", html)
    html = _DECL_RE.sub(" ", html)
    noindex = nofollow = False
    for tag in _META_TAG_RE.finditer(html):
        body = tag.group(0)
        nm = _NAME_RE.search(body)
        if nm is None:
            continue
        name = (nm.group(1) or nm.group(2) or nm.group(3) or "").strip().lower()
        if name != "robots":
            continue
        cm = _CONTENT_RE.search(body)
        if cm is None:
            continue
        content = cm.group(1) or cm.group(2) or cm.group(3) or ""
        for token in content.split(","):
            t = token.strip().lower()
            if t == "noindex":
                noindex = True
            elif t == "nofollow":
                nofollow = True
            elif t == "none":
                noindex = nofollow = True
    return noindex, nofollow
