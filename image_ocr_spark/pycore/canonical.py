"""rel=canonical extraction — the page's own dedup signal.

`<link rel="canonical" href="...">` declares which URL is the canonical
home of this content; a web corpus collapses the syndicated/paginated/
tracking-parameter variants onto it BEFORE content hashing ever runs
(the dedup signal CDNs and mirrors hand you for free, complementary to
exact/minhash dedup which must rediscover it from bytes).

Same scanner discipline as links.py (the href extractor this mirrors):
decode via the page tokenizer's charset policy, strip comments and
declarations first, linear-time first-char-disjoint attribute regexes,
attribute-order independent (rel before or after href), quoted or bare
values, case-insensitive rel tokens (rel="Canonical alternate" counts —
rel is a space-separated token LIST per HTML).  First canonical link
wins (document order, the convention consumers apply when a page
declares several); pages without one yield ''.
"""

from __future__ import annotations

import re

from image_ocr_spark.pycore.htmltok import _COMMENT_RE, _DECL_RE, decode_html

# a <link ...> tag: name exactly "link"
_LINK_TAG_RE = re.compile(r"<[Ll][Ii][Nn][Kk](?=[\s/>])[^>]*>")

_REL_RE = re.compile(
    r"""(?<![\w-])rel\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE,
)
_HREF_RE = re.compile(
    r"""(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE,
)


def canonical_url(raw: bytes) -> str:
    """The page's declared canonical URL ('' if none declared)."""
    html = decode_html(raw)
    html = _COMMENT_RE.sub(" ", html)
    html = _DECL_RE.sub(" ", html)
    for m in _LINK_TAG_RE.finditer(html):
        tag = m.group(0)
        rm = _REL_RE.search(tag)
        if not rm:
            continue
        rel = (rm.group(1) or rm.group(2) or rm.group(3) or "").lower()
        if "canonical" not in rel.split():
            continue
        hm = _HREF_RE.search(tag)
        if not hm:
            continue
        href = (hm.group(1) or hm.group(2) or hm.group(3) or "").strip()
        if href:
            return href
    return ""
