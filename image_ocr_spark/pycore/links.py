"""Anchor-href extraction — the per-document half of the host link graph.

Single source of truth for "which URLs does this page link to": the Spark
operator (operators/linkgraph.py extract_links) calls THIS function inside
its Arrow pass, so Spark output is byte-identical to the pure-Python
reference by construction — the same pycore-first discipline as the
tokenizer (htmltok.py).

Semantics:
- charset handling is exactly the page tokenizer's (decode_html: sniff ->
  decode -> replacement chars on garbage), so a page yields the same hrefs
  no matter which operator touches it first;
- comments and <!...> declarations are stripped BEFORE scanning, so
  commented-out anchors do not count as links;
- an anchor contributes its href attribute value verbatim (whitespace
  trimmed, entity escapes left as-is — canonicalization belongs to the
  relational layer, functions/urls.py), in document order, one entry per
  <a> tag that has a non-empty href;
- scanning is linear-time: the tag regex consumes `[^>]*` (no nested
  quantifiers), the attribute regex alternatives are first-char-disjoint
  (same hostile-input discipline as htmltok, which a fuzz test pins).

The reference has no link concept (it processes isolated scans); this
feeds the beyond-reference host-graph centrality operator.
"""

from __future__ import annotations

import re
from typing import List

from image_ocr_spark.pycore.htmltok import _COMMENT_RE, _DECL_RE, decode_html

# an <a ...> open tag: name must be exactly "a" (then whitespace, /, or >)
_A_TAG_RE = re.compile(r"<[Aa](?=[\s/>])[^>]*>")

# href inside the tag body: double-quoted, single-quoted, or bare value.
# Alternatives are first-char-disjoint after the = (",',other) -> linear.
# The (?<![\w-]) boundary keeps the match off other attributes' suffixes
# (data-href= must not count as href=) — r05 review fix.
_HREF_RE = re.compile(
    r"""(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE,
)


# anchor-TEXT window cap: each anchor's visible text is read from at most
# this many chars after its open tag, so k anchors sharing one distant
# close tag cost O(k * CAP), not O(k * n) — the linearity discipline
ANCHOR_TEXT_MAX = 512

# the anchor CLOSE tag: like the open tag, the name must be exactly "a"
# (</abbr>, </article>, </aside>… must NOT end an anchor's text — r05
# review fix for the bare "</a" prefix scan)
_A_CLOSE_RE = re.compile(r"</[Aa](?=[\s>])")

# inner markup stripped from anchor text; a truncated trailing "<..." (cut
# mid-tag by the window cap) is stripped by the $-anchored second pattern
_TAG_STRIP_RE = re.compile(r"<[^>]*>|<[^>]*$")
_WS_RUN_RE = re.compile(r"\s+")


def find_hrefs(raw: bytes) -> List[str]:
    """href values of every anchor tag in a raw HTML page, in document
    order.  Anchors without href (or with an empty/whitespace href) are
    skipped.  Never raises: garbage bytes decode best-effort and simply
    yield no anchors."""
    return [href for href, _ in find_links(raw, want_text=False)]


def find_links(raw: bytes, want_text: bool = True) -> List[tuple]:
    """(href, anchor_text) per anchor, in document order — find_hrefs
    plus each link's visible text (the classic curation signal: what the
    WEB calls the target).  anchor_text is the segment between the open
    tag and the nearest following anchor close tag, inner markup
    stripped, whitespace collapsed, trimmed, read through an
    ANCHOR_TEXT_MAX-char window; an unclosed anchor yields ''.  The href
    list is byte-identical to the pre-text find_hrefs by construction
    (same tag scan, same attribute regex); want_text=False skips all
    text work (the href-only fast path find_hrefs rides)."""
    html = decode_html(raw)
    html = _COMMENT_RE.sub(" ", html)
    html = _DECL_RE.sub(" ", html)
    out: List[tuple] = []
    # memoized next-close position: each close search resumes where the
    # last close was passed, so the total scan across ALL anchors is
    # O(n) even when many anchors share one distant (or missing) close
    nc = -2  # -2 = not yet searched; -1 = no close ahead (sticky)
    for tag in _A_TAG_RE.finditer(html):
        m = _HREF_RE.search(tag.group(0))
        if m is None:
            continue
        href = (m.group(1) or m.group(2) or m.group(3) or "").strip()
        if not href:
            continue
        if not want_text:
            out.append((href, ""))
            continue
        start = tag.end()
        if nc != -1 and nc < start:
            cm = _A_CLOSE_RE.search(html, start)
            nc = cm.start() if cm else -1
        if nc < 0:
            seg = ""  # unclosed to end of document: no visible text
        elif nc - start <= ANCHOR_TEXT_MAX:
            seg = html[start:nc]
        else:
            seg = html[start : start + ANCHOR_TEXT_MAX]
        text = _WS_RUN_RE.sub(" ", _TAG_STRIP_RE.sub(" ", seg)).strip()
        out.append((href, text))
    return out
