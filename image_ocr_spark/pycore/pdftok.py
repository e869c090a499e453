"""Minimal from-scratch PDF text extractor -> node stream.

The graft analog of the reference's PP-Structure layout branch
(`engines/paddle_structure_engine.py:118-329`): a second document format
producing the same node schema as the HTML tokenizer, so the downstream
pipeline is format-agnostic (SURVEY.md §2.10 X2 strategy split).

Scope is bounded exactly like the reference bounds itself to what Tesseract
can see: single xref, raw or FlateDecode content streams, text ops:

  BT ... ET         text object
  (string) Tj       show string
  [(a) -120 (b)] TJ show array
  Td / TD / T*      -> line break

FlateDecode (zlib) streams — what nearly every real-world PDF ships
(VERDICT r02 missing #1) — are inflated with a hard output cap so a
crafted decompression bomb cannot blow out an executor (the stream is
skipped instead; never-raise policy).  Escapes \\( \\) \\\\ \\n and octal
\\ddd are handled.  Anything unparseable yields zero nodes (never raises)
and the caller records a warning.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List

# stream with its preceding dictionary: << /Length n [/Filter /FlateDecode] >>
_DICT_STREAM_RE = re.compile(rb"<<((?:[^<>]|<<[^<>]*>>)*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")

# inflate cap: a content stream that claims more than this is either not a
# text page or a zip bomb — skip it rather than OOM a worker (64 KB of text
# ops is ~3000 lines, far beyond any fixture or sane invoice)
MAX_INFLATED_BYTES = 1 << 22  # 4 MiB
_TEXTOBJ_RE = re.compile(rb"BT(.*?)ET", re.S)
# PDF real syntax (PDF 32000-1 §7.3.3): optional sign, '34', '4.5',
# '.5' and '12.' are all legal — a digits-only pattern misparsed '.5'
# as '5' (10x position error) and skipped '12.' ops entirely
_NUM = rb"[+-]?(?:\d+\.?\d*|\.\d+)"
# one operator token at a time inside a text object, WITH operands for
# the positioning ops (r06 layout upgrade: Td/TD translations, TL
# leading, Tm text matrix, Tf font size are tracked so every shown
# string carries its page position)
_OP_RE = re.compile(
    rb"\((?P<tj>(?:[^()\\]|\\.)*)\)\s*Tj"                       # (..) Tj
    rb"|(?P<tjarr>\[(?:[^\]\\]|\\.)*?\])\s*TJ"                  # [..] TJ
    rb"|(?P<tdx>" + _NUM + rb")\s+(?P<tdy>" + _NUM + rb")\s+(?P<tdop>Td|TD)"
    rb"|(?P<tl>" + _NUM + rb")\s+TL"
    rb"|/[^\s/<>\[\]()]+\s+(?P<tf>" + _NUM + rb")\s+Tf"
    rb"|(?P<tm>(?:" + _NUM + rb"\s+){6})Tm"
    rb"|T\*",
    re.S,
)
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)


# operand clamp: any |coordinate| beyond 10^12 milli-pt (a page a billion
# points wide) is hostile input, and an unclamped 400-digit operand
# floats to inf -> int(round(inf)) raised, breaking never-raise
_MILLI_CAP = 10**12


def _milli(tok: bytes) -> int:
    """PDF numeric operand -> exact integer milli-units, clamped to
    +-10^12 (house rule: no float leaves pycore; 1/1000 pt resolution is
    far below any layout decision threshold; hostile huge operands clamp
    instead of overflowing)."""
    v = float(tok) * 1000
    if v > _MILLI_CAP:
        return _MILLI_CAP
    if v < -_MILLI_CAP:
        return -_MILLI_CAP
    return int(round(v))

_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_pdf_string(body: bytes) -> bytes:
    if b"\\" not in body:  # fast path: nothing to unescape (most strings)
        return body
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and body[j : j + 1].isdigit():
                    oct_digits += body[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _stream_bodies(raw: bytes):
    """Decoded content-stream bodies: raw for uncompressed streams, inflated
    (bounded) for /FlateDecode; undecodable streams are skipped."""
    for m in _DICT_STREAM_RE.finditer(raw):
        sdict, body = m.group(1), m.group(2)
        if _FLATE_RE.search(sdict):
            try:
                d = zlib.decompressobj()
                body = d.decompress(body, MAX_INFLATED_BYTES)
                if d.unconsumed_tail:
                    continue  # over the cap: bomb or not a text stream
            except zlib.error:
                continue
        yield body


def pdf_spans(raw: bytes) -> List[Dict]:
    """PDF bytes -> positioned text spans, the LAYOUT-PARSE output (r06):
    ``[{"text", "x_milli", "y_milli", "size_milli", "seq"}, ...]`` in
    STREAM order.  One span per text-showing run at a distinct line
    origin; positions are the PDF text-space line origin in integer
    milli-points (user space = text space here: the graft tracks Tm's
    translation and Td/TD/T*/TL line moves, the exact subset the
    reference's PP-Structure layout boxes correspond to — glyph-width
    advances need font metrics and are out of scope, so consecutive
    shows on one line concatenate at the line origin).

    State per text object (PDF 32000-1 §9.4): BT resets the TEXT MATRIX
    to identity, but Tf size and TL leading are graphics-state text
    parameters that PERSIST across BT/ET within a content stream (and
    across a page's concatenated streams — here one stream ~ one page,
    so they reset per stream); ``a b c d e f Tm`` sets the line origin
    to (e, f); ``tx ty Td`` translates it; ``tx ty TD`` also sets
    leading = -ty; ``v TL`` sets leading; ``T*`` moves (0, -leading);
    ``/F s Tf`` tracks the font size — ``size_milli`` is the size at the
    run's FIRST show: a Tf between two shows on one line does not flush
    the current run, so a mid-line size change keeps the run-initial
    size (r07, ADVICE: documented contract; machine-generated fixtures
    set Tf per line and never hit it).  Each span carries its stream's
    index as ``page`` — reading order is only defined WITHIN a page.
    Never raises; garbage yields [].
    """
    spans: List[Dict] = []
    spans_append = spans.append
    for page_no, stream in enumerate(_stream_bodies(raw)):
        leading = 0
        size = 12_000
        for textobj in _TEXTOBJ_RE.finditer(stream):
            x = y = 0
            cur: List[bytes] = []
            cur_append = cur.append
            cur_xy = (0, 0)
            cur_size = size

            def flush() -> None:
                nonlocal cur, cur_append
                if cur:
                    text = b"".join(cur).decode("utf-8", errors="replace")
                    # == re.sub(r"\s+", " ", text).strip(): str.split()
                    # splits on the same Unicode whitespace class
                    text = " ".join(text.split())
                    if text:
                        spans_append(
                            {
                                "text": text,
                                "page": page_no,
                                "x_milli": cur_xy[0],
                                "y_milli": cur_xy[1],
                                "size_milli": cur_size,
                                "seq": len(spans),
                            }
                        )
                    cur = []
                    cur_append = cur.append

            # branch dispatch on lastgroup (r07): the show-string content is
            # captured by the op regex itself ('tj'), so Tj needs no second
            # _STR_RE pass; group() calls only run on the branch taken
            for op in _OP_RE.finditer(textobj.group(0)):
                which = op.lastgroup
                if which == "tj":
                    if not cur:
                        cur_xy, cur_size = (x, y), size
                    cur_append(_unescape_pdf_string(op.group("tj")))
                elif which == "tjarr":
                    if not cur:
                        cur_xy, cur_size = (x, y), size
                    for s in _STR_RE.finditer(op.group("tjarr")):
                        cur_append(_unescape_pdf_string(s.group(0)[1:-1]))
                elif which == "tdop":
                    flush()
                    tx, ty = _milli(op.group("tdx")), _milli(op.group("tdy"))
                    x, y = x + tx, y + ty
                    if op.group("tdop") == b"TD":
                        leading = -ty
                elif which == "tl":
                    leading = _milli(op.group("tl"))
                elif which == "tf":
                    size = _milli(op.group("tf"))
                elif which == "tm":
                    flush()
                    nums = op.group("tm").split()
                    x, y = _milli(nums[4]), _milli(nums[5])
                else:  # T*
                    flush()
                    y -= leading
            flush()
    return spans


def tokenize_pdf(raw: bytes) -> List[Dict]:
    """PDF bytes -> node dicts with the same fields as tokenize_html,
    in READING order: spans sorted by (page, y descending, x ascending,
    stream sequence) — PDF y grows up-page, and content streams are
    free to emit text out of visual order (footers first, columns
    interleaved), so stream order is NOT reading order WITHIN a page;
    across pages, stream order IS document order (page is the major
    key, else two pages sharing a y range would interleave).  For
    monotonically-descending single-column documents (every fixture)
    this equals stream order, which keeps the e2e byte-identity
    contract unchanged.

    Each span becomes one node with tag_class='p'; link stats are
    always 0 (PDF has no anchors here).
    """
    nodes: List[Dict] = []
    ordered = sorted(
        pdf_spans(raw),
        key=lambda s: (s["page"], -s["y_milli"], s["x_milli"], s["seq"]),
    )
    for span in ordered:
        text = span["text"]
        nodes.append(
            {
                "node_id": len(nodes),
                "tag_class": "p",
                "text": text,
                "n_chars": len(text),
                "n_link_chars": 0,
                "n_words": len(text.split(" ")),
            }
        )
    return nodes


def is_pdf(raw: bytes) -> bool:
    return raw[:5] == b"%PDF-"


def make_pdf(lines: List[str], compress: bool = True) -> bytes:
    """Deterministic minimal single-page PDF — the fixture generator's PDF
    writer (UTF-8 text in Tj strings; parseable by tokenize_pdf; also a
    structurally valid PDF).  ``compress=True`` (default) Flate-encodes the
    content stream the way real-world PDFs do (zlib level 6, deterministic
    output for a given zlib version); ``compress=False`` keeps the raw
    stream for the uncompressed-branch tests."""
    esc = lambda s: s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc(line)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("utf-8")
    if compress:
        content = zlib.compress(content, 6)
        stream_obj = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(content), content)
        )
    else:
        stream_obj = b"<< /Length %d >>\nstream\n%s\nendstream" % (
            len(content),
            content,
        )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_obj,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def detect_tables(
    spans: List[Dict], y_tol_milli: int = 3000, min_rows: int = 3
) -> List[Dict]:
    """Column-aligned table detection over positioned spans — the
    layout-analysis analog of the reference's PP-Structure table branch
    (`engines/paddle_structure_engine.py:118-329`), on exact PDF
    coordinates instead of learned region proposals.

    Deterministic integer geometry, per page:
    1. spans group into VISUAL ROWS (y within ``y_tol_milli`` of the
       row's first span, descending-y scan);
    2. an x value shared by >= ``min_rows`` distinct rows is a COLUMN
       ANCHOR (machine-generated tables place every cell of a column at
       the same Td x; prose never repeats an indent that regularly at
       2+ anchors);
    3. a row aligned on >= 2 DISTINCT anchors is a TABLE ROW (two spans
       stacked on ONE anchor — a wrapped cell, or prose repeating the
       left margin — is one column of evidence, not a table row); its
       anchor-aligned spans become cells ``{"page", "row", "col",
       "x_milli", "y_milli", "text"}`` with row numbered top-down per
       page and col = the anchor's rank by x.  Multiple spans on the
       same (row, col) — a wrapped cell — MERGE in reading order with a
       space, so (row, col) is a key.
    Spans off the anchors (prose, headers spanning columns) are simply
    not cells.  Never raises; non-tabular input yields [].
    """
    from collections import defaultdict

    out: List[Dict] = []
    by_page: Dict[int, List[Dict]] = defaultdict(list)
    for s in spans:
        by_page[s["page"]].append(s)
    for page in sorted(by_page):
        ss = sorted(
            by_page[page],
            key=lambda s: (-s["y_milli"], s["x_milli"], s["seq"]),
        )
        rows: List[List] = []  # [row_y, [spans]]
        for s in ss:
            if rows and abs(rows[-1][0] - s["y_milli"]) <= y_tol_milli:
                rows[-1][1].append(s)
            else:
                rows.append([s["y_milli"], [s]])
        x_rows: Dict[int, set] = defaultdict(set)
        for ri, (_, group) in enumerate(rows):
            for s in group:
                x_rows[s["x_milli"]].add(ri)
        anchors = sorted(x for x, rs in x_rows.items() if len(rs) >= min_rows)
        if len(anchors) < 2:
            continue
        col = {x: i for i, x in enumerate(anchors)}
        row_no = 0
        for _, group in rows:
            cells = [s for s in group if s["x_milli"] in col]
            if len({col[s["x_milli"]] for s in cells}) < 2:
                continue
            merged: Dict[int, Dict] = {}
            for s in cells:  # group is already in (-y, x, seq) order
                c = col[s["x_milli"]]
                if c in merged:
                    merged[c]["text"] += " " + s["text"]
                else:
                    merged[c] = {
                        "page": page,
                        "row": row_no,
                        "col": c,
                        "x_milli": s["x_milli"],
                        "y_milli": s["y_milli"],
                        "text": s["text"],
                    }
            out.extend(merged[c] for c in sorted(merged))
            row_no += 1
    return out
