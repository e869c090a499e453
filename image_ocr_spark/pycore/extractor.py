"""Single-process oracle extractor: page bytes -> extraction result.

This is the end-to-end per-document pipeline run WITHOUT Spark — the
byte-identity reference for the distributed job (north rule: byte-identical
extracted text per url).  It composes the same pycore pieces the Spark
operators use:

  tokenize (html or pdf) -> content selection -> canonical main text
  -> classify -> field extraction -> labeled spans

Mirrors the reference pipeline order `pipeline.py:156-271` (preprocess ->
recognize -> classify -> extract) including its never-raise error policy.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from .blocks import extract_main_text, select_content
from .classify import classify_doc
from .fields import (
    P_AMOUNT_YEN,
    P_DATE_ERA,
    P_DATE_WESTERN,
    P_PHONE,
    extract_invoice_fields,
    extract_receipt_fields,
    invoice_warnings,
    receipt_warnings,
)
from .htmltok import page_title, tokenize_html
from .pdftok import is_pdf, tokenize_pdf

# span labels scanned over the canonical text (F4/F7/F12 as global scans)
SPAN_PATTERNS = [
    ("date", P_DATE_WESTERN),
    ("date_era", P_DATE_ERA),
    ("amount", r"[¥￥][0-9,，]+"),
    ("amount_yen", P_AMOUNT_YEN),
    ("phone", r"0[0-9]{1,3}-[0-9]{2,4}-[0-9]{3,4}"),
]
_SPAN_RX = [(label, re.compile(p)) for label, p in SPAN_PATTERNS]


def label_spans(text: str) -> List[Dict]:
    """All labeled spans over the canonical text, ordered by (start, label).

    Byte offsets are *character* offsets into the canonical string — the
    same on both sides because the string is identical.
    """
    spans = []
    for label, rx in _SPAN_RX:
        for m in rx.finditer(text):
            spans.append(
                {"start": m.start(), "end": m.end(), "label": label, "value": m.group(0)}
            )
    spans.sort(key=lambda s: (s["start"], s["label"]))
    return spans


def extract_page(html: bytes) -> Dict:
    """Full per-page extraction (the oracle for one row)."""
    warnings: List[str] = []
    try:
        if is_pdf(html):
            nodes = tokenize_pdf(html)
            engine = "pdf"
        else:
            nodes = tokenize_html(html)
            engine = "html"
    except Exception as exc:  # never-raise policy (ref pipeline.py:251-271)
        nodes, engine = [], "error"
        warnings.append(f"tokenize failed: {type(exc).__name__}")

    text = extract_main_text(nodes)
    title = page_title(nodes)
    cls = classify_doc(text)
    doc_type = cls["doc_type"]

    fields: Dict = {}
    if doc_type == "receipt":
        fields = extract_receipt_fields(text)
        fields["warnings"] = receipt_warnings(fields, no_content=(text == ""))
    elif doc_type == "invoice":
        fields = extract_invoice_fields(text)
        fields["warnings"] = invoice_warnings(fields, no_content=(text == ""))

    if not text:
        warnings.append("no main content extracted")

    return {
        "text": text,
        "title": title,
        "engine": engine,
        "n_nodes": len(nodes),
        "n_content_nodes": len(select_content(nodes)),
        "doc_type": doc_type,
        "receipt_score_centi": cls["receipt_score_centi"],
        "invoice_score_centi": cls["invoice_score_centi"],
        "fields": fields,
        "spans": label_spans(text),
        "warnings": warnings,
    }
