"""Deterministic page synthesis: documents rows -> Common-Crawl-style pages.

Graft of the reference's synthetic-document generator (`gui.py:48-1016`,
24 seeded patterns with known ground truth): every page is a pure function
of ``(doc_id, text, lang)`` so the expected extraction output is computable
independently — by this module (pytest oracle), by DuckDB SQL (the driver's
correctness gate), and by arithmetic on ``doc_id`` for receipt/invoice
fields.

Page kinds by ``doc_id % 10``:
  0-4  article  — boilerplate (header/nav/aside/footer) around main content;
                  expected text = "Article {doc_id}\\n" + clean(text)
  5    linkfarm — all-anchor body; expected text = ""
  6    receipt  — JP receipt lines (ref gui.py:303-370); fields from doc_id
  7    invoice  — JP invoice lines (ref gui.py:444-526); fields from doc_id
  8    pdf      — same article content as minimal uncompressed PDF bytes
  9    edge     — doc_id%30==9: empty body; ==19: whitespace-only;
                  ==29: entity/fullwidth-noised article (same expected text)
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..pycore.normalize import clean_text
from ..pycore.pdftok import make_pdf

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z — warc_ts base (no wallclock)
HOT_HOST = "big.example.com"


def host_for(doc_id: int) -> str:
    """~30% of urls on one hot host — exercises the skew-salting path."""
    return HOT_HOST if doc_id % 10 < 3 else f"h{doc_id % 97}.example.net"


def url_for(doc_id: int) -> str:
    return f"https://{host_for(doc_id)}/p/{doc_id}"


def warc_ts_for(doc_id: int) -> int:
    """Unix seconds; deterministic spread over ~70 days."""
    return EPOCH_2024 + (doc_id % 100000) * 60


def kind_for(doc_id: int) -> str:
    k = doc_id % 10
    if k <= 4:
        return "article"
    if k == 5:
        return "linkfarm"
    if k == 6:
        return "receipt"
    if k == 7:
        return "invoice"
    if k == 8:
        return "pdf"
    m = doc_id % 30
    return "empty" if m == 9 else ("whitespace" if m == 19 else "noised")


# ---------------------------------------------------------------------------
# Receipt / invoice ground-truth arithmetic (mirrored in DuckDB SQL by
# __spark_entry__.oracle_sql — keep these formulas dead simple)
# ---------------------------------------------------------------------------

def receipt_values(doc_id: int) -> Dict[str, int]:
    a = 200 + (doc_id % 10) * 10          # りんご unit price (x2 on the line)
    b = 150 + (doc_id % 10) * 10          # 牛乳 (reduced tax ※ -> 8% base)
    c = 100 + ((doc_id // 10) % 10) * 10  # パン
    sub = a + b + c
    paid = ((sub + 99) // 100) * 100
    return {
        "a": a, "b": b, "c": c, "subtotal": sub, "total": sub, "paid": paid,
        "tax8_base": b, "tax10_base": a + c,
        "month": 1 + doc_id % 12, "day": 1 + doc_id % 28,
        "tel1": 1000 + doc_id % 9000, "tel2": 1000 + (doc_id * 7) % 9000,
        "store_no": doc_id % 100,
    }


def receipt_lines(doc_id: int) -> List[str]:
    # tax-breakdown lines (F17: ref extractors/receipt.py:28-34,402-419 —
    # TaxDetails) sit AFTER the 合計 break so the item scan is unaffected
    v = receipt_values(doc_id)
    return [
        "領収書",
        f"スーパーABC{v['store_no']}号店",
        f"TEL: 03-{v['tel1']:04d}-{v['tel2']:04d} (代)",
        f"2024年{v['month']}月{v['day']}日",
        f"りんご ×2 ¥{v['a']}",
        f"※牛乳 ¥{v['b']}",
        f"パン ¥{v['c']}",
        f"小計 ¥{v['subtotal']}",
        f"合計 ¥{v['total']}",
        f"お預り ¥{v['paid']}",
        "現金",
        f"8%対象 ¥{v['tax8_base']}",
        f"10%対象 ¥{v['tax10_base']}",
    ]


def invoice_values(doc_id: int) -> Dict[str, int]:
    qty = 1 + doc_id % 9
    unit = 1000 + (doc_id % 50) * 100
    sub = qty * unit
    tax = sub // 10
    total = sub + tax
    return {
        "qty": qty, "unit": unit, "subtotal": sub, "tax": tax, "total": total,
        "month": 1 + doc_id % 12, "day": 1 + doc_id % 28,
        "due_month": 1 + (doc_id + 1) % 12, "due_day": 1 + (doc_id + 3) % 28,
        "acct": 1000000 + doc_id % 9000000,
    }


def _comma(n: int) -> str:
    """Thousands separator matching the SQL printf('%d,%03d') reconstruction."""
    return f"{n // 1000},{n % 1000:03d}" if n >= 1000 else str(n)


def invoice_lines(doc_id: int) -> List[str]:
    v = invoice_values(doc_id)
    return [
        "請求書",
        f"請求書番号: INV-2024-{doc_id:06d}",
        "株式会社テスト商事",
        "サンプル株式会社 御中",
        f"請求日: 2024年{v['month']}月{v['day']}日",
        f"支払期限: 2024年{v['due_month']}月{v['due_day']}日",
        "品目 数量 単価 金額",
        f"ウィジェット {v['qty']} ¥{_comma(v['unit'])} ¥{_comma(v['subtotal'])}",
        f"小計 ¥{_comma(v['subtotal'])}",
        f"消費税 ¥{_comma(v['tax'])}",
        f"御請求金額 ¥{_comma(v['total'])}",
        f"振込先: 三菱UFJ銀行 新宿支店 普通 {v['acct']}",
    ]


# ---------------------------------------------------------------------------
# HTML assembly
# ---------------------------------------------------------------------------

_BOILER_TOP = (
    "<header><h1>Example Site</h1>"
    "<nav><ul><li><a href='/'>Home</a></li><li><a href='/about'>About</a></li>"
    "<li><a href='/tags'>Tags</a></li><li><a href='/archive'>Archive</a></li>"
    "</ul></nav></header>"
)
_BOILER_SIDE = (
    "<aside><h3>Related</h3><ul>"
    + "".join(f"<li><a href='/rel/{i}'>Related link {i}</a></li>" for i in range(8))
    + "</ul></aside>"
)
_BOILER_BOTTOM = (
    "<footer><p><a href='/terms'>Terms</a> | <a href='/privacy'>Privacy</a> | "
    "Copyright 2024 Example Site</p></footer>"
)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _article_html(doc_id: int, text: str, noised: bool = False) -> str:
    body = _esc(text)
    title = f"Article {doc_id}"
    if noised:
        # entity/whitespace noise that canonicalization must absorb
        body = body.replace(" ", "&#32;  ", 1) + " \t "
    return (
        f"<html><head><meta charset=\"utf-8\"><title>{title} - Example Site</title></head>"
        f"<body>{_BOILER_TOP}"
        f"<main><h1>{title}</h1><p>{body}</p></main>"
        f"{_BOILER_SIDE}{_BOILER_BOTTOM}</body></html>"
    )


def _jp_html(title: str, lines: List[str]) -> str:
    paras = "".join(f"<p>{_esc(ln)}</p>" for ln in lines)
    return (
        f"<html><head><meta charset=\"utf-8\"><title>{title}</title></head>"
        f"<body>{_BOILER_TOP}<main>{paras}</main>{_BOILER_BOTTOM}</body></html>"
    )


def _linkfarm_html(doc_id: int) -> str:
    links = "".join(
        f"<li><a href='/x/{doc_id}/{i}'>Link target number {i} of many</a></li>"
        for i in range(20)
    )
    return (
        f"<html><head><title>Links {doc_id}</title></head>"
        f"<body>{_BOILER_TOP}<ul>{links}</ul>{_BOILER_BOTTOM}</body></html>"
    )


def build_page(doc_id: int, text: str, lang: str) -> Dict:
    """One documents row -> one page row (url, warc_ts, html, kind).

    ``warc_ts`` is unix seconds (int); callers cast to timestamp.
    """
    kind = kind_for(doc_id)
    text = text or ""
    if kind == "article":
        html = _article_html(doc_id, text).encode("utf-8")
    elif kind == "noised":
        html = _article_html(doc_id, text, noised=True).encode("utf-8")
    elif kind == "linkfarm":
        html = _linkfarm_html(doc_id).encode("utf-8")
    elif kind == "receipt":
        html = _jp_html("領収書", receipt_lines(doc_id)).encode("utf-8")
    elif kind == "invoice":
        html = _jp_html("請求書", invoice_lines(doc_id)).encode("utf-8")
    elif kind == "pdf":
        html = make_pdf([f"Article {doc_id}", text])
    elif kind == "empty":
        html = b"<html><head><title>empty</title></head><body></body></html>"
    else:  # whitespace
        html = b"<html><body><p> \t </p><p>\n</p></body></html>"
    return {
        "url": url_for(doc_id),
        "warc_ts": warc_ts_for(doc_id),
        "html": html,
        "lang": lang or "en",
        "kind": kind,
    }


def expected_text(doc_id: int, text: str) -> str:
    """Ground-truth extracted main text per page — the byte-identity target.

    MUST stay in lockstep with the DuckDB CASE expression in
    ``__spark_entry__.oracle_sql()['flagship_extract']``.
    """
    kind = kind_for(doc_id)
    if kind in ("article", "pdf", "noised"):
        return clean_text(f"Article {doc_id}\n" + clean_text(text or ""))
    if kind == "receipt":
        return "\n".join(receipt_lines(doc_id))
    if kind == "invoice":
        return "\n".join(invoice_lines(doc_id))
    return ""  # linkfarm / empty / whitespace


def expected_title(doc_id: int) -> Optional[str]:
    kind = kind_for(doc_id)
    if kind in ("article", "noised"):
        return f"Article {doc_id} - Example Site"
    if kind == "receipt":
        return "領収書"
    if kind == "invoice":
        return "請求書"
    if kind == "linkfarm":
        return f"Links {doc_id}"
    if kind == "empty":
        return "empty"
    return None  # pdf / whitespace have no <title>
