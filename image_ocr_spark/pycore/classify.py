"""Rule-based document classification (pure Python reference).

Graft of the reference's keyword-weight classifier (classifier.py:33-259):
weighted keyword occurrence scoring with diminishing returns, negative
keywords, score normalization, argmax + UNKNOWN threshold.

Weights are kept in *integer deci-units* (weight 3.0 -> 30) and the score is
returned in *centi-units* so the whole computation is exact integer
arithmetic — identical in Python, Spark SQL, and DuckDB:

    score_centi = max(0, sum_kw w10 * (10 + 3*(count-1)) - sum_neg 5*w10)

(ref classifier.py:218-245: weight*(1+0.3*(count-1)), negatives -0.5*weight,
floor 0 — multiplied through by 100).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .normalize import fold_alnum_upper

# weight x10 tables (ref classifier.py:37-126, uppercased at match time)
RECEIPT_KEYWORDS_W10: Dict[str, int] = {
    "領収書": 30, "領収証": 30, "レシート": 30, "RECEIPT": 25,
    "合計": 15, "小計": 15, "税込": 15, "税抜": 15, "内税": 15, "外税": 15,
    "お預り": 12, "お釣り": 12, "おつり": 12,
    "現金": 10, "クレジット": 10, "電子マネー": 10,
    "軽減税率": 15, "8%対象": 15, "10%対象": 12, "※": 8,
    "店舗": 8, "TEL": 8, "電話": 5,
    "いらっしゃいませ": 10, "ありがとうございました": 10,
    "登録": 5, "精算": 8,
}
INVOICE_KEYWORDS_W10: Dict[str, int] = {
    "請求書": 35, "御請求書": 35, "INVOICE": 30, "請求金額": 30,
    "支払期限": 20, "お支払期限": 20, "振込期限": 20, "期日": 15,
    "振込先": 25, "お振込先": 25, "銀行": 20, "口座番号": 25, "口座": 15,
    "普通": 10, "当座": 10, "支店": 15,
    "御中": 20, "様": 5, "宛": 10, "殿": 15,
    "税抜金額": 15, "消費税額": 15, "合計金額": 15,
    "納品": 10, "取引": 8, "品目": 8, "数量": 8, "単価": 8,
    "発行日": 15, "請求日": 20,
}
RECEIPT_NEGATIVE_W10: Dict[str, int] = {
    "請求書": 20, "振込先": 15, "口座番号": 15, "支払期限": 15,
}
INVOICE_NEGATIVE_W10: Dict[str, int] = {
    "レシート": 20, "お預り": 15, "お釣り": 15,
}

# UNKNOWN threshold: confidence < 0.30 (ref classifier.py:128,196-199).
# With integer scores: conf = s / (s_r + s_i); compare 100*s < 30*(s_r+s_i)
THRESHOLD_NUM = 30
THRESHOLD_DEN = 100


def count_occurrences(text: str, kw: str) -> int:
    """Non-overlapping occurrence count == str.count == the SQL
    (len(t)-len(replace(t,kw,'')))/len(kw) formula."""
    return text.count(kw)


# keyword dicts are module constants, so the uppercase fold of every key
# is precomputed once per distinct dict instead of 28x per document.
# The cache entry PINS the source dict (value holds a reference): id()
# keys are only unique among live objects, so caching by id without
# pinning would serve a dead dict's prep to a new dict at the same
# address.
_PREP_CACHE: Dict[int, tuple] = {}


def _prepped(d: Dict[str, int]) -> list:
    entry = _PREP_CACHE.get(id(d))
    if entry is None or entry[0] is not d:
        entry = _PREP_CACHE[id(d)] = (
            d,
            [(kw, kw.upper(), w10) for kw, w10 in d.items()],
        )
    return entry[1]


def keyword_score_centi(
    text_folded: str, positive_w10: Dict[str, int], negative_w10: Dict[str, int]
) -> Tuple[int, List[str]]:
    """Integer score in centi-units + matched keyword list (ref
    classifier.py:218-245).  ``text_folded`` must be fold_alnum_upper()ed;
    keyword dicts are treated as immutable (their fold prep is cached)."""
    score = 0
    matched = []
    for kw, kw_u, w10 in _prepped(positive_w10):
        cnt = count_occurrences(text_folded, kw_u)
        if cnt > 0:
            score += w10 * (10 + 3 * (cnt - 1))
            matched.append(kw)
    for _kw, kw_u, w10 in _prepped(negative_w10):
        if kw_u in text_folded:
            score -= 5 * w10
    return max(0, score), matched


def classify_doc(text: str) -> Dict:
    """Full classification (no aspect ratio — pages have no aspect; the
    layout-hint branch of ref classifier.py:162-179 is exercised separately
    in tests via an explicit hint argument on score_with_layout_hint)."""
    folded = fold_alnum_upper(text or "")
    r_score, r_matched = keyword_score_centi(
        folded, RECEIPT_KEYWORDS_W10, RECEIPT_NEGATIVE_W10
    )
    i_score, i_matched = keyword_score_centi(
        folded, INVOICE_KEYWORDS_W10, INVOICE_NEGATIVE_W10
    )
    total = r_score + i_score
    if r_score > i_score:
        doc_type, top = "receipt", r_score
    else:
        doc_type, top = "invoice", i_score
    # UNKNOWN when conf < 0.3, i.e. 100*top < 30*total (total==0 -> UNKNOWN)
    if total == 0 or THRESHOLD_DEN * top < THRESHOLD_NUM * total:
        doc_type = "unknown"
    return {
        "doc_type": doc_type,
        "receipt_score_centi": r_score,
        "invoice_score_centi": i_score,
        "matched_receipt": r_matched,
        "matched_invoice": i_matched,
    }


def score_with_layout_hint(r_score: int, i_score: int, aspect_milli: int) -> Tuple[int, int]:
    """Layout boost (ref classifier.py:164-168) in integer milli-aspect:
    aspect>2.0 -> receipt*1.2 (x12/10); aspect<0.8 -> invoice*1.1 (x11/10)."""
    if aspect_milli > 2000:
        r_score = (r_score * 12) // 10
    elif aspect_milli < 800:
        i_score = (i_score * 11) // 10
    return r_score, i_score
