"""Receipt/invoice field extraction as native Spark SQL (SURVEY §2.8 F4-F20).

DataFrame-level operators over (key, text) rows.  Line-scoped semantics
("first line containing keyword K with a positive amount") are expressed as

    posexplode(split(text, '\\n'))  ->  per-line exprs  ->  min_by(value, pos)

— one explode + one hash aggregation per document set, keyed identically to
the upstream rollup so no extra exchange is introduced.  Document-scoped
regexes (date/phone/tax) are plain column expressions computed pre-explode.

Every expression mirrors its pycore.fields twin; the e2e corpus test asserts
exact agreement row by row.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..pycore import fields as pf
from .normalize import normalize_amount, era_base, fold_digits

# ---------------------------------------------------------------------------
# document-scoped scalar builders
# ---------------------------------------------------------------------------


def _extract_int(col: Column, pattern: str, group: int) -> Column:
    g = F.regexp_extract(col, pattern, group)
    return F.when(g != "", g).cast("int")


def _is_valid_ymd(y: Column, m: Column, d: Column) -> Column:
    from .normalize import _is_valid_ymd as impl

    return impl(y, m, d)


def _fmt_valid(y: Column, m: Column, d: Column) -> Column:
    return F.when(_is_valid_ymd(y, m, d), F.format_string("%04d-%02d-%02d", y, m, d))


def date_in_text(col: Column) -> Column:
    """First date -> ISO; western > era > compact priority, NO fullwidth fold
    (mirrors pycore.fields.extract_date / ref receipt.py:96-104,190-199)."""
    western = _fmt_valid(
        _extract_int(col, pf.P_DATE_WESTERN, 1),
        _extract_int(col, pf.P_DATE_WESTERN, 2),
        _extract_int(col, pf.P_DATE_WESTERN, 3),
    )
    era = _fmt_valid(
        era_base(F.regexp_extract(col, pf.P_DATE_ERA, 1)) + _extract_int(col, pf.P_DATE_ERA, 2),
        _extract_int(col, pf.P_DATE_ERA, 3),
        _extract_int(col, pf.P_DATE_ERA, 4),
    )
    compact = _fmt_valid(
        _extract_int(col, pf.P_DATE_COMPACT, 1),
        _extract_int(col, pf.P_DATE_COMPACT, 2),
        _extract_int(col, pf.P_DATE_COMPACT, 3),
    )
    return F.coalesce(western, era, compact)


def date_raw_in_text(col: Column) -> Column:
    """Raw matched date string of the winning pattern."""
    w_ok = _fmt_valid(
        _extract_int(col, pf.P_DATE_WESTERN, 1),
        _extract_int(col, pf.P_DATE_WESTERN, 2),
        _extract_int(col, pf.P_DATE_WESTERN, 3),
    )
    e_ok = _fmt_valid(
        era_base(F.regexp_extract(col, pf.P_DATE_ERA, 1)) + _extract_int(col, pf.P_DATE_ERA, 2),
        _extract_int(col, pf.P_DATE_ERA, 3),
        _extract_int(col, pf.P_DATE_ERA, 4),
    )
    return F.coalesce(
        F.when(w_ok.isNotNull(), F.regexp_extract(col, pf.P_DATE_WESTERN, 0)),
        F.when(e_ok.isNotNull(), F.regexp_extract(col, pf.P_DATE_ERA, 0)),
        F.when(
            _fmt_valid(
                _extract_int(col, pf.P_DATE_COMPACT, 1),
                _extract_int(col, pf.P_DATE_COMPACT, 2),
                _extract_int(col, pf.P_DATE_COMPACT, 3),
            ).isNotNull(),
            F.regexp_extract(col, pf.P_DATE_COMPACT, 0),
        ),
    )


def first_amount(col: Column) -> Column:
    """First money token (ref receipt.py:263-269)."""
    g = F.regexp_extract(col, pf.P_AMOUNT_ANY, 1)
    return normalize_amount(F.when(g != "", g))


def phone_in_text(col: Column) -> Column:
    """First >=10-digit phone (ref receipt.py:315-333)."""
    g = F.regexp_extract(col, pf.P_PHONE, 1)
    cleaned = F.regexp_replace(g, "[^0-9\\-]", "")
    digits = F.regexp_replace(cleaned, "-", "")
    return F.when((g != "") & (F.length(digits) >= 10), cleaned)


def payment_method(col: Column) -> Column:
    """First payment keyword in priority order (ref receipt.py:421-429)."""
    upper = F.upper(col)
    branches = [
        F.when(F.contains(upper, F.lit(kw)), F.lit(method))
        for kw, method in pf.PAYMENT_KEYWORDS
    ]
    return F.coalesce(*branches)


def tax_rate(col: Column, pattern: str) -> Column:
    g = F.regexp_extract(col, pattern, 1)
    return normalize_amount(F.when(g != "", g))


def invoice_number(col: Column) -> Column:
    """Priority regex chain (ref invoice.py:258-272)."""
    branches = []
    for pat in pf.P_INVOICE_NO:
        g = F.regexp_extract(col, pat, 1)
        branches.append(F.when(g != "", g))
    return F.coalesce(*branches)


def bank_columns(col: Column) -> List[Column]:
    acct1 = F.regexp_extract(col, pf.P_ACCT_NO, 1)
    acct2 = F.regexp_extract(col, pf.P_ACCT_NO, 2)
    return [
        F.when(F.regexp_extract(col, pf.P_BANK, 1) != "", F.regexp_extract(col, pf.P_BANK, 1)).alias("bank_name"),
        F.when(F.regexp_extract(col, pf.P_BRANCH, 1) != "", F.regexp_extract(col, pf.P_BRANCH, 1)).alias("branch_name"),
        F.when(F.regexp_extract(col, pf.P_ACCT_TYPE, 1) != "", F.regexp_extract(col, pf.P_ACCT_TYPE, 1)).alias("account_type"),
        F.coalesce(F.when(acct1 != "", acct1), F.when(acct2 != "", acct2)).alias("account_number"),
    ]


def _contains_any(col: Column, keywords: Sequence[str]) -> Column:
    cond = F.lit(False)
    for kw in keywords:
        cond = cond | F.contains(col, F.lit(kw))
    return cond


# ---------------------------------------------------------------------------
# line-scoped: item parse (ref receipt.py:360-400)
# ---------------------------------------------------------------------------

ITEM_SCHEMA = "struct<name:string, price:bigint, quantity:int, reduced_tax:boolean>"


def parse_item_line(line: Column) -> Column:
    """line -> item struct or NULL — exact mirror of pycore.parse_item_line."""
    reduced = _contains_any(line, pf.REDUCED_TAX_MARKERS)
    eol_g = F.regexp_extract(line, pf.P_AMOUNT_EOL, 1)
    sym_g = F.regexp_extract(line, pf.P_AMOUNT_SYM, 1)
    amount_str = F.when(eol_g != "", eol_g).otherwise(F.when(sym_g != "", sym_g))
    price = normalize_amount(amount_str)
    # name = prefix before the matched amount (match start semantics)
    name_eol = F.regexp_replace(line, pf.P_AMOUNT_EOL, "")
    name_sym = F.regexp_extract(line, "^(.*?)" + pf.P_AMOUNT_SYM, 1)
    name0 = F.trim(F.when(eol_g != "", name_eol).otherwise(name_sym))
    for mk in pf.REDUCED_TAX_MARKERS:
        name0 = F.trim(F.replace(name0, F.lit(mk)))
    qty_g = F.regexp_extract(name0, pf.P_QTY, 1)
    qty = F.when(qty_g != "", qty_g.cast("int")).otherwise(F.lit(1))
    name = F.when(
        qty_g != "", F.trim(F.regexp_extract(name0, "^(.*?)" + pf.P_QTY, 1))
    ).otherwise(name0)
    veto = _contains_any(name, pf.ITEM_NAME_VETO)
    ok = (name != "") & price.isNotNull() & (price > 0) & ~veto
    return F.when(
        ok,
        F.struct(
            name.alias("name"),
            price.alias("price"),
            qty.alias("quantity"),
            reduced.alias("reduced_tax"),
        ),
    )


# ---------------------------------------------------------------------------
# DataFrame-level extractors
# ---------------------------------------------------------------------------


def _lines(df: DataFrame, keys: Sequence[str], text_col: str) -> DataFrame:
    return df.select(
        *keys, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )


def _minby_line(value: Column, cond: Column) -> Column:
    """value of the first line (by pos) where cond holds."""
    return F.min_by(F.when(cond, value), F.when(cond, F.col("pos")))


def extract_receipt_fields_df(
    df: DataFrame, keys: Sequence[str] = ("url",), text_col: str = "text"
) -> DataFrame:
    """(keys, text) -> one row per keys with receipt fields + items array.

    Mirrors pycore.fields.extract_receipt_fields (ref receipt.py:144-188).
    """
    keys = list(keys)
    text = F.col(text_col)
    doc_scalars = df.select(
        *keys,
        date_in_text(text).alias("date"),
        date_raw_in_text(text).alias("date_raw"),
        phone_in_text(text).alias("store_phone"),
        payment_method(text).alias("payment_method"),
        tax_rate(text, pf.P_TAX8).alias("tax_rate_8"),
        tax_rate(text, pf.P_TAX10).alias("tax_rate_10"),
        (F.length(text) == 0).alias("_no_content"),
    )

    lines = _lines(df, keys, text_col).withColumn("line", F.trim(F.col("line")))
    amt = first_amount(F.col("line"))
    total_hit = _contains_any(F.col("line"), pf.TOTAL_KEYWORDS)
    sub_hit = _contains_any(F.col("line"), pf.SUBTOTAL_KEYWORDS)
    # items stop at the first total line that is not a 小計 line (A6/W5)
    is_break = total_hit & ~F.contains(F.col("line"), F.lit("小計"))
    w_doc = Window.partitionBy(*keys)
    stop_pos = F.min(F.when(is_break, F.col("pos"))).over(w_doc)
    lines = lines.withColumn(
        "item",
        F.when(
            F.col("pos") < F.coalesce(stop_pos, F.lit(2**31 - 1)),
            parse_item_line(F.col("line")),
        ),
    )
    # store name: first of top-5 lines passing the veto chain (P6/W2)
    store_ok = (
        (F.col("pos") <= 4)
        & (F.length("line") >= 2)
        & ~_contains_any(F.col("line"), pf.STORE_NAME_VETO)
        & ~F.col("line").rlike("[0-9]{4}[年/\\-.]")
        & ~F.regexp_replace(F.col("line"), " ", "").rlike("^[0-9\\-()]+$")
    )
    line_agg = lines.groupBy(*keys).agg(
        _minby_line(amt, total_hit & amt.isNotNull() & (amt > 0)).alias("total_amount"),
        _minby_line(amt, sub_hit & amt.isNotNull()).alias("subtotal"),
        _minby_line(F.col("line"), store_ok).alias("store_name"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("item").isNotNull(),
                        F.struct(F.col("pos"), F.col("item")),
                    )
                )
            ),
            lambda x: x.getField("item"),
        ).alias("items"),
    )
    # shuffle-hash, not broadcast: both sides are document-scale relations
    # (a broadcast here also OOMs a default-heap driver at test scale)
    joined = doc_scalars.join(line_agg.hint("shuffle_hash"), keys, "left")
    return joined.withColumn("warnings", receipt_warnings_col()).drop("_no_content")


def vendor_on_line(line: Column) -> Column:
    """F14: first company pattern on a non-addressee line (ref
    invoice.py:347-369)."""
    company = F.coalesce(
        *[
            F.when(F.regexp_extract(line, pat, 1) != "",
                   F.regexp_extract(line, pat, 1))
            for pat in pf.P_COMPANY
        ]
    )
    veto = F.contains(line, F.lit("御中")) | F.contains(line, F.lit("様"))
    return F.when(~veto, F.trim(company))


def customer_on_line(line: Column) -> Column:
    """F15: prefix before 御中/殿 + re-appended honorific (ref
    invoice.py:371-388)."""
    head_g = F.trim(F.element_at(F.split(line, "御中"), 1))
    head_d = F.trim(F.element_at(F.split(line, "殿"), 1))
    return F.coalesce(
        F.when(F.contains(line, F.lit("御中")) & (head_g != ""),
               F.concat(head_g, F.lit(" 御中"))),
        F.when(F.contains(line, F.lit("殿")) & (head_d != ""),
               F.concat(head_d, F.lit(" 殿"))),
    )


INVOICE_ITEM_SCHEMA = (
    "struct<name:string, quantity:int, unit_price:bigint, amount:bigint>"
)


def parse_invoice_item_line(line: Column) -> Column:
    """F20 table-row parse (ref invoice.py:443-475)."""
    name = F.trim(F.regexp_extract(line, pf.P_ITEM_ROW, 1))
    qty = F.regexp_extract(line, pf.P_ITEM_ROW, 2)
    unit = F.regexp_extract(line, pf.P_ITEM_ROW, 3)
    amt_g = F.regexp_extract(line, pf.P_ITEM_ROW, 4)
    amount = normalize_amount(F.when(amt_g != "", amt_g))
    ok = (
        (qty != "")
        & (name != "")
        & ~_contains_any(name, pf.INVOICE_ITEM_VETO)
        & amount.isNotNull()
        & (amount != 0)
    )
    return F.when(
        ok,
        F.struct(
            name.alias("name"),
            qty.cast("int").alias("quantity"),
            normalize_amount(F.when(unit != "", unit)).alias("unit_price"),
            amount.alias("amount"),
        ),
    )


def _warnings_array(*pairs) -> Column:
    """array of warning strings from (condition, message) pairs, nulls out."""
    return F.filter(
        F.array(*[F.when(cond, F.lit(msg)) for cond, msg in pairs]),
        lambda x: x.isNotNull(),
    )


def receipt_warnings_col() -> Column:
    """Mirror of pycore.fields.receipt_warnings over the joined fields row
    (no_content = empty text)."""
    reduced = F.exists(F.col("items"), lambda i: i["reduced_tax"])
    return _warnings_array(
        (F.col("date").isNull(), "日付を抽出できませんでした"),
        (F.col("total_amount").isNull(), "合計金額を抽出できませんでした"),
        (F.col("store_name").isNull(), "店舗名を抽出できませんでした"),
        (F.col("_no_content"), "本文を抽出できませんでした"),
        (
            reduced & F.col("tax_rate_8").isNull() & F.col("tax_rate_10").isNull(),
            "軽減税率対象品目がありますが、税額詳細が見つかりません",
        ),
    )


def invoice_warnings_col() -> Column:
    return _warnings_array(
        (F.col("invoice_date").isNull(), "請求日を抽出できませんでした"),
        (F.col("total_amount").isNull(), "請求総額を抽出できませんでした"),
        (F.col("vendor_name").isNull(), "発行元名を抽出できませんでした"),
        (
            F.col("bank_name").isNull() & F.col("account_number").isNull(),
            "振込先口座情報を抽出できませんでした",
        ),
        (
            (F.col("bank_name").isNotNull() | F.col("account_number").isNotNull())
            & F.col("account_number").isNull(),
            "口座番号を抽出できませんでした",
        ),
        (F.col("_no_content"), "本文を抽出できませんでした"),
    )


def extract_invoice_fields_df(
    df: DataFrame, keys: Sequence[str] = ("url",), text_col: str = "text"
) -> DataFrame:
    """(keys, text) -> invoice fields + items + warnings (ref
    invoice.py:164-217)."""
    keys = list(keys)
    text = F.col(text_col)
    sub_g = F.regexp_extract(text, pf.P_SUBTOTAL_KW, 1)
    tax_g = F.regexp_extract(text, pf.P_TAXAMT_KW, 1)
    doc_scalars = df.select(
        *keys,
        invoice_number(text).alias("invoice_number"),
        normalize_amount(F.when(sub_g != "", sub_g)).alias("subtotal"),
        normalize_amount(F.when(tax_g != "", tax_g)).alias("tax_amount"),
        *bank_columns(text),
        (F.length(text) == 0).alias("_no_content"),
    )
    lines = _lines(df, keys, text_col)
    line_date = date_in_text(F.col("line"))
    amt = first_amount(F.col("line"))
    inv_date_hit = _contains_any(F.col("line"), pf.INVOICE_DATE_KEYWORDS)
    due_hit = _contains_any(F.col("line"), pf.DUE_DATE_KEYWORDS)
    total_hit = _contains_any(F.col("line"), pf.INVOICE_TOTAL_KEYWORDS)
    vendor = vendor_on_line(F.col("line"))
    customer = customer_on_line(F.col("line"))
    item = parse_invoice_item_line(F.col("line"))
    line_agg = lines.groupBy(*keys).agg(
        _minby_line(line_date, inv_date_hit & line_date.isNotNull()).alias("invoice_date"),
        _minby_line(line_date, due_hit & line_date.isNotNull()).alias("due_date"),
        _minby_line(amt, total_hit & amt.isNotNull() & (amt > 0)).alias("total_amount"),
        _minby_line(vendor, vendor.isNotNull() & (vendor != "")).alias("vendor_name"),
        _minby_line(customer, customer.isNotNull()).alias("customer_name"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(item.isNotNull(), F.struct(F.col("pos"), item.alias("item")))
                )
            ),
            lambda x: x["item"],
        ).alias("items"),
    )
    joined = doc_scalars.join(line_agg.hint("shuffle_hash"), keys, "left")
    return joined.withColumn("warnings", invoice_warnings_col()).drop("_no_content")
