"""Final result assembly + JSON sink (ref pipeline.py:45-95, main.py:192-223).

One row per url: classification + type-dispatched extracted data (receipt
fields for receipt pages, invoice fields for invoice pages — the X2-style
branch expressed as two filtered extractors unioned by a left join on the
same key) + canonical text + warnings, serialized with to_json.

Field names inside the data structs mirror the reference's Japanese
to_dict keys (receipt.py:52-89, invoice.py:63-105).  Divergence note:
to_json drops ALL null fields (ignoreNullFields), while the reference's
to_dict always emits 日付/合計金額/店舗名 even when None and drops only the
optional ones — a fixed schema + uniform null-dropping is the Spark-native
equivalent; tests pin this contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.extract_fields import (
    extract_invoice_fields_df,
    extract_receipt_fields_df,
)


def _receipt_struct() -> Column:
    item = lambda i: F.struct(  # noqa: E731
        i["name"].alias("品名"),
        i["price"].alias("価格"),
        i["quantity"].alias("数量"),
        i["reduced_tax"].alias("軽減税率"),
    )
    tax = F.when(
        F.col("tax_rate_8").isNotNull() | F.col("tax_rate_10").isNotNull(),
        F.struct(
            F.col("tax_rate_8").alias("8%対象額"),
            F.col("tax_rate_10").alias("10%対象額"),
        ),
    )
    return F.struct(
        F.col("date").alias("日付"),
        F.col("total_amount").alias("合計金額"),
        F.col("store_name").alias("店舗名"),
        F.col("subtotal").alias("小計"),
        F.col("store_phone").alias("店舗電話番号"),
        F.when(F.size("items") > 0, F.transform(F.col("items"), item)).alias("明細"),
        tax.alias("税額詳細"),
        F.col("payment_method").alias("支払方法"),
    )


def _invoice_struct() -> Column:
    item = lambda i: F.struct(  # noqa: E731
        i["name"].alias("品名"),
        i["quantity"].alias("数量"),
        i["unit_price"].alias("単価"),
        i["amount"].alias("金額"),
    )
    bank = F.when(
        F.col("bank_name").isNotNull() | F.col("account_number").isNotNull(),
        F.struct(
            F.col("bank_name").alias("銀行名"),
            F.col("branch_name").alias("支店名"),
            F.col("account_type").alias("口座種別"),
            F.col("account_number").alias("口座番号"),
        ),
    )
    return F.struct(
        F.col("invoice_date").alias("請求日"),
        F.col("due_date").alias("支払期限"),
        F.col("invoice_number").alias("請求書番号"),
        F.col("total_amount").alias("請求金額"),
        F.col("subtotal").alias("税抜金額"),
        F.col("tax_amount").alias("消費税額"),
        F.col("vendor_name").alias("発行元"),
        F.col("customer_name").alias("宛先"),
        bank.alias("振込先"),
        F.when(F.size("items") > 0, F.transform(F.col("items"), item)).alias("明細"),
    )


def assemble_results(extracted: DataFrame) -> DataFrame:
    """extraction rows -> final result rows (url, doc_type, confidence
    scores, receipt_data/invoice_data structs, text, title, warnings)."""
    receipts = extract_receipt_fields_df(
        extracted.filter(F.col("doc_type") == "receipt"), keys=("url",)
    ).select(
        "url", _receipt_struct().alias("receipt_data"),
        F.col("warnings").alias("_rw"),
    )
    invoices = extract_invoice_fields_df(
        extracted.filter(F.col("doc_type") == "invoice"), keys=("url",)
    ).select(
        "url", _invoice_struct().alias("invoice_data"),
        F.col("warnings").alias("_iw"),
    )
    # document-scale join sides: force shuffle joins (see extract_fields)
    joined = (
        extracted.join(receipts.hint("shuffle_hash"), "url", "left")
        .join(invoices.hint("shuffle_hash"), "url", "left")
    )
    return joined.select(
        "url",
        "doc_id",
        "engine",
        (F.col("doc_type") != "unknown").alias("success"),
        "doc_type",
        "receipt_score_centi",
        "invoice_score_centi",
        "receipt_data",
        "invoice_data",
        "text",
        "title",
        # warning cap [:20] (ref tesseract_engine.py:195, pipeline.py:200)
        F.slice(
            F.coalesce(F.col("_rw"), F.col("_iw"), F.array().cast("array<string>")),
            1,
            20,
        ).alias("warnings"),
    )


def to_json_rows(results: DataFrame) -> DataFrame:
    """(url, json) — to_json drops null fields (see module docstring); the
    _debug analog (engine/scores) is excluded by projection, matching the
    reference's debug-section strip (pipeline.py:89-95)."""
    payload = F.struct(
        F.col("success").alias("成功"),
        F.col("doc_type").alias("文書タイプ"),
        F.col("receipt_data").alias("領収書データ"),
        F.col("invoice_data").alias("請求書データ"),
        F.col("text").alias("抽出テキスト"),
        F.col("title").alias("タイトル"),
        F.col("warnings").alias("警告"),
    )
    return results.select("url", F.to_json(payload).alias("json"))


def write_json(results: DataFrame, path: str) -> None:
    """JSON-lines sink (the reference's file output path, main.py:192-223)."""
    to_json_rows(results).write.mode("overwrite").json(path)
