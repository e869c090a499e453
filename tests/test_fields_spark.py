"""Spark field extraction (explode+agg SQL) must agree with pycore exactly
across the full fixture corpus — including items, vendor/customer, warnings."""

from pyspark.sql import functions as F

from image_ocr_spark.fixtures.gen_pages import build_page
from image_ocr_spark.functions.extract_fields import (
    extract_invoice_fields_df,
    extract_receipt_fields_df,
)
from image_ocr_spark.operators.generate import generate_pages
from image_ocr_spark.plans.pipeline import extract_pages
from image_ocr_spark.pycore.extractor import extract_page

RECEIPT_SCALARS = [
    "date", "date_raw", "total_amount", "subtotal", "store_name",
    "store_phone", "payment_method", "tax_rate_8", "tax_rate_10",
]
INVOICE_SCALARS = [
    "invoice_number", "invoice_date", "due_date", "total_amount", "subtotal",
    "tax_amount", "bank_name", "branch_name", "account_type",
    "account_number", "vendor_name", "customer_name",
]


def test_receipt_fields_match_pycore(spark, extracted, doc_rows):
    receipts = extracted.filter(F.col("doc_type") == "receipt")
    got = {
        r.doc_id: r
        for r in extract_receipt_fields_df(receipts, keys=("url", "doc_id")).collect()
    }
    checked = 0
    for doc_id, text, lang in doc_rows:
        if doc_id % 10 != 6:
            continue
        oracle = extract_page(build_page(doc_id, text, lang)["html"])["fields"]
        row = got[doc_id]
        for k in RECEIPT_SCALARS:
            assert getattr(row, k) == oracle[k], (doc_id, k)
        s_items = [(i.name, i.price, i.quantity, i.reduced_tax) for i in row.items]
        o_items = [
            (i["name"], i["price"], i["quantity"], i["reduced_tax"])
            for i in oracle["items"]
        ]
        assert s_items == o_items, doc_id
        assert list(row.warnings) == oracle["warnings"], doc_id
        checked += 1
    assert checked > 0


def test_invoice_fields_match_pycore(spark, extracted, doc_rows):
    invoices = extracted.filter(F.col("doc_type") == "invoice")
    got = {
        r.doc_id: r
        for r in extract_invoice_fields_df(invoices, keys=("url", "doc_id")).collect()
    }
    checked = 0
    for doc_id, text, lang in doc_rows:
        if doc_id % 10 != 7:
            continue
        oracle = extract_page(build_page(doc_id, text, lang)["html"])["fields"]
        row = got[doc_id]
        for k in INVOICE_SCALARS:
            assert getattr(row, k) == oracle[k], (doc_id, k)
        s_items = [
            (i.name, i.quantity, i.unit_price, i.amount) for i in row.items
        ]
        o_items = [
            (i["name"], i["quantity"], i["unit_price"], i["amount"])
            for i in oracle["items"]
        ]
        assert s_items == o_items, doc_id
        assert list(row.warnings) == oracle["warnings"], doc_id
        checked += 1
    assert checked > 0


def test_warnings_on_sparse_text(spark):
    """Missing fields produce the reference's warning strings."""
    df = spark.createDataFrame(
        [("u1", "領収書だけの内容です 合計 ¥100")], "url string, text string"
    )
    row = extract_receipt_fields_df(df).first()
    assert "日付を抽出できませんでした" in list(row.warnings)
    assert "店舗名を抽出できませんでした" not in list(row.warnings) or row.store_name is None