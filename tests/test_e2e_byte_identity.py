"""The correctness gate (north rule): byte-identical extracted text per url,
Spark pipeline vs single-process oracle, over the full fixture corpus."""

from image_ocr_spark.fixtures.gen_pages import (
    build_page,
    expected_text,
    expected_title,
    kind_for,
)
from image_ocr_spark.operators.generate import generate_pages
from image_ocr_spark.plans.pipeline import extract_pages
from image_ocr_spark.pycore.extractor import extract_page


def test_oracle_matches_generator_ground_truth(doc_rows):
    """Single-process oracle == generator's closed-form expectation."""
    for doc_id, text, lang in doc_rows:
        page = build_page(doc_id, text, lang)
        res = extract_page(page["html"])
        assert res["text"] == expected_text(doc_id, text), (doc_id, kind_for(doc_id))
        assert res["title"] == expected_title(doc_id), doc_id
        assert res["text"].encode("utf-8") == expected_text(doc_id, text).encode(
            "utf-8"
        )


def test_spark_pipeline_byte_identical_to_oracle(spark, extracted, doc_rows):
    """Distributed result == oracle result, byte for byte, per url."""
    got = {r.doc_id: r for r in extracted.collect()}
    assert len(got) == len(doc_rows)
    for doc_id, text, lang in doc_rows:
        oracle = extract_page(build_page(doc_id, text, lang)["html"])
        row = got[doc_id]
        assert row.text.encode("utf-8") == oracle["text"].encode("utf-8"), doc_id
        assert row.title == oracle["title"], doc_id
        assert row.doc_type == oracle["doc_type"], doc_id
        assert row.receipt_score_centi == oracle["receipt_score_centi"], doc_id
        assert row.invoice_score_centi == oracle["invoice_score_centi"], doc_id
        assert row.n_nodes == oracle["n_nodes"], doc_id
        assert row.n_content_nodes == oracle["n_content_nodes"], doc_id


def test_expected_doc_types(doc_rows):
    for doc_id, text, lang in doc_rows:
        res = extract_page(build_page(doc_id, text, lang)["html"])
        kind = kind_for(doc_id)
        expected = kind if kind in ("receipt", "invoice") else "unknown"
        assert res["doc_type"] == expected, (doc_id, kind)
