"""Final assembly + JSON sink (S4/F24): type-dispatched data structs with
the reference's Japanese keys, null-dropping serialization, sink round-trip."""

import json

from pyspark.sql import functions as F

from image_ocr_spark.fixtures.gen_pages import receipt_values, invoice_values, url_for
from image_ocr_spark.plans.results import assemble_results, to_json_rows, write_json


def test_assembled_results_shape(spark, extracted, doc_rows):
    res = assemble_results(extracted)
    rows = {r.url: r for r in res.collect()}
    assert len(rows) == len(doc_rows)
    for doc_id, text, lang in doc_rows:
        row = rows[url_for(doc_id)]
        kind = doc_id % 10
        if kind == 6:
            v = receipt_values(doc_id)
            assert row.success and row.doc_type == "receipt"
            assert row.receipt_data["合計金額"] == v["total"]
            assert row.receipt_data["店舗名"] == f"スーパーABC{v['store_no']}号店"
            assert [i["品名"] for i in row.receipt_data["明細"]] == ["りんご", "牛乳", "パン"]
            assert row.invoice_data is None
        elif kind == 7:
            v = invoice_values(doc_id)
            assert row.success and row.doc_type == "invoice"
            assert row.invoice_data["請求金額"] == v["total"]
            assert row.invoice_data["振込先"]["銀行名"] == "三菱UFJ銀行"
            assert row.receipt_data is None
        else:
            assert not row.success and row.doc_type == "unknown"
            assert row.receipt_data is None and row.invoice_data is None


def test_json_null_dropping(spark, extracted):
    js = {r.url: r.json for r in to_json_rows(assemble_results(extracted)).collect()}
    # a receipt page: mandatory keys present, no null-valued keys anywhere
    receipt_url = next(u for u in js if u.endswith("/p/6"))
    doc = json.loads(js[receipt_url])
    assert doc["成功"] is True and doc["文書タイプ"] == "receipt"
    # since r02 the fixture carries 8%対象/10%対象 lines -> TaxDetails present
    v = receipt_values(6)
    assert doc["領収書データ"]["税額詳細"] == {
        "8%対象額": v["tax8_base"], "10%対象額": v["tax10_base"]
    }
    assert "請求書データ" not in doc  # null -> dropped
    assert doc["領収書データ"]["支払方法"] == "現金"
    # unicode preserved (ensure_ascii=False semantics)
    assert "現金" in js[receipt_url]


def test_json_sink_roundtrip(spark, extracted, tmp_path):
    out = str(tmp_path / "out_json")
    write_json(assemble_results(extracted.limit(40)), out)
    back = spark.read.json(out)
    assert back.count() == 40
    assert set(back.columns) == {"url", "json"}
    parsed = json.loads(back.first().json)
    assert "文書タイプ" in parsed
