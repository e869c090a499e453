import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from image_ocr_spark.session import get_spark

    spark = get_spark("local[4]", app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def extracted(spark, documents):
    """Shared flagship-extraction result over the fixture corpus (persisted)."""
    from image_ocr_spark.operators.generate import generate_pages
    from image_ocr_spark.plans.pipeline import extract_pages

    df = extract_pages(generate_pages(documents)).persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def doc_rows():
    """(doc_id, text, lang) rows straight from parquet via duckdb (no Spark)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"select doc_id, text, lang from read_parquet('{SF_DIR}/documents.parquet')"
        " order by doc_id"
    ).fetchall()
    con.close()
    return [(d, t or "", lang) for d, t, lang in rows]
