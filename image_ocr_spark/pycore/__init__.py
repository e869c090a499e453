"""Pure-Python semantic core (no Spark imports).

Single source of truth for per-document semantics.  The Spark operators in
``image_ocr_spark.operators`` call these functions inside Arrow-batched
pandas UDFs; the pytest oracle calls them directly in a single process, so
the byte-identity gate holds by construction for the UDF path, while the
native Spark SQL expressions in ``image_ocr_spark.functions`` are verified
against these on golden pairs and the full fixture corpus.
"""
