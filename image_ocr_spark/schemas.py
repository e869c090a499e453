"""Public schemas of the engine (the Spark IR, mirroring SURVEY.md §1).

NODE_SCHEMA mirrors the reference's OCRWord/OCRBlock rows
(`engines/base.py:63-92`): one row per block-level text run, with the
integer stats the content classifier consumes.
"""

from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# page + doc_id/kind carried through for fixture lineage
GEN_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.LongType(), False),  # unix secs; cast later
        T.StructField("html", T.BinaryType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
    ]
)

NODE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("engine", T.StringType(), False),  # html | pdf
        T.StructField("node_id", T.IntegerType(), False),
        T.StructField("tag_class", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
        T.StructField("n_link_chars", T.IntegerType(), False),
        T.StructField("n_words", T.IntegerType(), False),
    ]
)

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
            T.StructField("label", T.StringType(), False),
            T.StructField("value", T.StringType(), False),
        ]
    )
)
