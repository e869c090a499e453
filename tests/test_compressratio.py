"""Compression-ratio quality signal: Spark == pycore byte-exactly (same
CPython zlib at a pinned level), plus the signal's two-sided behavior."""

import pytest
from pyspark.sql import functions as F

from image_ocr_spark.functions.compressratio import (
    compress_stats,
    compression_ratio,
)


def test_signal_is_two_sided():
    import base64
    import hashlib

    sentences = [
        f"Chapter {i}: the {w} wandered past the old mill, counting "
        f"swallows while the ferryman argued about {w2} and the tide."
        for i, (w, w2) in enumerate(
            [("fox", "rope"), ("heron", "salt"), ("miller", "grain"),
             ("clerk", "ink"), ("sailor", "maps"), ("weaver", "dye"),
             ("mason", "lime"), ("smith", "coal"), ("scribe", "wax"),
             ("drover", "hay"), ("cooper", "oak"), ("glazier", "sand")]
        )
    ]
    natural = compress_stats(" ".join(sentences))
    spun = compress_stats("buy cheap buy cheap buy cheap " * 50)
    blob = b"".join(
        hashlib.sha256(bytes([i])).digest() for i in range(48)
    )  # deterministic high-entropy bytes
    noise = compress_stats(base64.b64encode(blob).decode())
    assert spun[2] < natural[2] < noise[2], (spun[2], natural[2], noise[2])
    assert compress_stats("") == (0, 0, 0)
    assert compress_stats(None) == (0, 0, 0)


def test_spark_matches_pycore(spark, documents):
    docs = documents.select("doc_id", "text")
    out = compression_ratio(docs)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {
        r.doc_id: (r.raw_bytes, r.deflate_bytes, r.ratio_milli)
        for r in out.collect()
    }
    want = {r.doc_id: compress_stats(r.text) for r in docs.collect()}
    assert got == want and len(got) == docs.count()
