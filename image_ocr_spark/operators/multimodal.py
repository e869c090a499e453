"""Multimodal columns: opaque binary payloads + typed metadata + feature
extraction via Arrow-batched UDFs.

The Spark-side plumbing is real and tested: schema, batching, partitioning,
per-row metadata, deterministic feature vectors.  The actual image/audio
DECODE is stubbed — the sandbox ships no PIL/cv2/ffmpeg — behind an
import-try: with a decoder present `decode_image` would return (w, h,
pixels); without one it raises NotImplementedError, and the feature path
uses a clearly-marked deterministic byte-level fake (histogram features)
so the distributed plumbing is exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator, List

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature_micro", T.ArrayType(T.LongType(), False), False),
    ]
)


def decode_image(raw: bytes):
    """Real decode — requires an image library the container doesn't ship."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in sandbox
        raise NotImplementedError(
            "image decode needs PIL/cv2; sandbox has none — use "
            "byte_histogram_features (deterministic fake) instead"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(raw))
    return img.width, img.height, img.tobytes()


def byte_histogram_features(raw: bytes, dim: int = FEATURE_DIM) -> List[int]:
    """DETERMINISTIC FAKE feature: byte histogram over `dim` equal-width
    byte-value bins, normalized to integer micro-units (floor(1e6*c/total))
    so the value is bit-identical across Python, Spark, and the DuckDB
    oracle — no float rounding-mode hazards.  Stands in for a
    decoder+embedder; the Spark plumbing around it (Arrow batches, schema,
    partitioning) is real.
    """
    counts = [0] * dim
    for byte in raw:
        counts[byte * dim // 256] += 1
    total = max(1, len(raw))
    return [(1_000_000 * c) // total for c in counts]


def _featurize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    schema = pa.schema(
        [
            pa.field("media_id", pa.int64()),
            pa.field("media_type", pa.string()),
            pa.field("n_bytes", pa.int32()),
            pa.field("feature_micro", pa.list_(pa.int64())),
        ]
    )
    for batch in batches:
        ids = batch.column(0).to_pylist()
        kinds = batch.column(1).to_pylist()
        blobs = batch.column(2).to_pylist()
        feats = [byte_histogram_features(b or b"") for b in blobs]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(kinds, pa.string()),
                pa.array([len(b or b"") for b in blobs], pa.int32()),
                pa.array(feats, pa.list_(pa.int64())),
            ],
            schema=schema,
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item feature rows via one Arrow boundary."""
    return media.select("media_id", "media_type", "content").mapInArrow(
        _featurize, FEATURE_SCHEMA
    )


def synth_media(docs: DataFrame, bytes_per_item: int = 256) -> DataFrame:
    """Deterministic fake media table from doc ids (no external data):
    content bytes are a pure function of media_id."""
    pattern = F.sha2(F.concat(F.lit("media"), F.col("doc_id").cast("string")), 256)
    blob = F.repeat(pattern, bytes_per_item // 64 + 1).substr(1, bytes_per_item)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(blob, "utf-8").alias("content"),
        F.lit(640).alias("meta_width"),
        F.lit(480).alias("meta_height"),
    )
