"""Structured Streaming ingest of arriving page partitions (SURVEY §2.9
stretch): micro-batch over a growing pages directory, the same extraction
pipeline per batch, exactly-once OUTPUT via the streaming checkpoint plus an
idempotent per-batch sink.

The reference is strictly batch; this exists because a crawl table GROWS —
`availableNow` drains everything currently present and stops (catch-up
mode), a plain start keeps tailing.  The per-batch transform is the SAME
``extract_pages`` plan used in batch — one code path, two execution modes.

Exactly-once argument (VERDICT r01 item 9 / ADVICE): foreachBatch alone is
at-least-once — a crash between the sink write and the checkpoint commit
replays the batch.  The sink therefore partitions output by ``_batch_id``
and writes with DYNAMIC partition overwrite: a replayed batch rewrites only
its own partition, so duplicates cannot survive a replay.  (Replays reuse
the same batch_id — that is the Structured Streaming contract.)

SCHEMA NOTE (ADVICE r02): the idempotency partition column means the
streaming output carries one extra column (``_batch_id``) over the batch
``extract_pages`` output.  Schema-sensitive consumers must read through
``read_extracted`` below, which drops it and returns the batch shape.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract_pages
from ..schemas import PAGE_SCHEMA

BATCH_COL = "_batch_id"


def stream_pages(
    spark: SparkSession,
    pages_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.schema(PAGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


def make_batch_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: idempotent on batch replay (same batch_id ->
    dynamic overwrite of the same _batch_id partition, never an append)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # per-write option, NOT a session conf mutation: a session-level
        # switch to dynamic mode would silently change the semantics of
        # every later static partitioned overwrite in the same session
        (
            extract_pages(batch_df)
            .withColumn(BATCH_COL, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(out_dir)
        )

    return process


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Streaming-ingest output in the BATCH extract_pages shape: the
    ``_batch_id`` idempotency partition column is an implementation detail
    of the sink and is dropped here."""
    return spark.read.parquet(out_dir).drop(BATCH_COL)


def run_ingest(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drain (or tail) pages_dir through the extraction pipeline into
    parquet.  foreachBatch keeps the mapInArrow tokenizer + windowless
    rollup identical to the batch plan."""
    stream = stream_pages(spark, pages_dir)
    writer = stream.writeStream.foreachBatch(make_batch_writer(out_dir)).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()


# ---------------------------------------------------------------------------
# WARC-segment streaming (the SURVEY §7 stretch, closed r05): the crawl's
# rawest arriving unit is a `.warc.gz` segment, not a pages partition.
# ---------------------------------------------------------------------------
WARC_CHUNK_SCHEMA = "chunk binary, n_records long"


def stream_warc_chunks(
    spark: SparkSession,
    chunks_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Micro-batch over a growing directory of WARC chunk rows -> page
    records `(url, warc_ts timestamp, content_type, payload)`.

    The per-batch transform is the SAME scan-stage mapInArrow parser the
    batch path uses (operators/warcsource.read_warc — one code path, two
    execution modes, the stream_pages discipline), so a record parses
    byte-identically whether the segment arrived in a backfill or a tail.
    ``warc_ts`` is cast to timestamp here because the streaming consumers
    watermark on it (windowed counts, stateful dedup) — late/replayed
    segments carry their original capture times, which is exactly what a
    capture-time watermark needs.
    """
    from ..operators.warcsource import read_warc

    reader = spark.readStream.schema(WARC_CHUNK_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    records = read_warc(reader.parquet(chunks_dir))
    return records.withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
