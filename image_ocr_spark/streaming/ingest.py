"""Structured Streaming ingest of arriving page partitions (SURVEY §2.9
stretch): micro-batch over a growing pages directory, the same extraction
pipeline per batch, exactly-once via the streaming checkpoint + idempotent
parquet append.

The reference is strictly batch; this exists because a crawl table GROWS —
`availableNow` drains everything currently present and stops (catch-up
mode), a plain start keeps tailing.  The per-batch transform is the SAME
``extract_pages`` plan used in batch — one code path, two execution modes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import extract_pages
from ..schemas import PAGE_SCHEMA


def stream_pages(
    spark: SparkSession,
    pages_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.schema(PAGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


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

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        extract_pages(batch_df).write.mode("append").parquet(out_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()
