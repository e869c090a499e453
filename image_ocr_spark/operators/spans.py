"""Labeled spans over the canonical extracted text (the north star's
"native Spark SQL expressions emitting labeled spans").

Two implementations with identical output:

- ``label_spans_arrow``: one Arrow-batched pass sharing
  pycore.extractor.label_spans — byte-identical to the oracle by
  construction; character offsets into the canonical text.
- ``label_spans_sql``: pure Spark SQL — regexp_extract_all for the match
  values, offsets recovered with a cumulative ``locate`` fold
  (F.aggregate carrying (search_from, spans)).  Used where the plan must
  stay JVM-only; parity with the Arrow path is asserted in tests.

Span rows: (url, start, end, label, value), ordered by (start, label).
"""

from __future__ import annotations

from typing import Iterator, List

import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pycore.extractor import SPAN_PATTERNS, label_spans

SPAN_ROW_SCHEMA = "url string, start int, end int, label string, value string"

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("start", pa.int32()),
        pa.field("end", pa.int32()),
        pa.field("label", pa.string()),
        pa.field("value", pa.string()),
    ]
)


def _spans_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        urls = batch.column(0).to_pylist()
        texts = batch.column(1).to_pylist()
        c_url: List = []
        c_s: List = []
        c_e: List = []
        c_l: List = []
        c_v: List = []
        for url, text in zip(urls, texts):
            for sp in label_spans(text or ""):
                c_url.append(url)
                c_s.append(sp["start"])
                c_e.append(sp["end"])
                c_l.append(sp["label"])
                c_v.append(sp["value"])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(c_url, pa.string()),
                pa.array(c_s, pa.int32()),
                pa.array(c_e, pa.int32()),
                pa.array(c_l, pa.string()),
                pa.array(c_v, pa.string()),
            ],
            schema=_ARROW_SCHEMA,
        )


def label_spans_arrow(extracted: DataFrame, key: str = "url") -> DataFrame:
    """(key, text) -> span rows via the shared pycore scanner."""
    return extracted.select(F.col(key).alias("url"), "text").mapInArrow(
        _spans_batches, SPAN_ROW_SCHEMA
    )


def _spans_for_pattern(text: Column, label: str, pattern: str) -> Column:
    """array<struct<start,end,label,value>> for one pattern — offsets via a
    cumulative locate fold over regexp_extract_all matches.

    locate is 1-based; searching resumes at the previous match end + 1 so
    repeated identical values land on successive occurrences (matching
    re.finditer's non-overlapping left-to-right scan).
    """
    matches = F.regexp_extract_all(text, F.lit(pattern), 0)
    init = F.struct(
        F.lit(1).alias("from_pos"),
        F.array().cast(
            "array<struct<start:int,end:int,label:string,value:string>>"
        ).alias("spans"),
    )

    def step(acc: Column, m: Column) -> Column:
        pos = F.call_function("locate", m, text, acc["from_pos"])
        span = F.struct(
            (pos - 1).cast("int").alias("start"),
            (pos - 1 + F.length(m)).cast("int").alias("end"),
            F.lit(label).alias("label"),
            m.alias("value"),
        )
        return F.struct(
            (pos + F.length(m)).cast("int").alias("from_pos"),
            F.array_append(acc["spans"], span).alias("spans"),
        )

    return F.aggregate(matches, init, step)["spans"]


def label_spans_sql(extracted: DataFrame, key: str = "url") -> DataFrame:
    """Pure-SQL spans: same rows as label_spans_arrow (asserted in tests)."""
    text = F.col("text")
    all_spans = F.flatten(
        F.array(
            *[_spans_for_pattern(text, label, pat) for label, pat in SPAN_PATTERNS]
        )
    )
    # order by (start, label) like the oracle
    ordered = F.array_sort(
        F.transform(
            all_spans,
            lambda s: F.struct(
                s["start"].alias("start"),
                s["label"].alias("label"),
                s["end"].alias("end"),
                s["value"].alias("value"),
            ),
        )
    )
    rows = extracted.select(
        F.col(key).alias("url"), F.explode(ordered).alias("s")
    )
    return rows.select(
        "url",
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.label").alias("label"),
        F.col("s.value").alias("value"),
    )
