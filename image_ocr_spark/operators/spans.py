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
    """(key, text) -> span rows via the shared pycore scanner.

    THE 100 TB PATH: one linear re.finditer scan per document.  The SQL
    twin below exists so the driver row stays JVM/oracle-expressible, but
    its offset recovery is an interpreted `aggregate` fold calling
    `locate` per match (CodegenFallback) — O(matches x text) on
    match-dense documents.  Compose pipelines with THIS function."""
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


# ---------------------------------------------------------------------------
# PDF layout spans (r06) — geometric coordinates, the reference's
# bounding-box world.  The reference's span predicates
# (get_text_right_of / get_text_below, span_utils.py) operate on OCR
# bounding boxes; the HTML graft approximates them with token positions
# (entry:span_neighbors).  For the PDF branch the coordinates are REAL:
# pycore.pdftok.pdf_spans tracks Tm/Td/TD/T*/TL line origins, so the
# same nearest-neighbor predicates run on page geometry.
# ---------------------------------------------------------------------------

PDF_SPAN_SCHEMA = (
    "url string, span_id int, page int, text string, x_milli long,"
    " y_milli long, size_milli long"
)

_PDF_SPAN_ARROW = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("span_id", pa.int32()),
        pa.field("page", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("x_milli", pa.int64()),
        pa.field("y_milli", pa.int64()),
        pa.field("size_milli", pa.int64()),
    ]
)


def pdf_layout_spans(
    pages: DataFrame, url_col: str = "url", pdf_col: str = "html"
) -> DataFrame:
    """(url, span_id, page, text, x_milli, y_milli, size_milli) — one
    row per positioned text span of each PDF payload, stream-sequence
    span_id, content-stream index as page (geometry is only comparable
    WITHIN a page).
    One scan-stage Arrow pass (the tokenizer discipline: only the two
    needed columns cross the boundary, zero shuffle); non-PDF or
    unparseable payloads yield no rows (never-raise policy)."""
    from ..pycore.pdftok import is_pdf, pdf_spans

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            raws = batch.column(1).to_pylist()
            cols = {name: [] for name in _PDF_SPAN_ARROW.names}
            for url, raw in zip(urls, raws):
                raw = raw or b""
                if not is_pdf(raw):
                    continue
                for sp in pdf_spans(raw):
                    cols["url"].append(url)
                    cols["span_id"].append(sp["seq"])
                    cols["page"].append(sp["page"])
                    cols["text"].append(sp["text"])
                    cols["x_milli"].append(sp["x_milli"])
                    cols["y_milli"].append(sp["y_milli"])
                    cols["size_milli"].append(sp["size_milli"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[f.name], f.type)
                    for f in _PDF_SPAN_ARROW
                ],
                schema=_PDF_SPAN_ARROW,
            )

    return pages.select(
        F.col(url_col).alias("url"), F.col(pdf_col).alias("html")
    ).mapInArrow(run, PDF_SPAN_SCHEMA)


def span_right_of_geo(
    spans: DataFrame, keyword: str, y_tol_milli: int = 3000
) -> DataFrame:
    """(url, keyword_text, value): for each span containing ``keyword``,
    the NEAREST span strictly to its right on the same visual line of the SAME page
    (|dy| <= y_tol_milli, x greater) — the reference's
    get_text_right_of on real coordinates.  One equi-join on url + a
    min_by over dx; deterministic tiebreak by (dx, span_id).  DuckDB
    replays the join by value (tests/test_pdflayout.py)."""
    kw = spans.filter(F.col("text").contains(keyword)).select(
        "url",
        "page",
        F.col("span_id").alias("kw_id"),
        F.col("text").alias("keyword_text"),
        F.col("x_milli").alias("kx"),
        F.col("y_milli").alias("ky"),
    )
    cand = spans.select(
        "url", "page", "span_id", F.col("text").alias("value"),
        "x_milli", "y_milli",
    )
    j = kw.join(cand, ["url", "page"]).filter(
        (F.col("span_id") != F.col("kw_id"))
        & (F.abs(F.col("y_milli") - F.col("ky")) <= y_tol_milli)
        & (F.col("x_milli") > F.col("kx"))
    )
    return j.groupBy("url", "kw_id", "keyword_text").agg(
        F.min_by(
            "value",
            F.struct(
                (F.col("x_milli") - F.col("kx")).alias("dx"),
                F.col("span_id").alias("sid"),
            ),
        ).alias("value")
    ).drop("kw_id")


def span_below_geo(
    spans: DataFrame, keyword: str, x_tol_milli: int = 50_000
) -> DataFrame:
    """(url, keyword_text, value): for each span containing ``keyword``,
    the nearest span BELOW it on the SAME page (smaller y) whose x is within
    ``x_tol_milli`` of the keyword's — get_text_below on real
    coordinates; nearest by (dy, |dx|, span_id)."""
    kw = spans.filter(F.col("text").contains(keyword)).select(
        "url",
        "page",
        F.col("span_id").alias("kw_id"),
        F.col("text").alias("keyword_text"),
        F.col("x_milli").alias("kx"),
        F.col("y_milli").alias("ky"),
    )
    cand = spans.select(
        "url", "page", "span_id", F.col("text").alias("value"),
        "x_milli", "y_milli",
    )
    j = kw.join(cand, ["url", "page"]).filter(
        (F.col("span_id") != F.col("kw_id"))
        & (F.col("y_milli") < F.col("ky"))
        & (F.abs(F.col("x_milli") - F.col("kx")) <= x_tol_milli)
    )
    return j.groupBy("url", "kw_id", "keyword_text").agg(
        F.min_by(
            "value",
            F.struct(
                (F.col("ky") - F.col("y_milli")).alias("dy"),
                F.abs(F.col("x_milli") - F.col("kx")).alias("adx"),
                F.col("span_id").alias("sid"),
            ),
        ).alias("value")
    ).drop("kw_id")


PDF_TABLE_SCHEMA = (
    "url string, page int, row int, col int, x_milli long, y_milli long,"
    " text string"
)

_PDF_TABLE_ARROW = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("page", pa.int32()),
        pa.field("row", pa.int32()),
        pa.field("col", pa.int32()),
        pa.field("x_milli", pa.int64()),
        pa.field("y_milli", pa.int64()),
        pa.field("text", pa.string()),
    ]
)


def pdf_table_cells(
    pages: DataFrame,
    url_col: str = "url",
    pdf_col: str = "html",
    y_tol_milli: int = 3000,
    min_rows: int = 3,
) -> DataFrame:
    """(url, page, row, col, x_milli, y_milli, text) — column-aligned
    table cells per PDF payload (pycore.pdftok.detect_tables, the
    PP-Structure analog).  Same scan-stage Arrow shape as
    pdf_layout_spans; non-PDF / table-free payloads yield no rows."""
    from ..pycore.pdftok import detect_tables, is_pdf, pdf_spans

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column(0).to_pylist()
            raws = batch.column(1).to_pylist()
            cols = {name: [] for name in _PDF_TABLE_ARROW.names}
            for url, raw in zip(urls, raws):
                raw = raw or b""
                if not is_pdf(raw):
                    continue
                for c in detect_tables(pdf_spans(raw), y_tol_milli, min_rows):
                    cols["url"].append(url)
                    for k in ("page", "row", "col", "x_milli", "y_milli", "text"):
                        cols[k].append(c[k])
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], f.type) for f in _PDF_TABLE_ARROW],
                schema=_PDF_TABLE_ARROW,
            )

    return pages.select(
        F.col(url_col).alias("url"), F.col(pdf_col).alias("html")
    ).mapInArrow(run, PDF_TABLE_SCHEMA)
