"""Deterministic mixture sampling — pretraining data mixing as a
scan-stage filter.

Training corpora are blended from sources at explicit rates (cf. the
weighted dataset mixture of GPT-3 Table 2.2 and The Pile's per-set
epochs).  At 100 TB the sample must be (a) a pure per-row decision — no
shuffle, no global sort, no reservoir state — and (b) DETERMINISTIC, so
a resumed or re-run job selects the identical subset and downstream
dedup/packing stay stable.  Both follow from the hash-threshold rule:

    keep(row)  <=>  md5_32(salt || id) / 2^32  <  rate(group)

The md5-prefix hash is the repo's engine-portable 'random' (bit-identical
in Spark, DuckDB, Python), so mixtures have closed-form oracles; `salt`
decorrelates this sample from every other hash use of the same ids (and
from other mixtures).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash32

HASH_SPACE = 4294967296.0  # 2^32, the md5_32 value space


def sample_mixture(
    docs: DataFrame,
    rates: Dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Rows kept with their group's probability (exactly the docs whose
    per-id uniform falls under rate(group)); groups missing from `rates`
    are dropped (rate 0.0).  Per-row expression, zero shuffle."""
    u = hash32(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ) / F.lit(HASH_SPACE)
    rate = F.lit(0.0)
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return docs.filter(u < rate)


def chunk_documents(
    docs,
    window: int = 256,
    stride: int = 192,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text) —
    sliding token windows with overlap (window - stride tokens), the
    context-window segmentation step between cleaning and packing in a
    pretraining pipeline (token_packing plans whole-doc concatenation;
    this splits docs LONGER than a context).

    Grid: starts at 0, stride, 2*stride, ... up to n - window, plus a
    final RIGHT-ALIGNED window when the grid doesn't land exactly on the
    tail — every token appears in at least one chunk and no start is
    ever duplicated.  Docs with <= window tokens yield exactly one
    chunk.  Pure JVM array expressions in the scan stage (zero Python,
    zero shuffle); DuckDB replays the grid and the slices by value
    (tests/test_dedup_scale.py)."""
    from pyspark.sql import functions as F

    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    base = F.sequence(
        F.lit(0), F.greatest(n - window, F.lit(0)), F.lit(stride)
    )
    starts = (
        F.when(n <= window, F.array(F.lit(0)))
        .when((n - window) % stride == 0, base)
        .otherwise(F.concat(base, F.array(n - window)))
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_token").cast("long").alias("start_token"),
        F.least(F.lit(window), F.col("__n") - F.col("start_token"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice("__toks", F.col("start_token") + 1, F.lit(window)), " "
        ).alias("chunk_text"),
    )
