"""The flagship extraction pipeline (SURVEY.md §3.4 lifecycle).

    pages --salted repartition--> tokenize (mapInPandas, one Arrow boundary)
          --> content selection + rollup (window + single hash agg)
          --> classify (native SQL keyword scoring)
          --> per-url result row (left join back so empty pages survive)

Scale design:
- `salt_repartition` spreads a hot host's pages across partitions by
  xxhash64(url) BEFORE the Python stage (north rule: host-skew defusal).
- Downstream grouping keys by url — the same key — so AQE/Catalyst keep the
  exchange count at one for the rollup.
- The fat `html` column is pruned immediately after tokenize; nothing
  downstream reads raw bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.classify import classify_df
from ..operators.blocks import extract_text_packed
from ..operators.tokenize import tokenize_packed


def salt_repartition(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Spread url-space uniformly (defuses host-level skew in crawl order).

    xxhash64(url) is uniform regardless of host distribution; at cluster
    scale pass an explicit num_partitions sized to executors*cores*2-3.
    """
    key = F.xxhash64("url")
    if num_partitions:
        return pages.repartition(num_partitions, key)
    return pages.repartition(key)


def extract_pages(
    pages: DataFrame,
    num_partitions: int | None = None,
    engine: str = "auto",
    salt: bool = True,
    rollup: str = "sql",
) -> DataFrame:
    """pages(url, html[, doc_id]) -> one extraction row per url.

    Output: url, doc_id, engine, text, title, n_nodes, n_content_nodes,
    doc_type, receipt_score_centi, invoice_score_centi.
    Pages yielding zero nodes (empty/broken) come back with text='' —
    never-raise semantics (ref pipeline.py:251-271).

    ``engine`` is the pipeline-level strategy switch (ref set_engine,
    pipeline.py:120-146): 'auto' picks per row by magic bytes, a named
    engine forces it with per-row registry fallback.  ``salt=False``
    bypasses the skew-defusing repartition — ONLY for the bench's
    skew-evidence mode; production always salts.
    """
    if salt:
        pages = salt_repartition(pages, num_partitions)
    if rollup == "fused":
        # tokenize + content selection + classify in ONE Python pass
        # (pycore rollup, byte-identical to the SQL form by parity tests);
        # the node stream never crosses the Arrow boundary
        from ..operators.tokenize import extract_fused

        return extract_fused(pages, engine=engine)
    packed = tokenize_packed(pages, engine=engine)  # one row per doc
    per_url = extract_text_packed(packed)  # per-row exprs, NO shuffle
    return classify_df(per_url, "text")
