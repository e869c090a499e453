"""Distributed BPE vocabulary learning (tokenizer training over a corpus).

Spark twin of pycore/bpe.py (the parity-tested single source of truth).
The reference repo tokenizes with fixed engines (tokenizer_manager.py);
training the subword vocabulary itself is the upstream step every LLM
data pipeline runs over exactly this kind of corpus, so it joins the
training-data battery as a first-class operator.

Scale shape (the part that matters at 100 TB):

- ONE corpus-sized shuffle total: the whitespace word count.  Map-side
  combine collapses hot words per partition, and Zipf bounds the distinct
  table (~10^8-10^9 rows for a web corpus) regardless of corpus bytes.
  This is the same working-set reduction SentencePiece/HF trainers use.
- Each merge round is an aggregation over the vocab-sized table (pairs
  built by array-level slice+zip, NOT per-element lambdas over a derived
  array — those re-evaluate the array per element) followed by a
  TakeOrdered(1) — one row to the driver per round, the same control
  plane as kmeans centroid pulls.
- The rewrite is a per-row literal ``F.replace`` — no shuffle, no UDF.
  The plan grows by one replace node per round (linear, unlike the
  3^rounds self-join growth dedup_components had to checkpoint away);
  the persisted base is released in ``finally``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("merge_round", T.IntegerType(), False),
        T.StructField("sym_left", T.StringType(), False),
        T.StructField("sym_right", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


def bpe_merges(
    docs: DataFrame, rounds: int = 8, text_col: str = "text"
) -> DataFrame:
    """The learned merge table: ``rounds`` rows of (merge_round, sym_left,
    sym_right, merged, pair_count), most-frequent-pair-first by round.
    Ties break (count DESC, left ASC, right ASC) — identical to
    pycore.bpe.learn_bpe and the DuckDB oracle's ORDER BY ... LIMIT 1."""
    spark = docs.sparkSession
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = docs.select(
        F.explode(F.split(t, "[ \n\t\r]+")).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    # " a  b  c ": two-space joiner + one-space pad; see pycore/bpe.py for
    # why this makes merge == literal replace in all three engines.
    rep = F.concat(
        F.lit(" "), F.rtrim(F.regexp_replace("w", "(.)", "$1  ")), F.lit(" ")
    )
    base = wc.select(rep.alias("rep"), "cnt").persist()
    merges: list = []
    try:
        cur = base
        for rnd in range(1, rounds + 1):
            syms = cur.select(
                F.split(F.trim(F.col("rep")), "  ").alias("s"), "cnt"
            )
            npairs = F.greatest(F.size("s") - 1, F.lit(0))
            z = F.arrays_zip(
                F.slice("s", 1, npairs).alias("l"),
                F.slice("s", 2, npairs).alias("r"),
            )
            best = (
                syms.select(F.explode(z).alias("p"), "cnt")
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.col("c").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:
                break
            l, r, c = best[0].l, best[0].r, int(best[0].c)
            merges.append((rnd, l, r, l + r, c))
            cur = cur.select(
                F.replace(
                    F.col("rep"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
                ).alias("rep"),
                "cnt",
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_encode(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table: (id, n_words, n_subwords, subwords) —
    the tokenize-with-trained-vocab step.  Pure scan-stage column
    expressions, ZERO shuffle: the R merges arrive as literal replace
    chains (R is vocab-budget-sized, the same control-plane scale as the
    learning loop's driver pulls), each word is rebuilt once per merge
    (no derived-array-per-element re-evaluation), and word order is
    preserved through the flatten.  Parity twin: pycore.bpe.encode_text
    (tests/test_bpe.py)."""

    def subwords_of(w):
        rep = F.concat(
            F.lit(" "), F.rtrim(F.regexp_replace(w, "(.)", "$1  ")), F.lit(" ")
        )
        for _, l, r, _, _ in merges:
            rep = F.replace(rep, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
        return F.split(F.trim(rep), "  ")

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, "[ \n\t\r]+"), lambda w: w != "")
    subs = F.flatten(F.transform(words, subwords_of))
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.size(subs).cast("long").alias("n_subwords"),
        subs.alias("subwords"),
    )


def bpe_merges_local(
    docs: DataFrame, rounds: int = 8, text_col: str = "text",
    max_vocab_rows: int = 50_000_000,
) -> DataFrame:
    """Same merge table as ``bpe_merges``, hybrid execution: Spark does
    the corpus-sized reduction (the ONE shuffle that touches 100 TB),
    then the merge loop runs driver-side over the Zipf-bounded
    word-count table via pycore.learn_bpe — one round-trip instead of
    one Spark job per merge.  This is how industrial trainers
    (SentencePiece, HF tokenizers) actually run at a 30k-100k merge
    budget: the distinct-word table of even a web-scale corpus is
    ~10^8-10^9 rows (GBs, not TBs), so the loop is a driver/single-node
    problem once the corpus has been reduced.  ``max_vocab_rows`` guards
    the pull: above it, fall back to ``bpe_merges`` (fully distributed,
    viable for small round budgets) or raise — never collect unbounded.
    Parity: identical output to bpe_merges and the DuckDB oracle
    (tests/test_bpe.py)."""
    from ..pycore.bpe import learn_bpe

    spark = docs.sparkSession
    t = F.coalesce(F.col(text_col), F.lit(""))
    wc_df = (
        docs.select(F.explode(F.split(t, "[ \n\t\r]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = wc_df.count()
    if n > max_vocab_rows:
        raise ValueError(
            f"word-count table has {n} rows > max_vocab_rows="
            f"{max_vocab_rows}; raise the cap or use bpe_merges"
        )
    wc = {r.w: int(r.cnt) for r in wc_df.collect()}
    return spark.createDataFrame(learn_bpe(wc, rounds), MERGE_SCHEMA)
