"""N-gram language-model quality gate — the CCNet-style corpus-frequency
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020) reduced to EXACT INTEGERS so
the DuckDB oracle replays it bit-identically: instead of a KenLM
perplexity (float log-probs — cross-engine libm hazards), a document's
quality signal is its *familiarity*: the fraction of its word bigrams
that appear in the corpus-trained top-V bigram vocabulary, in integer
micro-units.  Low familiarity flags the same tail CCNet's high-perplexity
bucket does (gibberish, boilerplate soup, wrong-language residue) while
keeping the established tri-engine exactness rule.

Scale shape (the 100 TB story):
- training is ONE count shuffle (map-side combined: hot bigrams collapse
  to one row per map partition) followed by a TakeOrdered(V) — no full
  sort, O(V) driver traffic;
- scoring is SHUFFLE-FREE: the vocabulary travels as one Spark broadcast
  (a few MB at V=10^5-10^6) and every row is scored in the scan stage by
  a vectorized Arrow pass — the same ship-the-model-not-the-corpus shape
  as IVF cell assignment (operators/similarity.py).

There is no reference counterpart (the reference has no corpus-level
statistics at all); this is a beyond-reference training-data operator
like dedup/ANN, built from the public CCNet/C4 recipe.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bigrams_col(toks: Column) -> Column:
    """array<string> of adjacent word pairs "a b" from a token array.
    Size max(n-1, 0); [] for empty/single-token docs.  transform's lambda
    index is 0-based and element_at is 1-based, so pair i joins token
    i+1 with token i+2 (the DuckDB twin uses 1-based list lambdas:
    ``x || ' ' || toks[i+1]`` over the same slice)."""
    return F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + F.lit(2))),
    )


def train_bigram_vocab(
    docs: DataFrame,
    vocab_size: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """(gram, cnt) — the `vocab_size` most frequent word bigrams across
    the corpus, ties broken gram-ascending (deterministic, so the DuckDB
    replay selects the identical vocabulary).  Tokens are exact-space
    splits: corpus text is whitespace-collapsed by the extractor, and
    split-on-one-space is the established cross-engine-identical
    tokenization (functions/textstats.py tokens())."""
    toks = F.split(F.col(text_col), " ")
    grams = docs.select(F.explode(bigrams_col(toks)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    # orderBy+limit compiles to TakeOrdered — no full sort of the vocab
    return counts.orderBy(F.desc("cnt"), F.asc("gram")).limit(vocab_size)


def familiarity_scores(
    docs: DataFrame,
    vocab: Optional[list] = None,
    vocab_size: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_known, familiarity_micro) — per-document
    bigram familiarity against the corpus vocabulary, scored in the scan
    stage with zero shuffle (one broadcast of the vocab set).

    familiarity_micro = floor(1e6 * n_known / n_grams), 0 when the doc
    has <2 tokens — exact integers end to end.  ``vocab`` is a list of
    gram strings (pass one to reuse a trained model across corpora);
    when None the vocabulary is trained on ``docs`` itself first.
    """
    import pyarrow as pa

    if vocab is None:
        vocab = [
            r.gram
            for r in train_bigram_vocab(docs, vocab_size, text_col).collect()
        ]
    bc = docs.sparkSession.sparkContext.broadcast(frozenset(vocab))

    def score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        known_set = bc.value
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            n_grams, n_known, fam = [], [], []
            for t in texts:
                toks = (t or "").split(" ")
                n = len(toks) - 1
                if n <= 0:
                    n_grams.append(0)
                    n_known.append(0)
                    fam.append(0)
                    continue
                k = 0
                prev = toks[0]
                for nxt in toks[1:]:
                    if prev + " " + nxt in known_set:
                        k += 1
                    prev = nxt
                n_grams.append(n)
                n_known.append(k)
                fam.append((1_000_000 * k) // n)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(n_grams, pa.int64()),
                    pa.array(n_known, pa.int64()),
                    pa.array(fam, pa.int64()),
                ],
                ["doc_id", "n_grams", "n_known", "familiarity_micro"],
            )

    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("t")
    ).mapInArrow(
        score, "doc_id long, n_grams long, n_known long, familiarity_micro long"
    )


# CCNet's three perplexity buckets, worst to best: the tail is the
# high-perplexity (here: low-familiarity) third that CCNet downsamples
# or drops, the head the most-fluent third it keeps whole.
CCNET_BUCKETS = ("tail", "middle", "head")


def quality_cutoffs(
    scores: DataFrame, n_buckets: int = 3, score_col: str = "familiarity_micro"
) -> list:
    """The n_buckets-1 exact type-1 quantile cutoffs of ``score_col``:
    cutoff_j = min{v : #(score <= v) >= ceil(j*N/n_buckets)}.

    Computed from ONE histogram aggregation whose output is bounded by
    the number of DISTINCT score values (familiarity_micro has at most
    10^6+1) — never by N — then cumulated on the driver.  Value-based
    (no per-row rank), so the result is independent of partitioning and
    replayable in closed form by a DuckDB window; score ties land in one
    bucket together (bucket masses are equal up to tie spill, the
    standard quantile-bucketing contract)."""
    if n_buckets < 2:
        raise ValueError("quality_cutoffs needs n_buckets >= 2")
    hist = sorted(
        (r[0], r[1])
        for r in scores.groupBy(score_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n = sum(c for _, c in hist)
    if n == 0:
        raise ValueError("quality_cutoffs over an empty relation")
    # integer ceil(j*n/n_buckets), exact at any n
    targets = [(j * n + n_buckets - 1) // n_buckets for j in range(1, n_buckets)]
    cutoffs, cum, ti = [], 0, 0
    for v, c in hist:
        cum += c
        while ti < len(targets) and cum >= targets[ti]:
            cutoffs.append(v)
            ti += 1
    return cutoffs


def bucket_label_col(score: Column, cutoffs: list) -> Column:
    """CCNet bucket label for a score given quality_cutoffs(..., 3):
    index = how many cutoffs the score strictly exceeds (0 = tail)."""
    idx = F.lit(0)
    for c in cutoffs:
        idx = idx + (score > F.lit(int(c))).cast("int")
    labels = F.array(*[F.lit(b) for b in CCNET_BUCKETS])
    return F.element_at(labels, idx + F.lit(1))


def quality_mixture(
    docs: DataFrame,
    rates: Optional[dict] = None,
    vocab: Optional[list] = None,
    vocab_size: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "qmix",
) -> DataFrame:
    """The CCNet selection step end to end: score every document's
    familiarity, split the corpus into head/middle/tail thirds at exact
    corpus quantiles, and keep each bucket at its mixture rate via the
    deterministic hash-threshold rule (operators/sampling.py) — the
    fluent third kept whole, the gibberish third decimated.

    Returns (doc_id, familiarity_micro, bucket) for kept rows.  Scale
    shape: scoring is scan-stage (broadcast vocab), the cutoffs cost one
    distinct-value histogram, and the final keep/drop is a pure per-row
    filter — no global sort anywhere, resumable by construction.  The
    corpus is scored twice (once into the histogram, once under the
    filter); at 100 TB pass a pre-trained ``vocab`` and persist the
    scored relation — or accept the second scan, it is cheaper than
    materializing per-doc scores for a 10^12-row corpus.
    """
    from image_ocr_spark.operators.sampling import sample_mixture

    if rates is None:
        rates = {"head": 1.0, "middle": 0.5, "tail": 0.1}
    if not set(rates) <= set(CCNET_BUCKETS):
        raise ValueError(f"rates keys must be among {CCNET_BUCKETS}")
    # vocab=None falls back inside familiarity_scores (single source of
    # truth for the training path); both uses below share ONE scores plan
    scores = familiarity_scores(docs, vocab, vocab_size, id_col, text_col)
    cutoffs = quality_cutoffs(scores, len(CCNET_BUCKETS))
    labeled = scores.select(
        "doc_id",
        "familiarity_micro",
        bucket_label_col(F.col("familiarity_micro"), cutoffs).alias("bucket"),
    )
    return sample_mixture(
        labeled, rates, group_col="bucket", id_col="doc_id", salt=salt
    )
