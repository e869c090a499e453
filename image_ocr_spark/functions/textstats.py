"""Text-analysis columns for training-data pipelines: language-ID heuristic,
quality scoring, token stats — all integer-valued (milli-units) so the
DuckDB oracle matches bit-exactly, all per-row expressions (no shuffle).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword dictionaries for the n-gram/stopword heuristic
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "y", "que", "los"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "ja": ["の", "は", "を", "に", "が"],
}
LANG_ORDER = ["en", "de", "es", "fr", "ja"]  # deterministic tiebreak order

PUNCT_PATTERN = r"[.,!?;:]"

# BPE-ish pre-tokenizer (GPT-2-style, ASCII-explicit so Java regex and
# DuckDB RE2 agree): letter runs | digit runs | non-alnum-non-space runs.
# Counting matches approximates subword token count well enough for
# length-filtering thresholds in a training-data pipeline.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \n]+"


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang` (multiplicity counted)."""
    stops = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stops))).cast("long")


def lang_id_columns(text: Column) -> List[Column]:
    """Per-language stopword hit counts + argmax guess ('und' if all zero).

    Tiebreak: LANG_ORDER priority (earlier wins), exactly reproducible in
    SQL via a scored struct max.
    """
    hits = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    cols = [hits[lang].alias(f"hits_{lang}") for lang in LANG_ORDER]
    # argmax with priority tiebreak: maximize (hits, -priority)
    best = None
    for prio, lang in enumerate(LANG_ORDER):
        cand = F.struct(
            hits[lang].alias("h"), F.lit(-prio).alias("p"), F.lit(lang).alias("lang")
        )
        best = cand if best is None else F.when(
            (cand["h"] > best["h"])
            | ((cand["h"] == best["h"]) & (cand["p"] > best["p"])),
            cand,
        ).otherwise(best)
    guess = F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und"))
    return cols + [guess.alias("lang_guess")]


def repetition_columns(text: Column) -> List[Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 use duplicate
    line / n-gram fractions as quality gates): duplicate-token fraction,
    duplicate-line fraction, and the count of the most frequent token
    2-gram — all integer milli-units, per-row, SQL-expressible.

    The max-2-gram count is the longest equal-adjacent run of the SORTED
    gram array (== max multiplicity), one array_sort + one O(n) aggregate
    fold per row.  (r07: the previous filter-scan-inside-transform form
    was O(distinct * n) AND re-evaluated the whole `grams` construction
    per outer element — the HOF re-evaluation trap — measured 92 s for
    600k docs at 16 cores vs ~2 s for this form, identical outputs.)"""
    toks = tokens(text)
    n_tokens = F.size(toks)
    dup_tok_frac = F.when(
        n_tokens > 0,
        F.floor(
            1000 * (n_tokens - F.size(F.array_distinct(toks))) / n_tokens
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.floor(
            1000 * (n_lines - F.size(F.array_distinct(lines))) / n_lines
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n_tokens - 1))
    grams = F.when(
        n_tokens >= 2,
        F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, 2), " ")
        ),
    ).otherwise(F.array().cast("array<string>"))
    # longest equal-adjacent run over the sorted grams; run==0 marks the
    # fold's first element so no sentinel string can collide with a gram
    def _run_step(acc: Column, g: Column) -> Column:
        run = F.when(
            (acc["run"] > 0) & (g == acc["prev"]), acc["run"] + F.lit(1)
        ).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run.cast("long").alias("run"),
            F.greatest(acc["best"], run.cast("long")).alias("best"),
        )

    max_2gram = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _run_step,
        lambda acc: acc["best"],
    ).cast("long")
    return [
        dup_tok_frac.alias("dup_token_frac_milli"),
        dup_line_frac.alias("dup_line_frac_milli"),
        max_2gram.alias("max_2gram_count"),
    ]


def quality_columns(text: Column) -> List[Column]:
    """Integer quality features + a composite milli-score.

    Features: char length, token count, mean token length (milli), punct
    count, stopword ratio (milli), uppercase-char count.  The composite is a
    simple bounded sum used for filtering thresholds — the point is the
    plumbing (per-row, SQL-expressible), not the specific weights.
    """
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    mean_tok_len_milli = F.when(
        n_tokens > 0,
        (1000 * (n_chars - (n_tokens - 1)) / n_tokens).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    n_punct = F.coalesce(
        F.length(text) - F.length(F.regexp_replace(text, PUNCT_PATTERN, "")),
        F.lit(0),
    )
    stop_hits = stopword_hits(text, "en")
    stop_ratio_milli = F.when(
        n_tokens > 0, (1000 * stop_hits / n_tokens).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    n_upper = F.length(text) - F.length(
        F.regexp_replace(text, "[A-Z]", "")
    )
    # stay integer-exact end to end: stop_ratio_milli is non-negative, so
    # floor(x/10) == the DuckDB oracle's integer '//' — a double division
    # truncated toward zero would diverge when the composite goes negative
    score = (
        F.least(n_tokens.cast("long"), F.lit(400).cast("long"))
        + F.floor(stop_ratio_milli / 10).cast("long")
        - F.least(n_punct.cast("long") * 5, F.lit(200).cast("long"))
    ).cast("long")
    return [
        n_chars.cast("long").alias("n_chars_text"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len_milli.alias("mean_token_len_milli"),
        n_punct.cast("long").alias("n_punct"),
        stop_ratio_milli.alias("stopword_ratio_milli"),
        n_upper.cast("long").alias("n_upper"),
        score.alias("quality_score"),
    ]
