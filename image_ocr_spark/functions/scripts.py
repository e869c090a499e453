"""Unicode-script histograms — the multilingual bucketing signal.

Common-Crawl-scale curation buckets documents by writing system before
any per-language processing (a CJK page through a Latin-trained quality
model scores garbage), and mixed-script runs flag spam/obfuscation
(Cyrillic lookalikes inside Latin words).  Complements lang_id (n-gram
heuristic): scripts are exact codepoint facts, languages are guesses.

Tri-engine exactness: ranges are EXPLICIT codepoint intervals (not
\\p{Script=...} property classes, whose names and Unicode versions
differ between Java regex, RE2 and Python), counted with regexp_count /
len(regexp_extract_all) — both engines count code points, so emoji and
astral CJK extensions behave identically (the BPE astral lesson).  All
outputs are integer counts plus an integer milli share.

Per-row scan-stage expressions; zero shuffle, zero Python.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, functions as F

# (name, [(lo, hi), ...]) — explicit codepoint intervals, spelled as
# NUMBERS so no literal-glyph typo can shift a boundary.  The list covers
# the scripts that dominate web text; everything else (symbols,
# punctuation, digits, unlisted scripts) is deliberately uncounted and
# shows up as the gap between n_chars and the sum of script counts.
SCRIPT_BLOCKS: List[Tuple[str, List[Tuple[int, int]]]] = [
    ("latin", [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)]),
    ("cyrillic", [(0x400, 0x4FF)]),
    ("greek", [(0x370, 0x3FF)]),
    ("arabic", [(0x600, 0x6FF), (0x750, 0x77F)]),
    ("hebrew", [(0x590, 0x5FF)]),
    ("devanagari", [(0x900, 0x97F)]),
    ("han", [(0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF)]),
    ("hiragana", [(0x3040, 0x309F)]),
    ("katakana", [(0x30A0, 0x30FF)]),
    ("hangul", [(0xAC00, 0xD7AF), (0x1100, 0x11FF)]),
    ("thai", [(0xE00, 0xE7F)]),
]


def _cls(blocks: List[Tuple[int, int]]) -> str:
    """A regex character class from codepoint intervals — built with
    chr(), identically consumable by Java regex and RE2."""
    return "[" + "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in blocks) + "]"


SCRIPT_RANGES: List[Tuple[str, str]] = [
    (name, _cls(blocks)) for name, blocks in SCRIPT_BLOCKS
]


def script_columns(text: Column) -> List[Column]:
    """n_chars, one count per script, dominant script name, and the
    dominant script's integer milli share of counted chars ('' / 0 for
    empty or all-uncounted text).  Dominance ties break by list order
    (deterministic; both engines see the same order)."""
    t = F.coalesce(text, F.lit(""))
    counts = [
        F.regexp_count(t, F.lit(cls)).cast("long").alias(f"n_{name}")
        for name, cls in SCRIPT_RANGES
    ]
    pairs = F.array(
        *[
            F.struct(
                F.regexp_count(t, F.lit(cls)).cast("long").alias("c"),
                F.lit(len(SCRIPT_RANGES) - i).alias("o"),  # earlier wins ties
                F.lit(name).alias("s"),
            )
            for i, (name, cls) in enumerate(SCRIPT_RANGES)
        ]
    )
    best = F.array_max(pairs)
    total = F.aggregate(
        pairs, F.lit(0).cast("long"), lambda acc, p: acc + p["c"]
    )
    dominant = F.when(best["c"] > 0, best["s"]).otherwise(F.lit(""))
    share = F.when(
        total > 0, (best["c"] * 1000) / total
    ).otherwise(F.lit(0)).cast("long")
    return [
        F.length(t).cast("long").alias("n_chars"),
        *counts,
        dominant.alias("dominant_script"),
        share.alias("dominant_share_milli"),
    ]
