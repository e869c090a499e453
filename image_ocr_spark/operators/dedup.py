"""Deduplication operators for web-scale corpora (SURVEY extension; the
training-data-pipeline dedup battery: exact, MinHash+LSH, SimHash, n-gram
Jaccard).

Scale design:
- Signatures (minhash vector, simhash fingerprint) are PURE PER-ROW array
  expressions — no shuffle, no UDF, whole pipeline stays JVM-side.  At
  100 TB each doc computes its signature in the scan stage.
- Shuffles happen only where semantically required: LSH band bucketing
  (groupBy band key — bounded fan-in per bucket), candidate-pair
  verification (equi-join on shingle hash), exact dedup (groupBy hash).
- All hash primitives are md5-prefix based so the DuckDB oracle computes
  bit-identical values (xxhash64/murmur differ across engines; md5 doesn't).

Determinism: "random" minhash permutations are fixed affine maps
(A[i]*h + B[i]) mod P with constants derived from small primes — embedded
as literals in both engines.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 32-bit token/shingle hash, identical in Spark and DuckDB:
#   Spark : conv(substring(md5(s), 1, 8), 16, 10)::long
#   DuckDB: ('0x' || substr(md5(s), 1, 8))::bigint
MERSENNE31 = 2147483647  # modulus for affine permutations

# fixed affine permutation constants (first 16 odd primes / offsets)
PERM_A = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59]
PERM_B = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768]

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 4  # 4 bands x 4 rows
DEFAULT_SHINGLE_N = 3
SIMHASH_BITS = 32


def hash32(col: Column) -> Column:
    """Deterministic 32-bit string hash shared with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def shingles_col(text: Column, n: int = DEFAULT_SHINGLE_N) -> Column:
    """Distinct word n-gram shingle strings of a text column (per-row)."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - (n - 1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def shingle_hashes_col(text: Column, n: int = DEFAULT_SHINGLE_N) -> Column:
    return F.transform(shingles_col(text, n), hash32)


def minhash_col(
    text: Column, num_perm: int = DEFAULT_NUM_PERM, n: int = DEFAULT_SHINGLE_N
) -> Column:
    """MinHash signature as array<long> — per-row, shuffle-free."""
    hashes = shingle_hashes_col(text, n)
    sig = [
        F.array_min(
            F.transform(hashes, lambda h: (PERM_A[i] * h + PERM_B[i]) % MERSENNE31)
        )
        for i in range(num_perm)
    ]
    return F.array(*sig)


def simhash_from_hashes(toks_h: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint (bigint) from an array<long> of token hashes —
    per-row, shuffle-free.

    Bit b of the fingerprint is set iff the multiplicity-weighted sum of
    (+1/-1) over token-hash bit b is positive.  The bit loop is unrolled in
    Python (shift amounts must be literals); pass a *materialized column*
    of token hashes, not an inline expression — it is referenced `bits`
    times.
    """
    zero = F.lit(0).cast("long")

    def vote_fn(b: int):
        return lambda s, h: s + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    total = zero
    for b in range(bits):
        vote = F.aggregate(toks_h, zero, vote_fn(b))
        total = total + F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(zero)
    return total


def with_simhash(df: DataFrame, text_col: str = "text",
                 out_col: str = "fp", bits: int = SIMHASH_BITS) -> DataFrame:
    """Append a SimHash fingerprint column (token hashes materialized once)."""
    toks_h = F.transform(tokens_col(F.coalesce(F.col(text_col), F.lit(""))), hash32)
    return (
        df.withColumn("_toks_h", toks_h)
        .withColumn(out_col, simhash_from_hashes(F.col("_toks_h"), bits))
        .drop("_toks_h")
    )


def with_variants(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  offset: int = 1_000_000) -> DataFrame:
    """Deterministic near-duplicate injection: every doc gets one mutated
    copy (first token replaced) under id + offset.  Used by the dedup
    correctness queries so candidate pairs provably exist; the DuckDB oracle
    constructs the identical corpus."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    mutant = docs.select(
        (F.col(id_col) + offset).alias(id_col),
        F.regexp_replace(t, "^[^ ]+", "zzvariant").alias(text_col),
    )
    return docs.select(id_col, t.alias(text_col)).unionByName(mutant)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    sig -> split into `bands` bands of rows=num_perm/bands -> band bucket key
    -> equi-join within (band, key) -> distinct (a < b) pairs.  The join is a
    shuffle on the band key; bucket sizes are bounded by similarity structure
    (AQE skew-split covers pathological buckets).
    """
    rows = num_perm // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_col(F.coalesce(F.col(text_col), F.lit("")), num_perm).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ),
                    "_",
                ),
            )
        ).alias("band", "key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    threshold_milli: int = 500,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing >=1 shingle.

    |A ∩ B| via equi-join on shingle hash; |A ∪ B| = |A| + |B| - |∩|;
    output jaccard in exact integer milli-units.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingle_hashes_col(F.coalesce(F.col(text_col), F.lit("")), n).alias("hs"),
    ).withColumn("n_sh", F.size("hs"))
    exploded = sh.select("id", "n_sh", F.explode("hs").alias("h"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (F.lit(1000) * F.col("inter")) / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select(
            "id_a", "id_b", jac.cast("long").alias("jaccard_milli")
        ).filter(F.col("jaccard_milli") >= threshold_milli)
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of `chunks`
    fingerprint chunks (pigeonhole: hamming <= chunks-1 guarantees a shared
    chunk), verified by exact popcount distance."""
    bits_per = SIMHASH_BITS // chunks
    fp = with_simhash(
        docs.select(F.col(id_col).alias("id"), F.col(text_col)), text_col
    ).select("id", "fp")
    chunk_arr = F.array(
        *[
            F.shiftright(F.col("fp"), c * bits_per).bitwiseAND(
                F.lit((1 << bits_per) - 1)
            )
            for c in range(chunks)
        ]
    )
    chunked = fp.select(
        "id", "fp", F.posexplode(chunk_arr).alias("chunk", "ckey")
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
