"""Deduplication operators for web-scale corpora (SURVEY extension; the
training-data-pipeline dedup battery: exact, MinHash+LSH, SimHash, n-gram
Jaccard).

Scale design:
- Signatures (minhash vector, shingle hashes, winnowed fingerprints) are
  PER-ROW computations with no shuffle; each doc computes its signature in
  the scan stage.  Two interchangeable implementations exist:
  * array-expression form (JVM-side, zero Python) — the semantic reference,
    replayed verbatim by the DuckDB oracle;
  * Arrow+numpy form (mapInArrow) — the PRODUCTION default: Spark's
    higher-order array functions are CodegenFallback (interpreted per
    element), measured 10-20x slower than the vectorized batch at sf0.1;
    bit-identical outputs, asserted by parity tests.
- Shuffles happen only where semantically required: LSH band bucketing
  (groupBy band key — bounded fan-in per bucket), candidate-pair
  verification (equi-join on shingle hash), exact dedup (groupBy hash).
- Hash primitives are engine-portable: md5-prefix for token/shingle
  hashes (xxhash64/murmur differ across engines; md5 doesn't) and a
  codepoint Rabin-Karp polynomial for the winnowed fingerprints — both
  produce bit-identical values in Spark, DuckDB, and Python.

Determinism: "random" minhash permutations are fixed affine maps
(A[i]*h + B[i]) mod P with constants derived from small primes — embedded
as literals in both engines.

Algorithms: MinHash resemblance sketches (Broder, "On the resemblance and
containment of documents", SEQUENCES 1997) with banded LSH (Leskovec/
Rajaraman/Ullman, MMDS ch.3); SimHash (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002) with the pigeonhole
chunk-bucket candidate scheme of Manku et al., "Detecting near-duplicates
for web crawling", WWW 2007; winnowed fingerprints per Schleimer/Wilkerson/
Aiken, SIGMOD 2003.
"""

from __future__ import annotations

from contextlib import contextmanager
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

# persisted signature relations from ngram_jaccard_pairs calls, awaiting
# release — see release_sig_caches()
_SIG_CACHE: List[DataFrame] = []


def release_sig_caches() -> None:
    """Unpersist every signature relation a prior ngram_jaccard_pairs call
    persisted (ADVICE r03: persist with no unpersist path accumulated one
    cached relation per call in long-lived sessions).  Always safe to call:
    unpersisting only forces recompute on later reuse, never wrong results.
    Called automatically at the start of each persisting call, so at most
    ONE call's signatures are ever cached."""
    while _SIG_CACHE:
        df = _SIG_CACHE.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # owning session already stopped

# SimHash width: 60 bits, not 64 — 15 hex chars of md5 stay inside SIGNED
# 64-bit range in BOTH engines (Spark long and DuckDB ('0x'||hex)::BIGINT
# overflow/flip sign at 16 hex chars), so fingerprints, shifts and xor are
# bit-identical across engines with zero sign gymnastics.  4 chunks of 15
# bits = 32,768 buckets per chunk: at corpus scale each candidate bucket
# holds ~N/32768 docs (vs N/256 with the old 32-bit/8-bit scheme, whose
# candidate join went near-quadratic).
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4

# id offset for injected duplicate/variant rows in the dedup correctness
# corpora: far above any realistic id (2^40) so injected ids can never
# collide with real ones at any scale factor, while id+offset still sits
# comfortably inside BIGINT
VARIANT_OFFSET = 1 << 40


def hash32(col: Column) -> Column:
    """Deterministic 32-bit string hash shared with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash60(col: Column) -> Column:
    """60-bit md5-prefix hash (15 hex chars) — widest md5 prefix that is
    representable as a signed BIGINT in both Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


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
    toks_h = F.transform(tokens_col(F.coalesce(F.col(text_col), F.lit(""))), hash60)
    return (
        df.withColumn("_toks_h", toks_h)
        .withColumn(out_col, simhash_from_hashes(F.col("_toks_h"), bits))
        .drop("_toks_h")
    )


def with_variants(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  offset: int = VARIANT_OFFSET) -> DataFrame:
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
    impl: str = "arrow",
    max_bucket: "int | None" = None,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    sig -> split into `bands` bands of rows=num_perm/bands -> band bucket key
    -> equi-join within (band, key) -> distinct (a < b) pairs.  The join is a
    shuffle on the band key; bucket sizes are bounded by similarity structure
    (AQE skew-split covers pathological buckets).

    ``max_bucket`` (VERDICT r03 item 7): a boilerplate TEMPLATE owning a big
    slice of the corpus puts its whole slice in ONE band bucket, and the
    clique join then emits O(hot^2) pairs — semantically true pairs (the
    docs really are near-dups) but a wall-clock cliff at corpus scale.
    With max_bucket set, buckets larger than it emit STAR edges instead
    (bucket-min id as hub -> one edge per member): O(hot) rows, and
    connectivity — which is all downstream dedup CLUSTERING
    (dedup_components) consumes — is preserved exactly (a bucket clique and
    its star have identical connected components).  The trade-off is that
    within an oversized bucket only hub-spoke pairs exist for per-pair
    scoring, so keep it None when exact pair LISTS matter and the corpus
    is known template-free (the driver's oracle replays the clique form).

    ``impl``: 'arrow' (default; vectorized signatures) or 'expr' (the
    JVM-expression twin — same bits, ~10x slower at corpus scale).
    """
    rows = num_perm // bands
    if impl == "arrow":
        sig = minhash_arrow(docs, id_col, text_col, num_perm)
    else:
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
    ).hint("shuffle_hash")  # r07: self-joins below would otherwise broadcast
    # one side and re-evaluate the signature pipeline on both (see
    # simhash_hamming_pairs); the band-key shuffle is the scale path anyway
    if max_bucket is not None:
        # one agg on the SAME (band, key) the join shuffles on, so the
        # stats ride the shuffle the join needed anyway
        stats = banded.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("_n"), F.min("id").alias("_hub")
        )
        banded = banded.join(stats, ["band", "key"])
        small = banded.filter(F.col("_n") <= max_bucket)
        a = small.alias("a")
        b = small.alias("b")
        clique = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        star = (
            banded.filter((F.col("_n") > max_bucket) & (F.col("id") != F.col("_hub")))
            .select(F.col("_hub").alias("id_a"), F.col("id").alias("id_b"))
        )
        return clique.unionByName(star).distinct()
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


DEFAULT_SHINGLE_MAX_DF = 64


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    threshold_milli: int = 500,
    max_df: int = DEFAULT_SHINGLE_MAX_DF,
    min_shared: int = 1,
    impl: str = "arrow",
    persist_sigs: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing >= min_shared RARE
    shingles.

    Scale-critical shape: candidate generation equi-joins only shingle
    hashes whose document frequency is <= max_df — a boilerplate shingle
    ("of the and") appearing in millions of docs would otherwise create one
    hot key with a near-quadratic bucket.  Capping df bounds every bucket's
    pair fan-out at max_df^2; a true near-dup pair (jaccard >= 0.5) shares
    half its shingles, so it survives unless EVERY shared shingle is
    corpus-common — the standard df-cap trade-off, mirrored exactly in the
    DuckDB oracle.

    ``min_shared`` prunes candidates BEFORE the verify join hauls each
    pair's full shingle arrays: at sf0.1 requiring >= 3 shared rare
    shingles cut 4.46M candidate pairs to 45k (100x) with no change to
    that corpus's >= 0.5-jaccard result set (its docs carry ~100 shingles,
    so a true pair shares ~50).  RECALL CAVEAT: a SHORT document with
    fewer than ~2*min_shared shingles can have jaccard >= 0.5 while
    sharing < min_shared rare shingles (e.g. two 5-token docs sharing 2 of
    their 3 trigrams = 500 milli) — such pairs are pruned.  The LIBRARY
    default is therefore min_shared=1 (no recall loss, the r02 behavior);
    long-document callers — like the driver's dedup_ngram_jaccard query,
    whose corpus carries ~100 shingles per doc — opt into min_shared=3 for
    the 100x candidate cut (ADVICE r03: a recall regression must not be a
    silent library default).

    The Jaccard value itself stays EXACT: after the capped candidate join,
    each pair's full shingle arrays are re-joined and intersected
    (array_intersect), so max_df affects recall only, never the score.
    """
    if impl == "arrow":
        sh = shingle_hashes_arrow(docs, id_col, text_col, n)
    else:
        sh = docs.select(
            F.col(id_col).alias("id"),
            shingle_hashes_col(F.coalesce(F.col(text_col), F.lit("")), n).alias("hs"),
        )
    # the signature relation feeds THREE consumers (candidate explode +
    # both verify sides); without materialization Spark recomputes the
    # signature pass per consumer.  An operator cannot know when its
    # caller's final action ran, so the cache is tracked in _SIG_CACHE and
    # (a) the PREVIOUS call's relations are released on entry — a
    # long-lived session issuing many of these queries holds at most one
    # call's signatures, not an unbounded accumulation (ADVICE r03) —
    # and (b) release_sig_caches() frees the last one on demand
    # (unpersist is always correctness-safe: consumers just recompute).
    if persist_sigs:
        release_sig_caches()
        sh = sh.persist()
        _SIG_CACHE.append(sh)
    exploded = sh.select("id", F.explode("hs").alias("h"))
    rare = (
        exploded.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("h")
    )
    # shuffle on h (same key as the groupBy); shuffle_hash (r07) keeps the
    # candidate self-join off the broadcast path, which evaluated the whole
    # explode+df-filter pipeline on BOTH sides — measured 4.7-11.4 s ->
    # 2.2-3.1 s at sf0.1/16 cores — and is the only strategy that survives
    # when the rare-shingle relation outgrows the broadcast cap anyway
    rare_ex = exploded.join(rare, "h").hint("shuffle_hash")
    a = rare_ex.alias("a")
    b = rare_ex.alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_n_shared"))
        .filter(F.col("_n_shared") >= min_shared)
        .drop("_n_shared")
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    paired = cand.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    jac = (F.lit(1000) * inter) / union
    return (
        paired.select("id_a", "id_b", jac.cast("long").alias("jaccard_milli"))
        .filter(F.col("jaccard_milli") >= threshold_milli)
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = SIMHASH_CHUNKS,
    impl: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share at least one of `chunks`
    fingerprint chunks (pigeonhole: hamming <= chunks-1 guarantees a shared
    chunk), verified by exact popcount distance.  With 60-bit fingerprints
    each chunk key spans 2^15 buckets, keeping per-bucket candidate counts
    ~N/32768 at corpus scale.

    r07: default impl is the Arrow fingerprint twin and the self-join is
    hinted shuffle_hash — the broadcast self-join evaluated the whole
    fingerprint pipeline on BOTH sides (no exchange to reuse) and
    broadcasting one full side caps out at scale anyway; measured 5.75 s
    (expr+broadcast) -> 1.2 s (arrow+shuffle_hash) for 10k sf0.1 docs at
    16 cores, identical 5,417 output rows."""
    bits_per = SIMHASH_BITS // chunks
    if impl == "arrow":
        fp = simhash_arrow(docs, id_col, text_col)
    else:
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
    ).hint("shuffle_hash")
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


# ---------------------------------------------------------------------------
# Document fingerprinting: winnowed rolling k-gram hashes (MOSS-style)
# ---------------------------------------------------------------------------

WINNOW_K = 8   # character k-gram width
WINNOW_W = 4   # winnowing window (guarantee: any match >= k+w-1 chars shares
               # a fingerprint — Schleimer et al., "Winnowing: Local
               # Algorithms for Document Fingerprinting", SIGMOD 2003)
WINNOW_MAX_CHARS = 65536  # EXPLICIT sampling cap: fingerprint the first 64k
                          # chars only, so the per-row arrays stay bounded
                          # for multi-MB documents (a 2 MB page would
                          # otherwise build two ~2M-element arrays per row).
                          # Mirrored verbatim in the DuckDB oracle.
POLY_B = 257              # rolling-hash base; gram hash is the Rabin-Karp
                          # polynomial sum(cp[i+j] * B^j) mod MERSENNE31


def winnow_fingerprints_col(
    text: Column, k: int = WINNOW_K, w: int = WINNOW_W,
    max_chars: int = WINNOW_MAX_CHARS,
) -> Column:
    """Winnowed document fingerprints as array<long> — per-row, shuffle-free.

    Rabin-Karp polynomial hash of every character k-gram (codepoint
    arithmetic — identical integers in Spark, DuckDB, and Python, no string
    allocation or md5 in the hot loop), then keep the minimum hash of each
    w-wide window; consecutive windows usually share their minimum, so the
    distinct set is ~2/(w+1) of positions — a compact, position-robust
    fingerprint (insertions shift positions but leave most window minima
    intact).

    Codepoints come from one split('') pass so every gram hash is O(k)
    element_at lookups — an earlier substring(text, i, k) form was O(i) per
    gram (UTF8String position scan) and went quadratic on long documents.
    Out-of-range positions (text shorter than k) hash as codepoint 0.
    """
    text = F.substring(text, 1, max_chars)
    cps = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    n_grams = F.greatest(F.lit(1), F.size(cps) - (k - 1))
    powers = [pow(POLY_B, j, MERSENNE31) for j in range(k)]

    # Array-level formulation: gram hashes = elementwise combination of k
    # SHIFTED VIEWS of the codepoint array (slice is one O(n) op; zip_with
    # pads the shorter side with NULL -> coalesce 0 covers texts shorter
    # than k).  A per-index element_at(cps, i+j) form re-evaluated the cps
    # expression inside the lambda and went super-linear.
    def _term(pw: int):
        # closure factory, not a default arg: pyspark inspects lambda arity
        return lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)) * pw

    acc = F.transform(F.slice(cps, 1, n_grams), lambda x: x * powers[0])
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(cps, 1 + j, n_grams), _term(powers[j]))
    hs = F.transform(acc, lambda x: x % MERSENNE31)

    # winnow = elementwise min of w shifted views (least() skips the NULL
    # padding zip_with adds when a view runs short)
    n_win = F.greatest(F.lit(1), n_grams - (w - 1))
    mins = F.slice(hs, 1, n_win)
    for j in range(1, w):
        mins = F.zip_with(mins, F.slice(hs, 1 + j, n_win), lambda a, b: F.least(a, b))
    return F.array_sort(F.array_distinct(mins))


def with_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_chars: int = WINNOW_MAX_CHARS,
    impl: str = "arrow",
) -> DataFrame:
    """(id, fp) rows: one row per winnowed fingerprint of each document."""
    if impl == "arrow":
        return winnow_arrow(docs, id_col, text_col, k, w, max_chars).withColumnRenamed(
            "id", id_col
        )
    t = F.coalesce(F.col(text_col), F.lit(""))
    return docs.select(
        F.col(id_col),
        F.explode(winnow_fingerprints_col(t, k, w, max_chars)).alias("fp"),
    )


def fingerprint_match_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 5,
    max_df: int = DEFAULT_SHINGLE_MAX_DF,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing >= min_shared winnowed
    fingerprints — the MOSS-style local-match detector over the rolling-hash
    fingerprints.  Same scale shape as ngram_jaccard_pairs: fingerprints
    with document frequency > max_df are dropped before the candidate join
    so corpus-common fragments (boilerplate) cannot create hot keys."""
    fps = with_fingerprints(docs, id_col, text_col, k, w)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    # shuffle_hash (r07): same rationale as ngram_jaccard_pairs — the
    # broadcast self-join re-evaluates the fingerprint pipeline per side
    # and cannot survive a corpus-sized fingerprint relation
    rare_fps = fps.join(rare, "fp").hint("shuffle_hash")
    a = rare_fps.alias("a")
    b = rare_fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Arrow+numpy signature paths (production default).  Each mirrors its
# array-expression twin BIT-EXACTLY:
# - token split: Python str.split(" ") == Java split(regex " ", limit -1)
#   (both keep interior AND trailing empty strings; "" -> [""])
# - shingle/token hashes: md5-prefix ints, same as hash32/hash60
# - winnow codepoints: ord(c) == F.ascii per split('') char (BMP; astral
#   chars are the one documented divergence — Spark splits surrogates)
# ---------------------------------------------------------------------------


def _np():
    import numpy as np

    return np


def _shingle_hash_list(text: str, n: int) -> list:
    """Distinct n-gram shingle md5-prefix hashes (first-occurrence order)."""
    import hashlib

    toks = (text or "").split(" ")
    m = max(1, len(toks) - (n - 1))
    seen = set()
    out = []
    for i in range(m):
        g = " ".join(toks[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16))
    return out


def shingle_hashes_arrow(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """(id, hs array<long>) via mapInArrow — vectorized twin of
    shingle_hashes_col."""
    import pyarrow as pa

    def fn(batches):
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            hs = [_shingle_hash_list(t, n) for t in texts]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(hs, pa.list_(pa.int64()))], ["id", "hs"]
            )

    src = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    return src.mapInArrow(fn, "id long, hs array<long>")


def minhash_arrow(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    n: int = DEFAULT_SHINGLE_N,
) -> DataFrame:
    """(id, sig array<long>) via mapInArrow — vectorized twin of
    minhash_col (numpy broadcast over the permutation matrix)."""
    import pyarrow as pa

    np = _np()
    A = np.array(PERM_A[:num_perm], dtype=np.int64)[:, None]
    B = np.array(PERM_B[:num_perm], dtype=np.int64)[:, None]

    def fn(batches):
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            sigs = []
            for t in texts:
                h = np.array(_shingle_hash_list(t, n), dtype=np.int64)
                sigs.append(((A * h + B) % MERSENNE31).min(axis=1).tolist())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(sigs, pa.list_(pa.int64()))], ["id", "sig"]
            )

    src = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    return src.mapInArrow(fn, "id long, sig array<long>")


def simhash_arrow(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, fp) via mapInArrow — vectorized twin of with_simhash: same
    60-bit md5-prefix token hashes, same multiplicity-weighted bit votes
    (numpy shifts over the token-hash matrix instead of 60 interpreted
    aggregate folds per row).

    The DEFAULT since r07 (re-measured: 0.69 s arrow vs 2.16 s expr for
    10k sf0.1 docs at 16 cores — the 60 interpreted aggregate folds per
    row in the expression form dominate, not the md5).  A per-batch token
    cache dedupes md5 calls (natural-language tokens repeat heavily);
    it is cleared between batches so worker memory stays bounded."""
    import hashlib

    import pyarrow as pa

    np = _np()
    shifts = np.arange(bits, dtype=np.int64)

    def fp_of(text: str, cache: dict) -> int:
        toks = (text or "").split(" ")
        cg = cache.get
        hs = []
        for t in toks:
            v = cg(t)
            if v is None:
                v = cache[t] = int(
                    hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16
                )
            hs.append(v)
        h = np.array(hs, dtype=np.int64)
        votes = (((h[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
        return int(((votes > 0).astype(np.int64) << shifts).sum())

    def fn(batches):
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            cache: dict = {}
            fps = [fp_of(t, cache) for t in texts]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(fps, pa.int64())], ["id", "fp"]
            )

    src = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    return src.mapInArrow(fn, "id long, fp long")


def _winnow_list(text: str, k: int, w: int, max_chars: int, powers) -> list:
    """Sorted distinct winnowed fingerprints of one text — numpy twin of
    winnow_fingerprints_col (identical padding/edge semantics)."""
    np = _np()
    s = (text or "")[:max_chars]
    cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n = len(cps)
    n_grams = max(1, n - (k - 1))
    # pad with zeros so short texts match the coalesce(.., 0) expression form
    if n < n_grams + k - 1:
        cps = np.concatenate([cps, np.zeros(n_grams + k - 1 - n, dtype=np.int64)])
    win = np.lib.stride_tricks.sliding_window_view(cps, k)[:n_grams]
    hs = (win @ powers) % MERSENNE31
    n_win = max(1, n_grams - (w - 1))
    if n_grams >= w:
        mins = np.lib.stride_tricks.sliding_window_view(hs, w)[:n_win].min(axis=1)
    else:
        mins = np.array([hs.min()], dtype=np.int64)
    return np.unique(mins).tolist()


def winnow_arrow(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_chars: int = WINNOW_MAX_CHARS,
) -> DataFrame:
    """(id, fp) exploded winnowed fingerprints via mapInArrow — vectorized
    twin of with_fingerprints' expression path."""
    import pyarrow as pa

    np = _np()
    powers = np.array([pow(POLY_B, j, MERSENNE31) for j in range(k)], dtype=np.int64)

    def fn(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id: list = []
            out_fp: list = []
            for i, t in zip(ids, texts):
                fps = _winnow_list(t, k, w, max_chars, powers)
                out_id.extend([i] * len(fps))
                out_fp.extend(fps)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_id, pa.int64()), pa.array(out_fp, pa.int64())],
                ["id", "fp"],
            )

    src = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    return src.mapInArrow(fn, "id long, fp long")


def _persistent_rdd_ids(sc) -> set:
    """Ids of the JVM's currently-persisted RDDs (cache + localCheckpoint
    storage both live here — the CacheManager only tracks Dataset-level
    .persist, so this is the complete storage census)."""
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _ckpt_rdd_id(df: DataFrame) -> int:
    """EXACT id of the persisted RDD backing an eagerly localCheckpoint'ed
    DataFrame: its analyzed plan is a LogicalRDD over that RDD.  Precise
    attribution — no before/after census diffing, so relations persisted
    CONCURRENTLY by other queries on the same session are never
    misattributed and freed (review r4 finding)."""
    return int(df._jdf.queryExecution().analyzed().rdd().id())


# final-labels checkpoints of past dedup_components calls, by storage id.
# NOT auto-released: unpersisting a localCheckpoint DESTROYS the data
# (lineage is truncated — there is nothing to recompute from), so freeing
# a previous call's result could break a caller still holding it.  Call
# release_component_checkpoints(spark) once prior results are consumed.
_CC_CKPT_IDS: set = set()


def release_component_checkpoints(spark) -> None:
    """Free the checkpoint storage of ALL previously returned
    dedup_components results.  Only call after their consumers are done:
    unlike a cache unpersist this removes the data itself (localCheckpoint
    has no lineage to recompute), and the released DataFrames become
    unusable."""
    _unpersist_rdd_ids(spark.sparkContext, set(_CC_CKPT_IDS))
    _CC_CKPT_IDS.clear()


def _unpersist_rdd_ids(sc, rdd_ids: set) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for k in list(jmap.keySet().toArray()):
        if int(k) in rdd_ids:
            jmap.get(k).unpersist(False)


@contextmanager
def checkpoint_scope(spark):
    """Scope-bound storage release for the iterative-loop operators —
    the automatic alternative to the manual release_* contracts, so user
    code cannot leak pinned checkpoint RDDs by forgetting a call.

        with checkpoint_scope(spark):
            clusters = dedup_components(pairs, ids).collect()
            ranks = host_rank(edges).collect()
        # all checkpoint storage registered inside the scope is freed

    On exit, every checkpoint/cache registered DURING the scope is
    released: dedup_components final-labels checkpoints, host_rank rank
    checkpoints, grouped-verify assignment caches, and n-gram signature
    caches.  Storage registered BEFORE the scope is untouched, so scopes
    compose with long-lived sessions.  Because a localCheckpoint release
    DESTROYS the data (no lineage to recompute), results computed inside
    the scope must be materialized (collected/written) before exit —
    the same rule the manual contracts document."""
    from image_ocr_spark.operators import linkgraph, similarity

    before_cc = set(_CC_CKPT_IDS)
    before_rank = set(linkgraph._RANK_CKPT_IDS)
    before_assign = list(similarity._ASSIGN_CACHE)
    before_sig = list(_SIG_CACHE)
    try:
        yield
    finally:
        sc = spark.sparkContext
        new_cc = set(_CC_CKPT_IDS) - before_cc
        _unpersist_rdd_ids(sc, new_cc)
        _CC_CKPT_IDS.difference_update(new_cc)
        new_rank = set(linkgraph._RANK_CKPT_IDS) - before_rank
        _unpersist_rdd_ids(sc, new_rank)
        linkgraph._RANK_CKPT_IDS.difference_update(new_rank)
        for cache, before in (
            (similarity._ASSIGN_CACHE, before_assign),
            (_SIG_CACHE, before_sig),
        ):
            for df in [d for d in cache if not any(d is b for b in before)]:
                try:
                    df.unpersist()
                except Exception:
                    pass
                cache.remove(df)


def dedup_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    max_iters: int = 20,
    doubling_after: int = 2,
) -> DataFrame:
    """(id, cluster_id): connected components over near-dup pairs — the
    clustering step a real dedup pipeline runs AFTER pair generation, so
    each document maps to one cluster representative (the minimum doc id
    in its component; docs with no pairs are their own singleton cluster).

    Algorithm: Jacobi min-label propagation (the standard Spark CC loop,
    cf. GraphFrames' connectedComponents) with a pointer-doubling shortcut
    from round `doubling_after` on — label(v) <- min over {label(v),
    label(neighbors), label(label(v))}.  The shortcut doubles every node's
    label-jump per round (pointer jumping — the same contraction
    large-star performs in Kiveris et al., "Connected components in
    MapReduce and beyond", SoCC 2014 / HashToMin, Rastogi et al. 2013), so
    convergence is O(log diameter) rounds instead of O(diameter): a
    boilerplate dup CHAIN of length 10^6 converges in ~25 rounds where
    plain Jacobi needs 10^6.  Real dedup graphs are shallow (diameter 1-2),
    so the first `doubling_after` rounds skip the extra self-join and a
    shallow graph converges at exactly plain-Jacobi cost.  Labels always
    hold an id from the node's own component and only decrease, so the
    fixed point is exactly the plain Jacobi fixed point (component min
    everywhere); if labels still change after `max_iters` rounds the loop
    RAISES rather than silently returning split clusters.

    Scale shape (VERDICT r03 #2):
    - the loop runs over TOUCHED nodes only (pair endpoints): at corpus
      scale the dup graph is a sliver of N (at 10^12 docs the pair graph is
      maybe 10^9 nodes), so per-round joins never see the full corpus;
      untouched ids join back as singletons in the returned expression;
    - labels are EAGERLY localCheckpoint'ed EVERY round.  This is not
      optional hygiene: each round's logical plan references the previous
      round's 2-3x (nbr side, left-join side, pointer side), so without
      truncation the plan Catalyst must re-analyze grows ~3^rounds —
      measured 1.5s -> 11s -> 104s per ROUND by iteration 4 at sf0.1, all
      driver-side analysis (persist caches data, never the plan).  The
      checkpoint job doubles as the round's materialization, so the round
      count of Spark jobs is unchanged (checkpoint + changed-count);
    - the previous round's checkpoint STORAGE is freed as soon as the new
      one is materialized (r03 leaked one O(N) cached relation per round
      by unpersisting a projection, which Spark's CacheManager does not
      match to the cached plan).  On return the only storage held is the
      final (touched-node) labels checkpoint.

    Driver traffic per round is ONE scalar (the changed-row count)."""
    sc = ids.sparkSession.sparkContext
    # symmetric edge list in ONE pass over pairs (a union of two selects
    # would scan — and for an unpersisted pair plan, recompute — it twice)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )

    def _ckpt(df: DataFrame, prev_ids: set) -> tuple:
        """Eager localCheckpoint + free the storage of the superseded
        round; returns (checkpointed df, its EXACT storage rdd-id)."""
        out = df.localCheckpoint(eager=True)
        _unpersist_rdd_ids(sc, prev_ids)
        return out, {_ckpt_rdd_id(out)}

    # loop state: only nodes that appear in some pair (both directions are
    # in edges, so src alone covers every endpoint)
    labels, own_ids = _ckpt(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").cast("long").alias("label")),
        set(),
    )
    converged = False
    for it in range(max_iters):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(nbr, labels.id == nbr.nid, "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias(
                "label"
            ),
            F.coalesce(F.col("nlabel") < F.col("label"), F.lit(False)).alias(
                "_chg"
            ),
        )
        if it >= doubling_after:
            # pointer doubling: label(label(v)) — label(v) is a node id in
            # v's component, so the self-join stays within the component.
            # The pointer side reads the PREVIOUS round's labels (already
            # materialized) rather than `stepped`, and stale-label jumping
            # still contracts label paths geometrically (round k's label
            # already encodes the previous jump, so chasing it through
            # last round's table doubles it again).
            ptr = labels.select(
                F.col("id").alias("pid"), F.col("label").alias("plabel")
            )
            stepped = (
                stepped.alias("s")
                .join(ptr, F.col("s.label") == F.col("pid"), "left")
                .select(
                    F.col("s.id").alias("id"),
                    F.least(
                        F.col("s.label"), F.coalesce("plabel", F.col("s.label"))
                    ).alias("label"),
                    (
                        F.col("s._chg")
                        | F.coalesce(
                            F.col("plabel") < F.col("s.label"), F.lit(False)
                        )
                    ).alias("_chg"),
                )
            )
        new_labels, own_ids = _ckpt(stepped, own_ids)
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        edges.unpersist()
        _unpersist_rdd_ids(sc, own_ids)
        raise RuntimeError(
            f"dedup_components did not converge in {max_iters} rounds — "
            "a component has label-path length > 2^(max_iters-"
            f"{doubling_after}); the pair graph is pathological"
        )
    edges.unpersist()
    # singletons come from the ids scan at read time, so the full O(N)
    # result is never materialized to storage; the only storage held on
    # return is the final touched-node labels checkpoint (own_ids),
    # registered for explicit release via release_component_checkpoints
    _CC_CKPT_IDS.update(own_ids)
    return (
        ids.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            "id",
            F.coalesce("label", F.col("id").cast("long")).alias("cluster_id"),
        )
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE_N,
    min_overlap: int = 2,
    impl: str = "arrow",
) -> DataFrame:
    """(id, n_overlap): documents sharing >= min_overlap word n-grams with
    ANY benchmark item — eval-set decontamination, the training-data gate
    that keeps test sets out of the corpus (cf. GPT-3 appendix C / PaLM
    §B.3 n-gram overlap decontamination).

    Scale shape: the benchmark side is tiny (eval suites are thousands of
    items) — its distinct shingle hashes BROADCAST; the corpus streams
    through a broadcast hash join in the scan stage, then one groupBy(id)
    counts distinct overlapping shingles.  No corpus self-join anywhere —
    this is a different join geometry from the dedup pair ops.
    """
    if impl == "arrow":
        doc_sh = shingle_hashes_arrow(docs, id_col, text_col, n)
        bench_sh = shingle_hashes_arrow(benchmark, id_col, text_col, n)
    else:
        doc_sh = docs.select(
            F.col(id_col).alias("id"),
            shingle_hashes_col(F.coalesce(F.col(text_col), F.lit("")), n).alias("hs"),
        )
        bench_sh = benchmark.select(
            F.col(id_col).alias("id"),
            shingle_hashes_col(F.coalesce(F.col(text_col), F.lit("")), n).alias("hs"),
        )
    bench_grams = (
        bench_sh.select(F.explode("hs").alias("h")).distinct()
    )
    doc_grams = doc_sh.select("id", F.explode("hs").alias("h"))
    hits = doc_grams.join(F.broadcast(bench_grams), "h")
    return (
        hits.groupBy("id")
        .agg(F.count_distinct("h").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 1,
) -> DataFrame:
    """(id, clean_text): corpus-level LINE deduplication — every line whose
    hash appears in MORE THAN max_df distinct documents is removed from ALL
    documents, and the surviving lines rejoin in their original order.
    This is the boilerplate-line scrub of C4 ("three-sentence span" dedup's
    line-level cousin) and RefinedWeb/Dolma's exact line dedup: navigation
    bars, cookie banners and footers repeat across a site's every page and
    would otherwise dominate the training distribution.

    Scale shape: posexplode is per-row (scan stage); the document-frequency
    aggregation shuffles once on the line hash with partial aggregation
    (hot boilerplate lines combine map-side, so a line appearing on 10^9
    pages contributes one row per map partition, not 10^9 shuffle rows);
    the removal is a left_anti join on the SAME hash key (no second
    shuffle of the lines); the rebuild groups by doc id (the one unavoidable
    reshuffle, proportional to SURVIVING lines only).  Line identity is the
    engine-portable 60-bit md5-prefix hash — at the corpus scale this
    operator targets, a 32-bit space collides at ~77k distinct lines
    (review r4 finding: a colliding unique line would be silently scrubbed
    everywhere); 2^60 pushes the birthday bound past 10^8 lines."""
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn("h", hash60(F.col("line")))
    common = (
        lines.groupBy("h")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    kept = lines.join(common, "h", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    # documents whose every line was boilerplate still appear (empty text)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .select(
            "id", F.coalesce("clean_text", F.lit("")).alias("clean_text")
        )
    )


def dedup_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_count: int = 2,
    max_dup_starts: int = 4096,
) -> DataFrame:
    """(doc_id, n_tokens, n_windows, n_dup_windows, clean_text): EXACT
    SUBSTRING deduplication at token-window granularity — every token
    covered by a `window`-token span whose hash occurs >= min_count times
    ANYWHERE in the corpus (across documents or repeated within one) is
    removed from every document, the Spark-first graft of the
    suffix-array substring dedup in Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL 2022; they use 50-token
    spans — `window` scales with real corpus token counts).  Finer than
    dedup_lines (catches mid-line boilerplate and templated sentences),
    stricter than minhash (exact spans only).

    Scale shape mirrors dedup_lines: window hashing is per-row in the
    scan stage (positions kept); ONE shuffle on the 60-bit window hash
    with map-side combine (a span on 10^9 pages contributes one row per
    map partition); duplicate-window starts come back per doc via a
    semi-join on the SAME key + a per-doc regroup (proportional to DUP
    windows only, not all windows); the rebuild filters tokens against
    the doc's dup-start list per row.  The per-row rebuild is
    O(n_tokens * n_dup_starts), so a wall-to-wall-duplicate doc would
    degrade to O(n^2) per row — ``max_dup_starts`` bounds it: only the
    FIRST ``max_dup_starts`` sorted duplicate starts are applied to the
    rebuild (deterministic truncation; a capped doc UNDER-deletes its
    tail, never over-deletes), while ``n_dup_windows`` still reports the
    uncapped count so capped docs are detectable downstream
    (n_dup_windows > max_dup_starts).  The DuckDB oracle mirrors the
    same list_slice.

    Windows use a \\x01 joiner (cannot appear in whitespace-split
    tokens), so unequal spans can only collide at the 2^60 birthday
    bound (~10^8 distinct spans, the dedup_lines argument)."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    w = window
    idx = F.when(
        F.size("toks") >= w, F.sequence(F.lit(1), F.size("toks") - (w - 1))
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        "id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    hash60(
                        F.array_join(F.slice("toks", i, w), "\x01")
                    ).alias("h"),
                ),
            )
        ).alias("win"),
    ).select("id", F.col("win.pos").alias("pos"), F.col("win.h").alias("h"))
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    starts = (
        wins.join(dup, "h", "left_semi")
        .groupBy("id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list("pos")), 1, max_dup_starts
            ).alias("ss"),
            F.count(F.lit(1)).alias("n_dup"),
        )
    )
    joined = base.join(starts, "id", "left").select(
        "id",
        "toks",
        F.coalesce("ss", F.array().cast("array<int>")).alias("ss"),
        F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
    )
    covered = lambda i: F.exists(
        F.col("ss"), lambda s: (s <= i + 1) & (i + 1 < s + w)
    )
    clean = F.array_join(
        F.transform(
            F.filter(
                F.transform("toks", lambda x, i: F.struct(x.alias("x"), i.alias("i"))),
                lambda st: ~covered(st["i"]),
            ),
            lambda st: st["x"],
        ),
        " ",
    )
    return joined.select(
        F.col("id").alias("doc_id"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.greatest(F.lit(0), F.size("toks") - (w - 1))
        .cast("long")
        .alias("n_windows"),
        F.col("n_dup").cast("long").alias("n_dup_windows"),
        clean.alias("clean_text"),
    )
