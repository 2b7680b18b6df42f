"""Deduplication operators for LLM training-data pipelines
(BASELINE.json north star — absent from the reference, standard public
techniques: Broder MinHash-LSH, Charikar SimHash, n-gram Jaccard).

Design for 100 TB:
- Hashing is md5-based and engine-agnostic → the DuckDB oracle computes
  the *same* signatures (determinism is also what makes reruns/resumes
  idempotent at scale).
- Everything is pure column expressions until the candidate-pair
  self-join; LSH banding turns the O(n²) pair space into an equi-join on
  (band_idx, band_key) — shuffle-partitioned by band key, broadcast-free,
  skew handled by AQE.
- Exact dedup is a single hash aggregation (map-side partial) on the
  fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_migrate_api_spark.functions.text import char_shingles, fingerprint

N_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows → LSH threshold ≈ (1/4)^(1/4) ≈ 0.71


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups: md5 fingerprint of normalized text →
    (fingerprint, keeper_id = min id, n_dups) for groups of size > 1."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .where(F.col("n_dups") > 1)
    )


def minhash_signature(text: Column, n_hashes: int = N_HASHES, k: int = 5) -> Column:
    """MinHash signature as array<string>: per seed s, the lexicographic
    min of md5('<s>#' || shingle) over the doc's distinct k-shingles.
    (Lexicographic min of fixed-width hex ≡ numeric min.) Empty shingle
    set → NULL signature."""
    sh = F.array_distinct(char_shingles(text, k))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                sh, lambda x: F.md5(F.concat(s.cast("string"), F.lit("#"), x))
            )
        ),
    )
    return F.when(F.size(sh) > 0, sig)


def lsh_band_keys(sig: Column, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE) -> Column:
    """Band the signature: array of (n_hashes/band_size) md5 band keys."""
    n_bands = n_hashes // band_size
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(
            F.array_join(F.slice(sig, b * band_size + 1, band_size), "|")
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing ≥1 LSH band,
    with exact shingle-Jaccard attached for verification.

    Plan shape: narrow map (signature) → posexplode bands → self
    equi-join on (band_idx, band_key) → distinct pairs → join back the
    two shingle sets → Jaccard as array_intersect/array_union sizes.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(char_shingles(text_col)).alias("sh"),
    ).where(F.size("sh") > 0)

    banded = base.select(
        "id",
        F.posexplode(lsh_band_keys(minhash_signature_from_shingles(F.col("sh")))).alias(
            "band_idx", "band_key"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
    )


def minhash_signature_from_shingles(sh: Column, n_hashes: int = N_HASHES) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(
            F.transform(sh, lambda x: F.md5(F.concat(s.cast("string"), F.lit("#"), x)))
        ),
    )


# --------------------------------------------------------------------------
# SimHash (Charikar): 64-bit signature from md5 bits of distinct tokens,
# packed into two bigint halves (lo = bits 0..31, hi = 32..63) so hamming
# distance is bit_count(xor) — engine-agnostic and O(1) per pair.
# --------------------------------------------------------------------------

_SIMHASH_HALF = """
aggregate(
  transform(sequence({lo}, {hi}), i ->
    case when
      aggregate(
        {hashes},
        0L,
        (acc, h) -> acc + (cast(shiftright(cast(conv(substring(h, cast(i / 4 as int) % 8 + {off} + 1, 1), 16, 10) as int), cast(i % 4 as int)) & 1 as bigint) * 2 - 1)
      ) > 0
    then shiftleft(cast(1 as bigint), cast(i - {lo} as int)) else cast(0 as bigint) end),
  cast(0 as bigint), (a, x) -> a + x)
"""


def simhash_halves(tokens_hashed: str) -> tuple[Column, Column]:
    """(lo, hi) bigint halves of the 64-bit simhash.

    ``tokens_hashed``: SQL expression for array<string> of md5 hex
    digests of the doc's distinct tokens. Bit i of the simhash is 1 iff
    the ±1 vote sum over token-hash bit i is positive. Hash bit i for a
    token is bit (i%4) of hex nibble ((i div 4) mod 8 + offset): the lo
    half reads nibbles 1-8 of the md5, the hi half nibbles 9-16.
    """
    lo = F.expr(_SIMHASH_HALF.format(lo=0, hi=31, off=0, hashes=tokens_hashed))
    hi = F.expr(_SIMHASH_HALF.format(lo=32, hi=63, off=8, hashes=tokens_hashed))
    return lo, hi


def simhash_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash_lo, simhash_hi) per document."""
    hashed = (
        "transform(array_distinct(filter(split(lower(trim({t})), '\\\\s+'), "
        "x -> x != '')), t -> md5(t))"
    ).format(t=text_col)
    lo, hi = simhash_halves(hashed)
    return df.select(
        F.col(id_col).alias("id"),
        lo.alias("simhash_lo"),
        hi.alias("simhash_hi"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Pairs with simhash hamming distance ≤ max_hamming.

    Scale path: block on the hi half (near-dups almost always agree on
    32 bits) → equi-join instead of cross-join; the residual cross
    within a block is tiny. At 100 TB one would block on 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal); hi-half
    blocking is the same idea at this SF.
    """
    s = simhash_df(df, text_col, id_col)
    a = s.alias("a")
    b = s.alias("b")
    ham = F.expr(
        "bit_count(a.simhash_lo ^ b.simhash_lo) + bit_count(a.simhash_hi ^ b.simhash_hi)"
    )
    return (
        a.join(
            b,
            (F.col("a.simhash_hi") == F.col("b.simhash_hi"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Word n-gram Jaccard similarity for pairs within a blocking key
    (full cross-join is never acceptable at scale — callers block on
    lang/source/length-band)."""
    from etl_migrate_api_spark.functions.text import word_ngrams

    base = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.array_distinct(word_ngrams(text_col, n)).alias("g"),
    ).where(F.size("g") > 0)
    a = base.alias("a")
    b = base.alias("b")
    inter = F.size(F.array_intersect("a.g", "b.g")).cast("double")
    union = F.size(F.array_union("a.g", "b.g")).cast("double")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
