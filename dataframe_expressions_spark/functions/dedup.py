"""Deduplication operators for LLM-data pipelines: exact, MinHash-LSH,
SimHash, n-gram Jaccard.  (North-star scope; absent in the reference.)

Scale design (the whole point of these shapes at 100 TB):

* Candidate generation is ALWAYS an equi-join on a band/bucket key —
  never an all-pairs cross join.  LSH banding turns near-dup detection
  into ``groupBy(band_key)`` + self-join: shuffle cost O(n·bands), and
  skewed buckets are handled by AQE skew-join splitting.
* Signatures are built with JVM higher-order functions over token arrays
  (xxhash64 inside ``transform``) — one pass over the text, no Python.
* Exact verification (Jaccard / Hamming) runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "word_shingles",
    "minhash_signature",
    "band_keys",
    "minhash_near_dup_pairs",
    "simhash64",
    "simhash_near_dup_pairs",
    "jaccard",
]


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token array (empty when < k tokens)."""
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: per seed i, min over xxhash64(i ++ shingle).
    Seeding by prefix-concat keeps everything inside one codegen stage."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(F.concat(F.lit(f"{i}:"), s)))
            )
            for i in range(n_hashes)
        ]
    )


def band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each band of the signature to one bucket key."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b), *[sig[b * rows_per_band + r] for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b))
    return inter / union


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.4,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: shingle → minhash → band → explode(band) → self-equi-join on
    (band_id, bucket) → distinct candidate pairs → exact Jaccard ≥ t.
    """
    rows = n_hashes // bands
    sh = docs.select(
        F.col(id_col).alias("id"),
        word_shingles(tokens(F.col(text_col))).alias("sh"),
    ).where(F.size("sh") > 0)
    banded = sh.select(
        "id",
        "sh",
        F.posexplode(band_keys(minhash_signature(F.col("sh"), n_hashes), bands, rows)).alias(
            "band", "bucket"
        ),
    )
    left = banded.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("a"), F.col("sh").alias("sh_a")
    )
    right = banded.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("b"), F.col("sh").alias("sh_b")
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over tokens: per bit, vote +1/-1 by that bit of
    xxhash64(token); bit set where the vote is positive.  Single pass,
    all JVM higher-order functions."""
    # Hash each token ONCE, then vote on the precomputed hash — putting
    # xxhash64 inside the per-bit expressions makes Catalyst evaluate it
    # 64× per token (measured 380 s at sf0.1 vs ~5 s this way).
    # shiftright takes Python-int shift amounts, so the 64 bit positions
    # are unrolled as literal array elements (one codegen stage).
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1
                    ).cast("long")
                    for i in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    bits = F.array(
        *[
            F.when(F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(63)
        ]
        # bit 63 would overflow a signed-long literal; the sign bit is
        # irrelevant for Hamming comparisons, leave it 0.
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 10,
) -> DataFrame:
    """SimHash near-dups: candidates share one of four 16-bit chunks
    (pigeonhole: any pair with hamming ≤ 16/4·3 shares a chunk), verified
    by exact Hamming distance ≤ max_hamming via bit_count(xor)."""
    with_hash = docs.select(
        F.col(id_col).alias("id"), simhash64(tokens(F.col(text_col))).alias("h")
    )
    chunks = with_hash.select(
        "id",
        "h",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("h"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk", "key"),
    )
    left = chunks.select("chunk", "key", F.col("id").alias("a"), F.col("h").alias("ha"))
    right = chunks.select("chunk", "key", F.col("id").alias("b"), F.col("h").alias("hb"))
    return (
        left.join(right, ["chunk", "key"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
