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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .text import tokens

__all__ = [
    "spread",
    "word_shingles",
    "minhash_signature",
    "band_keys",
    "minhash_near_dup_pairs",
    "simhash64",
    "simhash_near_dup_pairs",
    "jaccard",
]


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before a compute-heavy
    narrow stage.  The testdata parquet is one row group per file, so the
    scan is a single task no matter what — without this, signature
    computation runs on 1 of N cores.  On a real lake (many files / row
    groups) the scan parallelizes itself and AQE coalesces this into a
    no-op-sized shuffle of pruned columns only."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


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


def minhash_signature(hashed: Column, n_hashes: int = 16) -> Column:
    """MinHash signature from pre-hashed shingles (``array<long>``): lane i
    = min over xxhash64(i, h).  The base string hash is computed ONCE per
    shingle by the caller; each lane re-hashes only 8-byte longs.  (A
    multiplicative xor-mix would be cheaper still, but Spark 4's default
    ANSI mode makes wrapping long multiplication throw.)"""
    return F.array(
        *[
            F.array_min(F.transform(hashed, lambda h: F.xxhash64(F.lit(i), h)))
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
    sh = spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        word_shingles(tokens(F.col(text_col))).alias("sh"),
    ).where(F.size("sh") > 0)
    # materialize the base hashes in their own projection so each of the
    # 16 lanes reads the long array instead of re-hashing the strings
    sh = sh.persist()
    hashed = sh.withColumn("hs", F.transform("sh", lambda s: F.xxhash64(s)))
    # banding/candidate generation carries ONLY (id, band, bucket) — the
    # shingle arrays would otherwise ride the explode ×bands and the
    # dedup shuffle; they are re-joined just for the verify step
    banded = hashed.select(
        "id",
        F.posexplode(band_keys(minhash_signature(F.col("hs"), n_hashes), bands, rows)).alias(
            "band", "bucket"
        ),
    )
    left = banded.select("band", "bucket", F.col("id").alias("a"))
    right = banded.select("band", "bucket", F.col("id").alias("b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    pairs = cand.join(
        sh.select(F.col("id").alias("a"), F.col("sh").alias("sh_a")), "a"
    ).join(sh.select(F.col("id").alias("b"), F.col("sh").alias("sh_b")), "b")
    return (
        pairs.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over tokens: per bit, vote +1/-1 by that bit of
    xxhash64(token); bit set where the vote is positive (sign bit left 0
    — irrelevant for Hamming comparisons).

    Tokenize+hash stay JVM-side (one ``transform``); the 64-lane vote
    accumulation is a vectorized pandas UDF.  This is the documented
    exception to "stay JVM-side": a pure higher-order-function version
    (zip_with over a per-token 64-array) is interpreted, allocates one
    array per token, and measured 263 s at sf0.1 vs ~2 s for the Arrow
    path — np.unpackbits turns the votes into one matrix op per batch.
    """
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _simhash_votes(hashes)


# type object, not a DDL string: string return types are parsed via the
# active SparkContext, which doesn't exist yet at import time
@F.pandas_udf(LongType())
def _simhash_votes(hcol: pd.Series) -> pd.Series:
    import numpy as np

    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    weights[63] = 0  # keep the sign bit clear
    out = np.zeros(len(hcol), dtype=np.int64)
    for i, arr in enumerate(hcol):
        if arr is None or len(arr) == 0:
            continue
        h = np.asarray(arr, dtype=np.int64).view(np.uint64)
        # (n_tokens, 64) bit matrix; bit j of hash = column j
        bits = np.unpackbits(
            h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(h)
        out[i] = weights[votes > 0].sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 10,
) -> DataFrame:
    """SimHash near-dups: candidates share one of four 16-bit chunks
    (pigeonhole: any pair with hamming ≤ 16/4·3 shares a chunk), verified
    by exact Hamming distance ≤ max_hamming via bit_count(xor)."""
    with_hash = spread(docs.select(id_col, text_col)).select(
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
