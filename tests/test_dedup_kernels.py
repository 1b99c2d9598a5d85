"""Round-15 kernel-equality pins for the vectorized dedup sketch pass.

hashed_shingle_sets (functions/dedup.py) replays Spark's XXH64 in numpy
so the shingle/signature computation runs as one Arrow pass instead of
interpreted CodegenFallback HOFs.  The hash VALUES are load-bearing
(persisted signature stores, banding keys, audit estimates), so this
module pins:

  1. the numpy XXH64 primitives against F.xxhash64 itself (longs, ints,
     arrays, chained multi-arg) over a deterministic battery including
     the sign/overflow edges, and
  2. the full kernel against the pre-r15 JVM expression shape
     (xxhash64-per-slice + aggregate/zip_with minhash fold) on real
     testdata — set-equality for sh (the kernel emits sorted-distinct;
     array_distinct kept first-occurrence order) and exact equality for
     every signature lane.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataframe_expressions_spark.functions import dedup as D
from dataframe_expressions_spark.functions.text import tokens
from dataframe_expressions_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _np_xxh64():
    u64 = np.uint64
    P1, P2 = u64(0x9E3779B185EBCA87), u64(0xC2B2AE3D27D4EB4F)
    P3, P4 = u64(0x165667B19E3779F9), u64(0x85EBCA77C2B2AE63)
    P5, SEED = u64(0x27D4EB2F165667C5), u64(42)

    def rotl(x, r):
        r = u64(r)
        return (x << r) | (x >> (u64(64) - r))

    def fmix(h):
        h ^= h >> u64(33)
        h *= P2
        h ^= h >> u64(29)
        h *= P3
        h ^= h >> u64(32)
        return h

    def hash_long(v, seed):
        h = seed + P5 + u64(8)
        h ^= rotl(v * P2, 31) * P1
        h = rotl(h, 27) * P1 + P4
        return fmix(h)

    def hash_int(v, seed):
        h = seed + P5 + u64(4)
        h ^= u64(np.int64(v) & 0xFFFFFFFF) * P1
        h = rotl(h, 23) * P2 + P3
        return fmix(h)

    return hash_long, hash_int, SEED


BATTERY_LONGS = [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63),
                 123456789123456789, -987654321987654321]
BATTERY_INTS = [0, 1, -1, 42, 2**31 - 1, -(2**31), 7919]


def test_numpy_xxh64_matches_spark(spark):
    hash_long, hash_int, SEED = _np_xxh64()
    np.seterr(over="ignore")
    df = spark.createDataFrame([(int(v),) for v in BATTERY_LONGS], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in BATTERY_LONGS:
        assert int(np.int64(hash_long(np.uint64(np.int64(v)), SEED))) == got[v], v

    df = spark.createDataFrame([(int(v),) for v in BATTERY_INTS], "v int")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in BATTERY_INTS:
        assert int(np.int64(hash_int(v, SEED))) == got[v], v

    # chained multi-arg (the signature-lane shape xxhash64(i, h)) and
    # array hashing (the shingle shape xxhash64(slice(th, i, 3)))
    spark_c = (
        spark.createDataFrame([(3, 77)], "i int, h long")
        .select(F.xxhash64("i", "h").alias("c"))
        .first()["c"]
    )
    assert int(np.int64(hash_long(np.uint64(77), hash_int(3, SEED)))) == spark_c
    arr = [11, -22, 2**62]
    spark_c = (
        spark.createDataFrame([(arr,)], "a array<long>")
        .select(F.xxhash64("a").alias("c"))
        .first()["c"]
    )
    h = SEED
    for v in arr:
        h = hash_long(np.uint64(np.int64(v)), h)
    assert int(np.int64(h)) == spark_c


def test_sketch_kernel_matches_jvm_expression_shape(spark):
    """Full-kernel pin on real testdata: sh as a SET and sig lane-exact
    against the pre-r15 JVM HOF computation."""
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    got = {
        r["id"]: (sorted(r["sh"]), list(r["sig"]))
        for r in D.hashed_shingle_sets(docs, with_signature=8).collect()
    }

    th = docs.select(
        F.col("doc_id").alias("id"),
        F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t)).alias("th"),
    )
    n = F.size("th")
    jvm_sh = th.where(n >= 3).select(
        "id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.xxhash64(F.slice(F.col("th"), i, 3)),
            )
        ).alias("sh"),
    ).withColumn("sig", D.minhash_signature(F.col("sh"), 8))
    want = {
        r["id"]: (sorted(r["sh"]), list(r["sig"])) for r in jvm_sh.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], f"sh set mismatch doc {k}"
        assert got[k][1] == want[k][1], f"sig mismatch doc {k}"
    assert len(want) > 50  # the pin actually exercised real documents
