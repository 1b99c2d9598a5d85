"""Embedding similarity search over ``array<float>`` columns.

Baseline: brute-force cosine top-k — broadcast the (small) query set,
score every corpus vector JVM-side (``zip_with`` product + sequential
``aggregate`` fold, mirroring DuckDB's ``list_inner_product`` order so
results hash-match bitwise), rank per query.

Scale path: LSH sign-bucketing (random-hyperplane sketch) so each query
only scores one bucket — candidate generation becomes an equi-join on the
bucket key exactly like the dedup operators.  At 100 TB you'd persist the
bucketed corpus partitioned by bucket id; the per-query probe then touches
1/2^bits of the data (IVF-style).  Swap in real IVF centroids by replacing
``_bucket_expr`` with an argmin-over-centroids expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["dot", "sqdist", "cosine", "cosine_topk", "lsh_bucket", "cosine_topk_lsh"]


def dot(a: Column, b: Column) -> Column:
    """Sequential left fold over the element products — deterministic and
    identical to DuckDB's list_inner_product evaluation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def sqdist(a: Column, b: Column) -> Column:
    """Squared euclidean distance as a sequential left fold — the shared
    argmin kernel for kmeans/SemDeDup/PQ assignment.  Deterministic IEEE,
    same order as the oracles' list_reduce over (a[i]-b[i])².  NB
    zip_with NULL-pads on length mismatch and the fold then yields NULL;
    callers must pin dimensionality (``size(v) == d``) on both engines —
    Spark's struct-min sorts a NULL distance FIRST while DuckDB's
    row_number sorts it LAST, so an unguarded ragged vector diverges."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for a fixed query set.

    Scale: queries are broadcast (no shuffle of the corpus); scoring is a
    single codegen'd map stage; ranking shuffles only (n_queries × corpus)
    scored rows — use the LSH variant when that product is too large.
    """
    # norms are computed ONCE per vector, not once per (query, vector)
    # pair — bit-identical to cosine() (same fold order, same sqrt) but
    # one dot instead of three per scored pair
    # zero-norm vectors have no direction: excluded as BOTH query and
    # candidate — under ANSI the 0-divisor cosine otherwise aborts the
    # whole job on the first degenerate embedding (adversarial test)
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("qnrm", F.sqrt(dot(F.col("qvec"), F.col("qvec")))).where(
        F.col("qnrm") > 0
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vvec")
    ).withColumn("vnrm", F.sqrt(dot(F.col("vvec"), F.col("vvec")))).where(
        F.col("vnrm") > 0
    )
    scored = corpus.join(F.broadcast(q), F.col("vid") != F.col("qid")).select(
        "qid",
        "vid",
        F.round(
            dot(F.col("qvec"), F.col("vvec")) / (F.col("qnrm") * F.col("vnrm")), 4
        ).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vid", "sim", "rk")
    )


# LCG constants for the portable hyperplane pattern — plain bigint
# arithmetic both Spark and DuckDB evaluate identically, so the bucket
# assignment (and therefore the emitted top-k) has a full SQL oracle.
_LSH_A, _LSH_B, _LSH_C, _LSH_M = 1103515245, 12347, 54321, 2147483647


def lsh_bucket(vec: Column, bits: int = 4) -> Column:
    """Random-hyperplane sign sketch with fixed deterministic hyperplanes:
    plane b's sign at dimension i is the parity of the LCG
    ``(A·(i + B·b) + C) mod M`` — portable integer arithmetic (DuckDB
    mirrors it exactly, unlike xxhash64).  Bucket id in [0, 2^bits).
    The projection folds ±x sequentially from 0.0, matching DuckDB's
    ``list_inner_product`` with a ±1 vector bit-for-bit."""

    def plane_sign(b: int) -> Column:
        # 64-bit arithmetic throughout: the 32-bit product overflows and
        # ANSI mode turns that into a job abort
        a_lit = F.lit(_LSH_A).cast("long")
        prods = F.transform(
            vec,
            lambda x, i: F.when(
                ((a_lit * (i.cast("long") + _LSH_B * b) + _LSH_C) % _LSH_M) % 2
                == 1,
                x,
            ).otherwise(-x),
        )
        return F.aggregate(prods, F.lit(0.0), lambda a, v: a + v)

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(plane_sign(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (equi-join on bucket id → shuffle-light at scale)."""
    emb = embeddings.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("vvec"),
        lsh_bucket(_as_double(F.col(vec_col)), bits).alias("bucket"),
    ).withColumn("vnrm", F.sqrt(dot(F.col("vvec"), F.col("vvec")))).where(
        F.col("vnrm") > 0  # zero-norm exclusion: see cosine_topk
    )
    q = emb.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), F.col("vvec").alias("qvec"),
        F.col("vnrm").alias("qnrm"), "bucket",
    )
    scored = emb.join(F.broadcast(q), "bucket").where(
        F.col("vid") != F.col("qid")
    ).select(
        "qid",
        "vid",
        F.round(
            dot(F.col("qvec"), F.col("vvec")) / (F.col("qnrm") * F.col("vnrm")), 4
        ).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vid", "sim", "rk")
    )


def _ivf_assign_expr(
    emb: DataFrame, centroids: DataFrame, vec_col: str = "vvec"
) -> DataFrame:
    """JVM-expression IVF assignment — the pre-r15 shape, kept as the
    exact-semantics fallback for centroid sets the vectorized kernel
    does not cover (ragged centroid lengths; see ``ivf_assign``)."""
    # norms staged once per vector / per centroid (bit-identical to
    # cosine() — same fold order, same sqrt) instead of two self-dot
    # folds per (vector, centroid) pair
    emb_n = emb.withColumn(
        "_vn", F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
    ).where(F.col("_vn") > 0)  # zero-norm exclusion: see cosine_topk
    cents_n = centroids.withColumn(
        "_cn", F.sqrt(dot(F.col("cvec"), F.col("cvec")))
    ).where(F.col("_cn") > 0)
    scored = emb_n.join(F.broadcast(cents_n)).withColumn(
        "csim",
        dot(F.col(vec_col), F.col("cvec")) / (F.col("_vn") * F.col("_cn")),
    )
    # Per-vector argmax as a max_by AGGREGATE, not a row_number window
    # (round 15, guide §2.3/§2.4): the broadcast NLJ emits each vector's
    # |cells| scored rows contiguously, so the partial aggregate
    # collapses them to ONE row per vector inside the map task — the
    # window spelling shuffled the full (vector × cells) expansion
    # (embedding payload included) and sorted it.  Ordering identical:
    # max over (csim, -cell) ≡ ORDER BY csim DESC, cell ASC with rk=1
    # (cell ids are distinct, so the order key has no full ties).
    keep = [c for c in scored.columns if c not in ("cvec", "csim", "_vn", "_cn", "vid")]
    best = scored.groupBy("vid").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in keep]),
            F.struct(F.col("csim"), (-F.col("cell")).alias("nc")),
        ).alias("_b")
    )
    return best.select("vid", *[F.col(f"_b.{c}").alias(c) for c in keep])


def ivf_assign(emb: DataFrame, centroids: DataFrame, vec_col: str = "vvec") -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell) by cosine.

    ``centroids``: (cell: long, cvec: array<double>) — small by
    construction (≈ sqrt(n) cells at scale), so it is materialized
    driver-side (bounded collect, same discipline as the curation
    centroid broadcast) and closure-shipped into ONE vectorized
    ``mapInPandas`` pass over the corpus: no join, no argmax shuffle —
    each row maps to its cell in place, preserving the input
    partitioning (guide §4.2: the interpreted zip_with+aggregate cosine
    was ~|emb|·|cells|·d boxed lambda steps, CodegenFallback).

    EXACTNESS (pinned by tests/test_similarity_kernels.py against the
    expression path on real + adversarial embeddings): the numpy
    dim-loop accumulates dot and self-norm in ascending-dimension order
    with left association — bit-identical to the sequential
    ``aggregate(zip_with(...))`` fold and DuckDB's list_inner_product —
    the divide replays ``dot / (vn * cn)`` with the same operand order,
    and the argmax scans centroids in ascending-cell order so equal
    csims keep the lowest cell (``max_by(csim, -cell)`` ≡ first-max).
    Zero/NULL-norm vectors drop exactly like the ``_vn > 0`` filter;
    zero-norm centroids drop from the cell set like ``_cn > 0``; a
    ragged row (len(v) ≠ centroid dim) NULL-pads the JVM fold to a NULL
    csim for EVERY cell and lands in the lowest live cell — replayed
    verbatim.  Ragged CENTROID sets (possible only from ragged corpora)
    fall back to the expression path wholesale.

    INPUT PRECONDITION — no NaN elements (r15 ADVICE): a NaN vector
    element diverges from the expression path.  Spark orders NaN above
    every value, so ``_vn > 0`` with ``_vn = NaN`` is TRUE and the
    expression path KEEPS the row, assigning the lowest live cell
    through the all-NaN csim tie-break; this kernel's ``vn > 0`` is
    numpy IEEE (NaN > 0 is False) and DROPS it.  The divergence cannot
    be repaired inside mapInPandas — Arrow's pandas conversion collapses
    NULL elements and NaN to the same NaN, and the two must behave
    differently (NULL element → NULL fold → dropped; NaN element →
    kept-lowest) — so replicating Spark here would need mapInArrow.
    Every caller feeds finite embeddings (testdata and all derived
    frames are NaN-free); the divergence is pinned, not papered over,
    by test_kernel_nan_divergence_documented in
    tests/test_similarity_kernels.py.

    Callers guarantee unique ids per row (vec_id is a key in every
    consumer), matching the expression path's one-row-per-vid argmax.
    """
    import math

    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    # Bounded driver materialization: |cells| ≈ labels/√n by construction
    # (the 25-row-nation-dim precedent); never the corpus.
    rows = centroids.select("cell", "cvec").collect()
    live = []
    for r in rows:
        cv = r["cvec"]
        if cv is None or any(x is None for x in cv):
            continue  # NULL-element fold → NULL _cn → dropped by _cn > 0
        acc = 0.0
        for x in cv:  # same left fold + sqrt as the JVM _cn
            acc = acc + x * x
        if not (math.sqrt(acc) > 0):
            continue
        live.append((r["cell"], list(cv)))
    live.sort(key=lambda t: t[0])

    out_schema = StructType(
        list(emb.schema.fields) + [StructField("cell", LongType(), True)]
    )
    if not live:
        # empty cell set → inner join with an empty broadcast → no rows
        return emb.sparkSession.createDataFrame([], out_schema)
    dim = len(live[0][1])
    if any(len(v) != dim for _, v in live):
        # ragged centroids: mixed NULL/non-NULL csims per row — keep the
        # exact expression semantics rather than replicate them here.
        # Schema normalized to the kernel path's emb.columns + cell
        # (r15 ADVICE: the raw fallback led with vid and dragged along
        # any extra centroid columns, so the same input could yield two
        # different output schemas depending on raggedness).
        return _ivf_assign_expr(
            emb, centroids.select("cell", "cvec"), vec_col
        ).select(*emb.columns, "cell")

    cells = np.array([c for c, _ in live], dtype=np.int64)
    C = np.array([v for _, v in live], dtype=np.float64)  # (c, dim)
    cn = np.zeros(len(live))
    for k in range(dim):
        cn = cn + C[:, k] * C[:, k]
    cn = np.sqrt(cn)
    lowest_cell = int(cells[0])

    def assign(batches):
        for pdf in batches:
            vals = pdf[vec_col].tolist()
            n = len(vals)
            if n == 0:
                continue
            clean = np.empty(n, dtype=bool)
            ragged = np.zeros(n, dtype=bool)
            for i, v in enumerate(vals):
                if v is None:
                    clean[i] = False  # NULL vector → NULL _vn → dropped
                elif len(v) == dim:
                    clean[i] = True
                else:
                    clean[i] = False
                    # ragged fold → NULL csim every cell → lowest cell,
                    # unless its own norm is 0/NULL (then dropped)
                    acc = 0.0
                    ok = True
                    for x in v:
                        if x is None or x != x:
                            ok = False
                            break
                        acc = acc + x * x
                    ragged[i] = ok and math.sqrt(acc) > 0
            cell_out = np.full(n, lowest_cell, dtype=np.int64)
            keep = ragged.copy()
            if clean.any():
                idx = np.nonzero(clean)[0]
                A = np.array([vals[i] for i in idx], dtype=np.float64)
                vn = np.zeros(len(idx))
                for k in range(dim):
                    vn = vn + A[:, k] * A[:, k]
                vn = np.sqrt(vn)
                acc = np.zeros((len(idx), len(cells)))
                for k in range(dim):
                    acc = acc + np.outer(A[:, k], C[:, k])
                with np.errstate(invalid="ignore", divide="ignore"):
                    csim = acc / (vn[:, None] * cn[None, :])
                # vn == 0 or NaN (NULL element) rows drop like _vn > 0;
                # argmax over ascending-cell columns = first max =
                # max_by(csim, -cell)
                alive = vn > 0
                good = idx[alive]
                if len(good):
                    cell_out[good] = cells[np.argmax(csim[alive], axis=1)]
                    keep[good] = True
            out = pdf[keep.tolist()].copy()
            out["cell"] = cell_out[keep]
            yield out

    return emb.mapInPandas(assign, out_schema)


def cosine_topk_ivf(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: corpus and queries are assigned to
    their nearest centroid cell; each query scores ONLY its own cell
    (nprobe=1).  At 100 TB the corpus is written partitioned by cell, so
    a probe touches one partition — candidate generation is the same
    equi-join-on-bucket shape as every other ANN operator here.
    """
    emb = embeddings.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("vvec")
    )
    # NOT checkpointed (round-15 A/B): `assigned` feeds both the query
    # broadcast and the probe side, but materializing the (id, 64-double
    # vec, cell, norm) rows measured ~0.3 s SLOWER than re-running the
    # broadcast-argmax pipeline at sf0.1 — the embedding payload
    # (de)serializes twice to save one map-side NLJ + partial-agg argmax
    # (the dedup_semantic break-even: barriers win when the shared leg
    # stacks shuffles/folds over narrow rows, not one map stage over a
    # wide payload).
    assigned = ivf_assign(emb, centroids).withColumn(
        "vnrm", F.sqrt(dot(F.col("vvec"), F.col("vvec")))
    )
    q = assigned.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), F.col("vvec").alias("qvec"),
        F.col("vnrm").alias("qnrm"), "cell",
    )
    scored = assigned.join(F.broadcast(q), "cell").where(
        F.col("vid") != F.col("qid")
    ).select(
        "qid",
        "vid",
        F.round(
            dot(F.col("qvec"), F.col("vvec")) / (F.col("qnrm") * F.col("vnrm")), 4
        ).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vid", "sim", "rk")
    )
