"""Round-15 kernel-equality pins for the vectorized IVF assignment.

ivf_assign (functions/similarity.py) replays the broadcast-NLJ cosine
argmax in one numpy ``mapInPandas`` pass; the assignment is load-bearing
for four oracle-hash-checked ids (sim_search_ivf, sim_search_ivf_pq,
emb_knn_graph, emb_ivf_balance_audit), so this module pins the kernel
row-for-row against the retained expression path (``_ivf_assign_expr``)
on

  1. real testdata embeddings with real decimal-folded centroids, and
  2. an adversarial frame hitting every documented edge: zero-norm and
     NULL vectors (dropped), NULL-element vectors (NULL fold -> dropped),
     ragged rows (NULL csim for every cell -> lowest live cell),
     exact-duplicate centroids (csim tie -> lowest cell), zero-norm and
     NULL centroids (dropped from the cell set), and underflow/overflow
     magnitudes (pure IEEE, same fold order both paths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframe_expressions_spark.functions import similarity as S
from dataframe_expressions_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _centroids(spark, sf_dir):
    from dataframe_expressions_spark.operators.tier3 import emb_centroid

    return (
        emb_centroid(spark, sf_dir)
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("label").cast("long").alias("cell"),
            F.transform("pc", lambda p: p["c"]).alias("cvec"),
        )
    )


def _rows(df):
    return sorted(
        (r["vid"], tuple(r["vvec"]) if r["vvec"] is not None else None, r["cell"])
        for r in df.collect()
    )


def test_kernel_matches_expression_path_on_testdata(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("vvec"),
    )
    cent = _centroids(spark, SF_DIR)
    got = _rows(S.ivf_assign(emb, cent))
    want = _rows(S._ivf_assign_expr(emb, cent))
    assert got == want
    assert len(got) > 0


def test_kernel_matches_expression_path_on_adversarial_frame(spark):
    dim = 8
    rows = [
        (0, [0.0] * dim),                         # zero norm -> dropped
        (1, None),                                # NULL vector -> dropped
        (2, [1.0] * (dim - 1) + [None]),          # NULL element -> dropped
        (3, [0.5] * (dim + 3)),                   # ragged -> lowest cell
        (4, [0.5] * (dim - 2)),                   # ragged -> lowest cell
        (5, [1e-30] * dim),                       # underflow magnitudes
        (6, [1e2 if i == 0 else 0.0 for i in range(dim)]),
        (7, [(-1.0) ** i for i in range(dim)]),   # alternating signs
        (8, [0.1 * (i % 5) for i in range(dim)]),  # csim tie across the
        (9, [0.1 * (i % 5) for i in range(dim)]),  # duplicated centroids
    ]
    cents = [
        (11, [0.1 * (i % 5) for i in range(dim)]),  # duplicate pair a
        (7, [0.1 * (i % 5) for i in range(dim)]),   # duplicate pair b
        (5, [1.0] + [0.0] * (dim - 1)),
        (13, [0.0] * dim),                          # zero norm -> dropped
        (17, None),                                 # NULL -> dropped
    ]
    emb = spark.createDataFrame(rows, "vid long, vvec array<double>")
    cent = spark.createDataFrame(cents, "cell long, cvec array<double>")
    got = _rows(S.ivf_assign(emb, cent))
    want = _rows(S._ivf_assign_expr(emb, cent))
    assert got == want
    # the ragged rows land in the lowest LIVE cell on both paths
    ragged = {vid: cell for vid, _, cell in got if vid in (3, 4)}
    assert ragged == {3: 5, 4: 5}


def test_kernel_nan_divergence_documented(spark):
    """r15 ADVICE (similarity.py): a dim-matching NaN-element vector is
    the ONE input where kernel and expression path legitimately diverge
    — Spark sorts NaN above every value so ``_vn > 0`` keeps the row
    (lowest live cell via the all-NaN csim tie-break) while the numpy
    ``vn > 0`` drops it, and mapInPandas cannot repair it (Arrow folds
    NULL elements and NaN together, yet the two must differ).  This
    test PINS the documented divergence instead of letting the
    docstring claim equality; every production caller is NaN-free."""
    nan = float("nan")
    emb = spark.createDataFrame(
        [(0, [nan, 1.0, 1.0, 1.0]), (1, [1.0, 0.0, 0.0, 0.0])],
        "vid long, vvec array<double>",
    )
    cent = spark.createDataFrame(
        [(3, [1.0, 0.0, 0.0, 0.0]), (5, [0.0, 1.0, 0.0, 0.0])],
        "cell long, cvec array<double>",
    )
    got = _rows(S.ivf_assign(emb, cent))
    want = _rows(S._ivf_assign_expr(emb, cent))
    # the finite row agrees on both paths ...
    assert [r for r in got if r[0] == 1] == [r for r in want if r[0] == 1]
    # ... the NaN row is the documented divergence: expression path
    # keeps it in the lowest live cell, the kernel drops it
    assert [(vid, cell) for vid, _, cell in want if vid == 0] == [(0, 3)]
    assert [r for r in got if r[0] == 0] == []


def test_kernel_empty_and_ragged_centroid_fallback(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vid long, vvec array<double>"
    )
    # empty live cell set -> zero rows (inner join with empty broadcast)
    none_live = spark.createDataFrame(
        [(1, [0.0, 0.0])], "cell long, cvec array<double>"
    )
    assert S.ivf_assign(emb, none_live).count() == 0
    # ragged centroid lengths route to the expression path wholesale
    ragged_cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "cell long, cvec array<double>",
    )
    got = _rows(S.ivf_assign(emb, ragged_cents))
    want = _rows(S._ivf_assign_expr(emb, ragged_cents))
    assert got == want
