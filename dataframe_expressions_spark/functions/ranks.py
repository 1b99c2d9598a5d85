"""Distributed rank primitives.

``two_phase_rank`` is the executable 100 TB fallback for
``row_number() OVER (PARTITION BY g ORDER BY key, tie)`` that several
operator docstrings reference (stats_xi_correlation, stats_mann_whitney,
stats_ks_test, text_perplexity_bucket): with few huge groups the native
window funnels each group through ONE task's sort, which stops scaling
long before the shuffle does.  The two-phase shape keeps every task's
sort bounded:

  1. sample per-group quantile cuts of the sort key (one map-side-
     combined aggregate; ``percentile_approx`` sketches merge
     associatively);
  2. range-bucket every row by those cuts (broadcast join + one
     JVM-side array scan per row — all rows with equal keys land in the
     same bucket, so bucketing is consistent with the (key, tie)
     order);
  3. local ``row_number`` within (group, bucket) — n_buckets× more,
     n_buckets× smaller sort partitions;
  4. global rank = local rank + the prefix count of earlier buckets
     (a window over the tiny (group × bucket) count table, broadcast
     back).

The result is EXACT — identical to the native window for every row
regardless of where the sampled cuts land (cut placement only moves
work between buckets, never reorders keys across them), so an operator
can switch paths without touching its oracle.

NULL handling (round-9 ADVICE hardening): native windows keep NULL
partitions and order NULL keys first (Spark ASC default), so this
primitive must too.  The internal joins are null-SAFE on the group
columns (a plain equi-join would silently drop NULL-group rows), and a
NULL ``_cuts`` array (percentile_approx over an all-NULL key group) or a
NULL key comparison buckets to 0 explicitly — matching NULLS FIRST —
instead of leaning on ``legacy.sizeOfNull``'s ``size(NULL) = -1``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["two_phase_rank"]


def _nullsafe_broadcast_join(
    left: DataFrame, right: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Inner broadcast join on ``cols`` with ``eqNullSafe`` equality, so
    NULL group values pair up exactly like a window PARTITION BY would
    group them (one partition per distinct value, NULL included)."""
    renamed = right
    for c in cols:
        renamed = renamed.withColumnRenamed(c, f"_r_{c}")
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_r_{c}"))
    return left.join(F.broadcast(renamed), cond).drop(
        *[f"_r_{c}" for c in cols]
    )


def two_phase_rank(
    df: DataFrame,
    grp_cols: Sequence[str],
    key_col: str,
    tie_col: str,
    rank_name: str = "r",
    n_buckets: int = 32,
) -> DataFrame:
    """``df`` plus a bigint ``rank_name`` column equal to
    ``row_number() OVER (PARTITION BY grp_cols ORDER BY key_col,
    tie_col)``, computed with per-task sorts bounded by ~|group| /
    n_buckets instead of |group|.  ``tie_col`` must be unique within a
    group (the usual deterministic tie-break discipline)."""
    gc = list(grp_cols)
    if n_buckets < 2:
        # degenerate single bucket: percentile_approx with an EMPTY
        # percentage list returns NULL cuts, a NULL bucket, and an
        # equi-join that silently drops every row (caught by the
        # hypothesis property test, round 8) — bucket 0 directly instead
        b = df.withColumn("_bkt", F.lit(0))
    else:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = df.groupBy(*gc).agg(
            F.percentile_approx(key_col, qs, 10_000).alias("_cuts")
        )
        # strict `cut < key`: rows whose key EQUALS a cut all take the
        # lower bucket, so equal keys can never straddle a bucket
        # boundary and the (key, tie) tie-break stays entirely inside
        # one local sort.  NULL cuts (all-NULL key group) and NULL keys
        # (compare to cut -> NULL -> filtered out) both bucket to 0 —
        # Spark ASC windows order NULLS FIRST, so bucket 0 is where a
        # NULL key belongs.
        b = (
            _nullsafe_broadcast_join(df, cuts, gc)
            .withColumn(
                "_bkt",
                F.when(
                    F.col("_cuts").isNull() | F.col(key_col).isNull(),
                    F.lit(0),
                )
                .otherwise(
                    F.size(F.filter("_cuts", lambda c: c < F.col(key_col)))
                )
                .cast("int"),
            )
            .drop("_cuts")
        )
    counts = b.groupBy(*gc, "_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = (
        W.partitionBy(*gc)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *gc,
        "_bkt",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0))
        .cast("long")
        .alias("_off"),
    )
    local = F.row_number().over(
        W.partitionBy(*gc, "_bkt").orderBy(key_col, tie_col)
    )
    return (
        _nullsafe_broadcast_join(b, offsets, gc + ["_bkt"])
        .withColumn(rank_name, (F.col("_off") + local).cast("long"))
        .drop("_bkt", "_off")
    )
