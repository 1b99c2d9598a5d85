"""Tier 8 — round-7 extension block.

Resampling & time-series statistics: Poisson-bootstrap confidence
intervals (the scale-correct bootstrap — per-row Poisson weights, never
a resample-N-rows shuffle), weekly seasonal decomposition, Chatterjee
xi rank correlation.  Data-quality & splits: snapshot column-drift
audit, walk-forward temporal splits with an embargo gap.  Retrieval &
curation: MMR diversified top-k, label-graded NDCG ranking audit,
cross-document line/chunk boilerplate removal, diagonal embedding
whitening, time-bounded conversion funnel.

Reference parity note: gordonwatts/dataframe_expressions is a
capture-only front end (no engine, ~1.2 kLoC; see SURVEY.md §1), so
every operator here is extension scope — the workloads a Spark-backed
engine for 100 TB training-data pipelines needs, each expressed
Spark-first and oracle-checked like tiers 2–7.

Oracle discipline (same as tier5–7): BIGINT casts on counts; doubles
rounded per-term to a fixed scale in GROUP-sized tables, then
DECIMAL-folded so final sums are partition-order independent and
bit-identical across engines; identical aliases both sides; the
portable LCG / char fingerprint wherever deterministic
pseudo-randomness is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF
from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval on mean order value
# ---------------------------------------------------------------------------

# Number of bootstrap replicates.  64 keeps the oracle's cross join
# cheap while giving a usable percentile grid (rank 2 / rank 63 ≈ the
# 2.5 / 97.5 percentiles).
_BOOT_B = 64

# Inverse-CDF thresholds for Poisson(1): P(W <= k) for k = 0..4.  A
# uniform u below threshold k (first match) yields weight k; u beyond
# the last threshold yields 5.  Written as literal decimals so Spark
# and DuckDB parse the exact same doubles.
_POIS_CDF = (
    "0.36787944117144233",  # k=0
    "0.7357588823428847",  # k=1
    "0.9196986029286058",  # k=2
    "0.9810118431238462",  # k=3
    "0.9963401531726563",  # k=4
)


def _pois_weight_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"(CASE {cases} ELSE 5 END)"


@query(
    "stats_bootstrap_ci",
    f"""
    WITH reps AS (SELECT CAST(range AS BIGINT) AS b FROM range({_BOOT_B})),
    w AS (SELECT b,
                 CAST(o_totalprice AS DECIMAL(38,6)) AS x,
                 {_pois_weight_sql(
                     "(CAST(((o_orderkey * " + str(_BOOT_B)
                     + " + b) % 2147483647) * 1103515245 + 12345 AS BIGINT)"
                     " % 2147483647) / 2147483647.0"
                 )} AS wt
          FROM orders CROSS JOIN reps),
    means AS (SELECT b,
                     round(CAST(sum(wt * x) AS DOUBLE)
                           / CAST(sum(wt) AS DOUBLE), 6) AS m
              FROM w GROUP BY b),
    ranked AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn
               FROM means),
    spread AS (SELECT CAST(sum(CAST(m AS DECIMAL(38,6))) AS DECIMAL(38,6))
                        AS sm,
                      CAST(sum(CAST(m AS DECIMAL(38,6))
                               * CAST(m AS DECIMAL(38,6)))
                           AS DECIMAL(38,12)) AS sm2
               FROM means),
    pt AS (SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                             AS DOUBLE) / count(*), 6) AS est,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders)
    SELECT pt.est AS point_est, pt.n AS n_rows,
           CAST({_BOOT_B} AS BIGINT) AS n_reps,
           (SELECT m FROM ranked WHERE rn = 2) AS ci_lo,
           (SELECT m FROM ranked WHERE rn = {_BOOT_B - 1}) AS ci_hi,
           round(CAST(sqrt(({_BOOT_B} * CAST(sm2 AS DOUBLE)
                            - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                           / ({_BOOT_B} * ({_BOOT_B} - 1))) AS DOUBLE), 6)
             AS boot_se
    FROM pt CROSS JOIN spread
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> SDF:
    """POISSON BOOTSTRAP confidence interval for mean(o_totalprice):
    each row contributes an independent Poisson(1)-distributed weight to
    each of B=64 replicates (deterministic portable LCG on
    (o_orderkey, b) through the exact Poisson inverse-CDF thresholds),
    each replicate's weighted mean is one bootstrap draw, and the CI is
    the rank-2 / rank-63 order statistics of the 64 draws — the
    streaming-safe bootstrap used for CIs over datasets too large to
    resample by row (resample-with-replacement would shuffle N×B rows;
    Poisson weighting shuffles B partial aggregates per task).

    Determinism: the LCG key is reduced mod 2^31-1 BEFORE the multiply
    so the arithmetic stays far inside BIGINT at any orderkey scale;
    weights are exact ints; each replicate mean is DECIMAL-weighted-sum
    ÷ BIGINT-count rounded to 6dp, so the order statistics and the
    DECIMAL-folded bootstrap SE are bit-identical across engines.

    Scale: the ×64 replicate expansion happens map-side (posexplode of
    a literal sequence) and collapses immediately into per-task partial
    aggregates — the one shuffle carries ≤ 64 rows per task regardless
    of corpus size; ranking the 64 replicate means is an
    aggregate-sized window.  At 100 TB this is exactly the plan you
    want: no row-level resample materialization, no skew (64 uniform
    groups)."""
    o = load_table(spark, sf_dir, "orders")
    u = (
        (
            ((F.col("o_orderkey") * _BOOT_B + F.col("b")) % 2147483647)
            * 1103515245
            + 12345
        )
        % 2147483647
    ) / 2147483647.0
    wt = F.when(u < float(_POIS_CDF[0]), 0)
    for k, t in enumerate(_POIS_CDF[1:], start=1):
        wt = wt.when(u < float(t), k)
    wt = wt.otherwise(5)
    w = (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(38,6)").alias("x"),
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .withColumn("wt", wt)
    )
    means = w.groupBy("b").agg(
        F.round(
            F.sum(F.col("wt") * F.col("x")).cast("double")
            / F.sum("wt").cast("double"),
            6,
        ).alias("m")
    )
    ranked = means.select(
        "m", F.row_number().over(W.orderBy("m", "b")).alias("rn")
    )
    lo = ranked.where(F.col("rn") == 2).select(F.col("m").alias("ci_lo"))
    hi = ranked.where(F.col("rn") == _BOOT_B - 1).select(
        F.col("m").alias("ci_hi")
    )
    spread = means.agg(
        F.sum(F.col("m").cast("decimal(38,6)")).alias("sm"),
        F.sum(
            F.col("m").cast("decimal(38,6)") * F.col("m").cast("decimal(38,6)")
        )
        .cast("decimal(38,12)")
        .alias("sm2"),
    )
    pt = o.agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("point_est"),
        F.count("*").cast("long").alias("n_rows"),
    )
    b = float(_BOOT_B)
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(spread))
        .select(
            "point_est",
            "n_rows",
            F.lit(_BOOT_B).cast("long").alias("n_reps"),
            "ci_lo",
            "ci_hi",
            F.round(
                F.sqrt(
                    (
                        b * F.col("sm2").cast("double")
                        - F.col("sm").cast("double")
                        * F.col("sm").cast("double")
                    )
                    / (b * (b - 1.0))
                ),
                6,
            ).alias("boot_se"),
        )
    )


# ---------------------------------------------------------------------------
# weekly seasonal decomposition of the daily event series
# ---------------------------------------------------------------------------

# Fixed Monday anchor for a portable day-of-week: (datediff from a known
# Monday) mod 7 → 0=Mon..6=Sun, identical integer arithmetic in both
# engines (engine-native dayofweek() disagrees on week start).
_MONDAY_EPOCH = "1995-01-02"


@query(
    "stats_seasonal_decompose",
    f"""
    WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                          CAST(count(*) AS BIGINT) AS x
                   FROM events GROUP BY 1),
    tr AS (SELECT day, x,
                  ((CAST(datediff('day', DATE '{_MONDAY_EPOCH}', day)
                         AS BIGINT) % 7) + 7) % 7 AS dow,
                  CAST(sum(x) OVER w7 AS BIGINT) AS s7,
                  CAST(count(*) OVER w7 AS BIGINT) AS n7
           FROM daily
           WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                         AND 3 FOLLOWING)),
    det AS (SELECT dow,
                   CAST(round(x - CAST(s7 AS DOUBLE) / 7, 6)
                        AS DECIMAL(38,6)) AS d
            FROM tr WHERE n7 = 7),
    raw AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_obs,
                   round(CAST(sum(d) AS DOUBLE) / count(*), 6) AS s_raw
            FROM det GROUP BY dow),
    ctr AS (SELECT round(CAST(sum(CAST(s_raw AS DECIMAL(38,6)))
                               AS DOUBLE) / 7, 6) AS g
            FROM raw)
    SELECT CAST(dow AS BIGINT) AS dow, n_obs,
           round(s_raw - g, 6) AS seasonal_idx
    FROM raw CROSS JOIN ctr
    """,
)
def stats_seasonal_decompose(spark: SparkSession, sf_dir: str) -> SDF:
    """Weekly SEASONAL DECOMPOSITION of the daily event-count series
    (classical additive decomposition, the STL precursor): trend = the
    centered 7-day moving average (only where the window holds a full 7
    days, so boundary days never bias the trend), detrended = count −
    trend, and the per-day-of-week seasonal index = mean(detrended)
    re-centered to sum to zero across the week — the "is Monday
    systematically quiet" decomposition behind every traffic dashboard.

    Determinism: day-of-week is fixed-anchor integer arithmetic
    (datediff from a known Monday, double-mod for negatives) — never
    the engine-native dayofweek(), which disagrees on week start; the
    trend division is an exact BIGINT-sum ÷ 7; detrended values are
    rounded to 6dp and DECIMAL-folded before the per-dow mean so the
    fold is partition-order independent.

    Scale: the daily rollup is the only data-sized shuffle (map-side
    partials → one group per calendar day); the moving-average window
    and the 7-row seasonal table are aggregate-sized.  An unpartitioned
    ORDER BY day window is safe because its input is the daily
    aggregate (365 rows/year), never the event stream."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "x",
        (
            (
                (
                    F.datediff(F.col("day"), F.lit(_MONDAY_EPOCH).cast("date"))
                    .cast("long")
                    % 7
                )
                + 7
            )
            % 7
        ).alias("dow"),
        F.sum("x").over(w7).cast("long").alias("s7"),
        F.count("*").over(w7).cast("long").alias("n7"),
    )
    det = tr.where(F.col("n7") == 7).select(
        "dow",
        F.round(F.col("x") - F.col("s7").cast("double") / 7, 6)
        .cast("decimal(38,6)")
        .alias("d"),
    )
    raw = det.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.round(F.sum("d").cast("double") / F.count("*"), 6).alias("s_raw"),
    )
    ctr = raw.agg(
        F.round(
            F.sum(F.col("s_raw").cast("decimal(38,6)")).cast("double") / 7, 6
        ).alias("g")
    )
    return raw.crossJoin(F.broadcast(ctr)).select(
        F.col("dow").cast("long").alias("dow"),
        "n_obs",
        F.round(F.col("s_raw") - F.col("g"), 6).alias("seasonal_idx"),
    )


# ---------------------------------------------------------------------------
# Chatterjee xi rank correlation, grouped by order priority
# ---------------------------------------------------------------------------


@query(
    "stats_xi_correlation",
    """
    WITH o AS (SELECT o_orderpriority AS grp, o_orderkey,
                      CAST(datediff('day', DATE '1995-01-01',
                                    CAST(o_orderdate AS DATE)) AS BIGINT)
                        AS xd,
                      o_totalprice AS y
               FROM orders),
    rk AS (SELECT grp, xd, o_orderkey,
                  row_number() OVER (PARTITION BY grp
                                     ORDER BY y, o_orderkey) AS r
           FROM o),
    seq AS (SELECT grp, r,
                   lag(r) OVER (PARTITION BY grp
                                ORDER BY xd, o_orderkey) AS pr
            FROM rk),
    s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(abs(r - pr)) AS BIGINT) AS sdiff
          FROM seq GROUP BY grp)
    SELECT grp, n, sdiff,
           round(1.0 - 3.0 * sdiff / (CAST(n AS DOUBLE) * n - 1), 6) AS xi
    FROM s
    """,
)
def stats_xi_correlation(spark: SparkSession, sf_dir: str) -> SDF:
    """CHATTERJEE'S XI rank correlation (Chatterjee 2021) between order
    date and order value, per priority class: sort each group by X
    (date), take the Y-ranks r_i along that order, and xi = 1 − 3·Σ|r_{i+1}
    − r_i| / (n² − 1) — the modern dependence coefficient that detects
    ANY functional relationship (not just monotone, unlike Spearman) and
    is built entirely from ranks, so it is exactly mirrorable.

    Determinism: ties in X and Y are both broken by o_orderkey (the
    standard randomized-tie-break variant made deterministic), so both
    rank sequences — and hence Σ|Δr|, an exact BIGINT — are identical
    across engines; the final xi is one double expression on exact ints.

    Scale: two rank windows per group partition — the same grouped-sort
    shape as stats_mann_whitney/stats_ks_test; with few huge groups the
    per-group sort is the bottleneck and the two-phase range-partitioned
    rank (sample quantile cuts → per-range local ranks + offset) is the
    documented 100 TB fallback.  The final reduce is one shuffle to
    |groups| rows with map-side partials."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("long")
        .alias("xd"),
        F.col("o_totalprice").alias("y"),
    )
    rk = o.select(
        "grp",
        "xd",
        "o_orderkey",
        F.row_number()
        .over(W.partitionBy("grp").orderBy("y", "o_orderkey"))
        .alias("r"),
    )
    seq = rk.select(
        "grp",
        "r",
        F.lag("r")
        .over(W.partitionBy("grp").orderBy("xd", "o_orderkey"))
        .alias("pr"),
    )
    return (
        seq.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.abs(F.col("r") - F.col("pr"))).cast("long").alias("sdiff"),
        )
        .select(
            "grp",
            "n",
            "sdiff",
            F.round(
                1.0
                - 3.0
                * F.col("sdiff")
                / (F.col("n").cast("double") * F.col("n") - 1),
                6,
            ).alias("xi"),
        )
    )


# ---------------------------------------------------------------------------
# snapshot column-drift audit (early vs late order cohorts)
# ---------------------------------------------------------------------------

# Fixed snapshot boundary: orders span 1995-01..2001-08, so this cuts
# the table into two multi-year cohorts at any scale factor.
_DRIFT_CUT = "1998-01-01"


@query(
    "dq_snapshot_drift",
    f"""
    WITH base AS (SELECT CASE WHEN CAST(o_orderdate AS DATE)
                                   < DATE '{_DRIFT_CUT}'
                              THEN 'early' ELSE 'late' END AS snap,
                         o_totalprice, o_orderstatus, o_orderpriority
                  FROM orders),
    prof AS (
      SELECT snap, 'o_totalprice' AS col,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (o_totalprice IS NULL) AS BIGINT)
               AS n_null,
             CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                        AS DOUBLE) / count(o_totalprice), 6) AS mean_val
      FROM base GROUP BY snap
      UNION ALL
      SELECT snap, 'o_orderstatus', CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (o_orderstatus IS NULL) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT), NULL
      FROM base GROUP BY snap
      UNION ALL
      SELECT snap, 'o_orderpriority', CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (o_orderpriority IS NULL) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT), NULL
      FROM base GROUP BY snap),
    wide AS (SELECT col,
                    max(CASE WHEN snap = 'early' THEN n END) AS n_early,
                    max(CASE WHEN snap = 'late' THEN n END) AS n_late,
                    max(CASE WHEN snap = 'early' THEN n_null END)
                      AS null_early,
                    max(CASE WHEN snap = 'late' THEN n_null END)
                      AS null_late,
                    max(CASE WHEN snap = 'early' THEN n_distinct END)
                      AS dist_early,
                    max(CASE WHEN snap = 'late' THEN n_distinct END)
                      AS dist_late,
                    max(CASE WHEN snap = 'early' THEN mean_val END)
                      AS mean_early,
                    max(CASE WHEN snap = 'late' THEN mean_val END)
                      AS mean_late
             FROM prof GROUP BY col)
    SELECT col, n_early, n_late, null_early, null_late,
           dist_early, dist_late, mean_early, mean_late,
           round(coalesce(abs(mean_late - mean_early)
                          / nullif(abs(mean_early), 0), 0), 6)
             AS mean_rel_drift,
           CASE WHEN dist_early != dist_late
                     OR coalesce(abs(mean_late - mean_early)
                                 / nullif(abs(mean_early), 0), 0) > 0.05
                THEN 1 ELSE 0 END AS drift_flag
    FROM wide
    """,
)
def dq_snapshot_drift(spark: SparkSession, sf_dir: str) -> SDF:
    """SNAPSHOT COLUMN-DRIFT audit: profile the same columns over two
    cohorts of one table (orders before/after a fixed boundary — the
    "yesterday's load vs today's load" comparison every ingestion
    pipeline runs) and emit a per-column drift report: row count, null
    count, distinct count, mean (numeric only), relative mean drift and
    a drift flag (cardinality changed, or mean moved > 5%).
    Complements stats_psi_drift (distribution shape) and
    profile_columns (single-snapshot profile) with the cross-snapshot
    schema-stat comparison.

    Determinism: counts and distincts are exact BIGINTs; the numeric
    mean is a DECIMAL-folded sum ÷ count rounded to 6dp; the
    early/late pivot is a max-over-two-rows on disjoint CASE branches.

    Scale: one pass over the fact table computing BOTH cohorts' partial
    aggregates (the snap key rides the scan — no self-join of two
    filtered reads); count(DISTINCT) over a high-cardinality column is
    the expensive term, executed as Spark's two-phase distinct expand —
    swap for approx_count_distinct at 100 TB if exactness is not
    contractual (agg_approx_distinct is that path).  The pivot acts on
    a 6-row frame."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "snap",
        F.when(
            F.col("o_orderdate").cast("date")
            < F.lit(_DRIFT_CUT).cast("date"),
            "early",
        ).otherwise("late"),
    )

    def _prof(col: str, numeric: bool) -> SDF:
        mean_val = (
            F.round(
                F.sum(F.col(col).cast("decimal(38,6)")).cast("double")
                / F.count(col),
                6,
            )
            if numeric
            else F.lit(None).cast("double")
        )
        return (
            o.groupBy("snap")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.count_if(F.col(col).isNull()).cast("long").alias("n_null"),
                F.countDistinct(col).cast("long").alias("n_distinct"),
                mean_val.alias("mean_val"),
            )
            .withColumn("col", F.lit(col))
        )

    prof = (
        _prof("o_totalprice", True)
        .unionByName(_prof("o_orderstatus", False))
        .unionByName(_prof("o_orderpriority", False))
    )
    wide = prof.groupBy("col").agg(
        F.max(F.when(F.col("snap") == "early", F.col("n"))).alias("n_early"),
        F.max(F.when(F.col("snap") == "late", F.col("n"))).alias("n_late"),
        F.max(F.when(F.col("snap") == "early", F.col("n_null"))).alias(
            "null_early"
        ),
        F.max(F.when(F.col("snap") == "late", F.col("n_null"))).alias(
            "null_late"
        ),
        F.max(F.when(F.col("snap") == "early", F.col("n_distinct"))).alias(
            "dist_early"
        ),
        F.max(F.when(F.col("snap") == "late", F.col("n_distinct"))).alias(
            "dist_late"
        ),
        F.max(F.when(F.col("snap") == "early", F.col("mean_val"))).alias(
            "mean_early"
        ),
        F.max(F.when(F.col("snap") == "late", F.col("mean_val"))).alias(
            "mean_late"
        ),
    )
    rel = F.coalesce(
        F.abs(F.col("mean_late") - F.col("mean_early"))
        / F.nullif(F.abs(F.col("mean_early")), F.lit(0.0)),
        F.lit(0.0),
    )
    return wide.select(
        "col",
        "n_early",
        "n_late",
        "null_early",
        "null_late",
        "dist_early",
        "dist_late",
        "mean_early",
        "mean_late",
        F.round(rel, 6).alias("mean_rel_drift"),
        F.when(
            (F.col("dist_early") != F.col("dist_late")) | (rel > 0.05), 1
        )
        .otherwise(0)
        .alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# walk-forward temporal splits with an embargo gap
# ---------------------------------------------------------------------------

_TS_EPOCH = "1995-01-01"  # corpus min order date (fixture contract)
_TS_FOLDS = 4
_TS_EMBARGO_DAYS = 7


@query(
    "data_temporal_split",
    f"""
    WITH d AS (SELECT CAST(datediff('day', DATE '{_TS_EPOCH}',
                                    CAST(o_orderdate AS DATE)) AS BIGINT)
                        AS day_no,
                      CAST(o_totalprice AS DECIMAL(38,6)) AS price
               FROM orders),
    span AS (SELECT min(day_no) AS d0, max(day_no) AS d1 FROM d),
    folds AS (SELECT CAST(range AS BIGINT) + 1 AS fold
              FROM range({_TS_FOLDS})),
    bounds AS (SELECT fold,
                      d0 + fold * CAST(floor((d1 - d0)
                                             / {_TS_FOLDS + 1}.0) AS BIGINT)
                        AS train_end,
                      d0 + fold * CAST(floor((d1 - d0)
                                             / {_TS_FOLDS + 1}.0) AS BIGINT)
                        + {_TS_EMBARGO_DAYS} AS test_start,
                      d0 + (fold + 1) * CAST(floor((d1 - d0)
                                             / {_TS_FOLDS + 1}.0) AS BIGINT)
                        AS test_end
               FROM folds CROSS JOIN span)
    SELECT b.fold, b.train_end, b.test_start, b.test_end,
           CAST(count(*) FILTER (d.day_no < b.train_end) AS BIGINT)
             AS train_n,
           CAST(count(*) FILTER (d.day_no >= b.test_start
                                 AND d.day_no < b.test_end) AS BIGINT)
             AS test_n,
           CAST(count(*) FILTER (d.day_no >= b.train_end
                                 AND d.day_no < b.test_start) AS BIGINT)
             AS embargoed_n,
           CAST(max(CASE WHEN d.day_no < b.train_end
                         THEN d.day_no END) AS BIGINT) AS max_train_day,
           CAST(min(CASE WHEN d.day_no >= b.test_start
                              AND d.day_no < b.test_end
                         THEN d.day_no END) AS BIGINT) AS min_test_day,
           round(CAST(sum(CASE WHEN d.day_no >= b.test_start
                                    AND d.day_no < b.test_end
                               THEN price END) AS DOUBLE), 2)
             AS test_revenue
    FROM d CROSS JOIN bounds b
    GROUP BY b.fold, b.train_end, b.test_start, b.test_end
    """,
)
def data_temporal_split(spark: SparkSession, sf_dir: str) -> SDF:
    """WALK-FORWARD temporal cross-validation splits with an EMBARGO
    gap (the de-leaked backtest protocol from financial ML, e.g. López
    de Prado's purged CV): k=4 expanding-window folds over the order
    timeline, each train set ending at a fold boundary, a 7-day embargo
    dropped, and the next timeline slice as the test set.  The output
    verifies the protocol IN the result — max train day vs min test day
    per fold shows the embargo held (their gap ≥ 7), embargoed_n counts
    what the gap discarded.

    Determinism: everything is integer day-number arithmetic from a
    fixed epoch (dates never cross an engine boundary as timestamps);
    fold boundaries are integer division of the observed span; revenue
    is DECIMAL-folded then rounded.

    Scale: day_no is a map-side expression on the fact scan; the ×k
    fold expansion is a broadcast cross join against a k-row bounds
    frame (never a shuffle of the fact table per fold), and all fold
    membership tests collapse into per-task partial aggregates — one
    shuffle, k groups.  This is the 100 TB-safe shape: k passes over
    cached data replaced by one pass with k conditional aggregates."""
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_TS_EPOCH).cast("date")
        )
        .cast("long")
        .alias("day_no"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("price"),
    )
    span = o.agg(
        F.min("day_no").alias("d0"), F.max("day_no").alias("d1")
    )
    folds = spark.range(1, _TS_FOLDS + 1).select(
        F.col("id").cast("long").alias("fold")
    )
    seg = (F.col("d1") - F.col("d0")) / F.lit(_TS_FOLDS + 1)
    bounds = folds.crossJoin(F.broadcast(span)).select(
        "fold",
        (F.col("d0") + F.col("fold") * F.floor(seg)).alias("train_end"),
        (
            F.col("d0")
            + F.col("fold") * F.floor(seg)
            + F.lit(_TS_EMBARGO_DAYS)
        ).alias("test_start"),
        (F.col("d0") + (F.col("fold") + 1) * F.floor(seg)).alias("test_end"),
    )
    j = o.crossJoin(F.broadcast(bounds))
    in_train = F.col("day_no") < F.col("train_end")
    in_test = (F.col("day_no") >= F.col("test_start")) & (
        F.col("day_no") < F.col("test_end")
    )
    in_embargo = (F.col("day_no") >= F.col("train_end")) & (
        F.col("day_no") < F.col("test_start")
    )
    return j.groupBy("fold", "train_end", "test_start", "test_end").agg(
        F.count_if(in_train).cast("long").alias("train_n"),
        F.count_if(in_test).cast("long").alias("test_n"),
        F.count_if(in_embargo).cast("long").alias("embargoed_n"),
        F.max(F.when(in_train, F.col("day_no"))).cast("long").alias(
            "max_train_day"
        ),
        F.min(F.when(in_test, F.col("day_no"))).cast("long").alias(
            "min_test_day"
        ),
        F.round(
            F.sum(F.when(in_test, F.col("price"))).cast("double"), 2
        ).alias("test_revenue"),
    )
