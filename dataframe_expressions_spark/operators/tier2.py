"""Tier 2 — relational capability extensions (SURVEY.md §2 #15–#31).

These do not exist in the reference (it is a capture front-end with no
engine — reference: README scope statement); they are the relational
surface the north star mandates, expressed declaratively on Spark
built-ins so Catalyst/AQE owns the physical strategy.

Determinism discipline (driver hash-matches DuckDB):

* Double-typed SUM/AVG aggregate in DECIMAL(38,6) then cast to double —
  exact and independent of partition/merge order on BOTH engines.  A raw
  double sum drifts in the last ulps with partition count, which would
  make results nondeterministic on a real cluster anyway.
* Every ranking window carries a unique tie-break key.
* Count-like outputs cast to bigint to match SQL COUNT.

Scale notes per query are inline — each states its shuffle/broadcast
strategy and why the plan survives a 1000-executor 100 TB run.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame as SDF
from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dedup import spread
from ..sources.tables import load_table
from .registry import query

_DEC = "decimal(38,6)"


def _dsum(col) -> F.Column:
    """Exact order-independent sum of a double expression → double."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.sum(c.cast(_DEC)).cast("double")


# ---------------------------------------------------------------------------
# 15 — source scan (parquet → count; csv/json round-trips in tests)
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    "SELECT (SELECT count(*) FROM lineitem) AS n_lineitem, "
    "(SELECT count(*) FROM orders) AS n_orders, "
    "(SELECT count(*) FROM events) AS n_events",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: count(*) over parquet reads footers/row-group stats only —
    no full materialization at any SF.  The three counts cross-join into
    ONE job (each .count() action was a separate driver round-trip)."""

    def n(table: str, alias: str) -> SDF:
        return load_table(spark, sf_dir, table).agg(
            F.count(F.lit(1)).alias(alias)
        )

    return (
        n("lineitem", "n_lineitem")
        .crossJoin(n("orders", "n_orders"))
        .crossJoin(n("events", "n_events"))
    )


# ---------------------------------------------------------------------------
# 16 — equi inner join (fact ⋈ fact-side dim)
# ---------------------------------------------------------------------------


@query(
    "join_inner_hash",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: both sides shuffle-partition on the join key (sort-merge or
    shuffled-hash per AQE stats); at 100 TB pre-bucketing both tables by
    orderkey makes this shuffle-free."""
    lin = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return lin.join(orders, lin.l_orderkey == orders.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "o_totalprice", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# 17 — broadcast join (small dims)
# ---------------------------------------------------------------------------


@query(
    "join_broadcast",
    """
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: nation (25) and region (5) are broadcast — zero shuffle of
    the big customer side at any SF; explicitly hinted so the plan cannot
    regress to sort-merge when stats are stale."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


# ---------------------------------------------------------------------------
# 18 — left semi + anti (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------


@query(
    "join_left_semi_anti",
    """
    SELECT 'semi' AS kind, c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'anti' AS kind, c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_left_semi_anti(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: semi/anti joins shuffle only the key column of the probe
    side; Spark builds on the (smaller) distinct key set."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    on = cust.c_custkey == orders.o_custkey
    semi = cust.join(orders, on, "left_semi").select(
        F.lit("semi").alias("kind"), "c_custkey"
    )
    anti = cust.join(orders, on, "left_anti").select(
        F.lit("anti").alias("kind"), "c_custkey"
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# 19 — left outer join
# ---------------------------------------------------------------------------


@query(
    "join_outer",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> SDF:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    """
    SELECT n.n_nationkey, n.n_name, s.s_suppkey
    FROM nation n FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> SDF:
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


# ---------------------------------------------------------------------------
# 20 — range/theta join (time-proximity self-join)
# ---------------------------------------------------------------------------


@query(
    "join_range_theta",
    """
    SELECT x.event_id AS a, y.event_id AS b
    FROM events x JOIN events y
      ON x.user_id = y.user_id
     AND CAST(y.ts AS TIMESTAMP) >  CAST(x.ts AS TIMESTAMP)
     AND CAST(y.ts AS TIMESTAMP) <= CAST(x.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: the equi part (user_id) drives the shuffle; the range
    predicate evaluates post-match inside each key group, so this stays a
    hash/sort-merge join — never a cartesian.  Skewed users are split by
    AQE skew-join."""
    ev = load_table(spark, sf_dir, "events")
    x, y = ev.alias("x"), ev.alias("y")
    return (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("y.ts") > F.col("x.ts"))
            & (F.col("y.ts") <= F.col("x.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(F.col("x.event_id").alias("a"), F.col("y.event_id").alias("b"))
    )


# ---------------------------------------------------------------------------
# 21 — hash aggregation, multi-measure (TPC-H Q1 — the flagship)
# ---------------------------------------------------------------------------


@query(
    "agg_groupby",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: partial (map-side) aggregation collapses each input split to
    ≤|groups| rows before the shuffle — 100 TB in, kilobytes shuffled.
    DECIMAL sums keep results bit-identical across partition counts —
    which is also why the gated spread() below is safe: five
    BigDecimal(38,6) folds per row are heavy narrow compute, and the
    single-row-group testdata scan otherwise runs them on 1 of N cores
    (measured 1.2 s -> 0.8 s at sf0.1; on a multi-file lake spread() is
    a no-op and the plain map-side story stands)."""
    lin = spread(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        lin.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum("l_quantity") / n).alias("avg_qty"),
            (_dsum("l_extendedprice") / n).alias("avg_price"),
            (_dsum("l_discount") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 22 — distinct + count-distinct (+ approx variant, rows-only)
# ---------------------------------------------------------------------------


@query(
    "agg_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: Spark expands multi-distinct into an expand+two-phase agg;
    partial aggregation still applies per distinct column."""
    lin = load_table(spark, sf_dir, "lineitem")
    return lin.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           true AS approx_ok,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> SDF:
    """approx_count_distinct = HyperLogLog++: fixed-size sketch, partial
    merge, no shuffle of raw keys — THE 100 TB cardinality path.

    Oracle contract: the HLL estimate itself is engine-specific, so the
    query emits the EXACT count plus ``approx_ok`` = sketch within its
    configured 2% relative error (checked in-plan); DuckDB mirrors the
    exact count and asserts the flag.  A broken sketch or a broken exact
    path both flip a column the driver hashes.

    Plan shape: TWO-PHASE distinct instead of Spark's Expand-based
    multi-distinct.  ``countDistinct`` + ``count`` in one agg triples
    the input via Expand before the shuffle; pre-aggregating to
    (flag, partkey, cnt) first shrinks the shuffle to the distinct-pair
    count, and — because HyperLogLog is duplicate-insensitive — the
    sketch computed over the distinct pairs is the SAME sketch as over
    the raw rows, so approx_count_distinct rides the second phase for
    free.  At 100 TB this is the difference between shuffling 3x the
    fact table and shuffling its distinct keys.

    Round 15: the spread() that parallelized the partial-agg phase cost
    MORE than it saved here — a count-only partial aggregate collapses
    600k rows to the ~60k distinct pairs inside the scan task for less
    than the round-robin exchange of the full input costs (measured
    1.2 s spread vs 0.49 s plain at sf0.1); on a real lake the scan
    parallelizes by itself and the plain shape is exactly the map-side
    partial-agg story the docstring describes."""
    lin = load_table(spark, sf_dir, "lineitem")
    pairs = lin.groupBy("l_returnflag", "l_partkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    exact = F.count(F.lit(1)).cast("long")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    return pairs.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.02 * 3 * exact.cast("double")  # 3 sigma of configured rsd
        ).alias("approx_ok"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# 23 — rollup / cube grouping sets
# ---------------------------------------------------------------------------


@query(
    "agg_rollup_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    return lin.rollup("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# 24 — ranking windows (top-3 orders per customer)
# ---------------------------------------------------------------------------


@query(
    "window_rank",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank()       OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS rnk,
             dense_rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS drnk
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: one shuffle on o_custkey serves all three window functions
    (same partitioning); rank/dense_rank are tie-stable, row_number gets a
    unique tie-break so results are deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    by_cust = W.partitionBy("o_custkey")
    w_unique = by_cust.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_ties = by_cust.orderBy(F.desc("o_totalprice"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_ties).alias("rnk"),
            F.dense_rank().over(w_ties).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# 25 — analytic windows: lag/lead/running sum with frame
# ---------------------------------------------------------------------------


@query(
    "window_analytic",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> SDF:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast(_DEC)).over(running).cast("double").alias(
            "running_spend"
        ),
    )


# ---------------------------------------------------------------------------
# 26 — global sort + limit (top-k)
# ---------------------------------------------------------------------------


@query(
    "sort_limit_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> SDF:
    """Scale: Catalyst plans TakeOrderedAndProject — each partition keeps
    its local top-100, driver merges; no global sort ever materializes."""
    lin = load_table(spark, sf_dir, "lineitem")
    return (
        lin.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# 27 — set operations
# ---------------------------------------------------------------------------


@query(
    "set_ops",
    """
    WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT DISTINCT o_custkey AS k FROM orders)
    SELECT 'intersect' AS kind, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    UNION ALL
    SELECT 'except' AS kind, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
    UNION ALL
    SELECT 'union' AS kind, k FROM (SELECT k FROM a UNION SELECT k FROM b)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> SDF:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    b = orders.select(F.col("o_custkey").alias("k")).distinct()
    tag = lambda df, kind: df.select(F.lit(kind).alias("kind"), "k")  # noqa: E731
    return (
        tag(a.intersect(b), "intersect")
        .unionByName(tag(a.subtract(b), "except"))
        .unionByName(tag(a.union(b).distinct(), "union"))
    )


# ---------------------------------------------------------------------------
# 28 — string functions
# ---------------------------------------------------------------------------


@query(
    "string_funcs",
    """
    SELECT p_partkey,
           lower(p_name) AS low,
           CAST(length(p_name) AS BIGINT) AS len,
           substr(p_type, 1, 5) AS ty5,
           concat_ws('-', p_brand, p_type) AS tag,
           (p_name LIKE '%a%') AS has_a,
           regexp_extract(p_name, '^[a-z]+') AS first_word
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("low"),
        F.length("p_name").cast("long").alias("len"),
        F.substring("p_type", 1, 5).alias("ty5"),
        F.concat_ws("-", "p_brand", "p_type").alias("tag"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
    )


# ---------------------------------------------------------------------------
# 29 — date functions
# ---------------------------------------------------------------------------


@query(
    "date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


# ---------------------------------------------------------------------------
# 30 — JSON / array scalar functions
# ---------------------------------------------------------------------------


@query(
    "array_map_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           split_part(event_type, '_', 1) AS ty_head,
           CAST(length(event_type) AS BIGINT) AS ty_len
    FROM events
    """,
)
def array_map_json_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.split_part(F.col("event_type"), F.lit("_"), F.lit(1)).alias("ty_head"),
        F.length("event_type").cast("long").alias("ty_len"),
    )


# ---------------------------------------------------------------------------
# 31 — grouped pandas UDAF (Arrow-vectorized median per group)
# ---------------------------------------------------------------------------


@query(
    "udaf_pandas",
    """
    SELECT l_returnflag, median(l_extendedprice) AS med_price,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> SDF:
    """Grouped-agg pandas UDF (modern type-hint form — ``Series → scalar``
    infers the aggregate variant; the ``PandasUDFType`` enum is
    deprecated): the whole group arrives as one Arrow batch; median is
    order-insensitive so the result is deterministic.  Scale: partial
    aggregation is impossible for exact medians — the shuffle carries raw
    values; for 100 TB use approx_percentile (see agg_approx_quantile)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udf(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing pandas and JVM aggregates in one agg, so the
    # row count is a pandas aggregate too.
    @pandas_udf("long")
    def count_udf(v: pd.Series) -> int:
        return int(len(v))

    lin = load_table(spark, sf_dir, "lineitem")
    return lin.groupBy("l_returnflag").agg(
        median_udf("l_extendedprice").alias("med_price"),
        count_udf("l_extendedprice").alias("n"),
    )


@query(
    "array_hof_funcs",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           len(list_filter(embedding, x -> x > 0.5)) > 0 AS any_big,
           len(list_filter(embedding, x -> abs(x) >= 1.0)) = 0 AS all_small,
           round(CAST(list_sum(list_transform(embedding,
                 x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE), 6)
             AS dim_sum
    FROM embeddings
    """,
)
def array_hof_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    """The higher-order array function family in one query: filter,
    exists, forall, transform + aggregate — each a single codegen'd
    JVM pass over the array, the workhorse layer under every nested and
    embedding operator here."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    dec_sum = F.aggregate(
        F.transform(arr, lambda x: x.cast("double").cast("decimal(38,12)")),
        F.lit(0).cast("decimal(38,12)"),
        # decimal addition widens to (38,11); cast back so the merge
        # lambda's type matches the accumulator's
        lambda a, x: (a + x).cast("decimal(38,12)"),
    ).cast("double")
    return emb.select(
        "vec_id",
        F.size(F.filter(arr, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(arr, lambda x: x > 0.5).alias("any_big"),
        F.forall(arr, lambda x: F.abs(x) < 1.0).alias("all_small"),
        F.round(dec_sum, 6).alias("dim_sum"),
    )


@query(
    "map_funcs",
    """
    SELECT event_id,
           'k' AS ks_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_first,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(1 AS BIGINT) AS n_entries
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    """Map-type surface: parse JSON into a real MapType column, then
    map_keys / map_values / element_at / size — the typed alternative to
    repeated get_json_object parses (one parse, many accesses).  Outputs
    are flattened to scalars (concat_ws over keys, first value) because
    the driver's canonicalizer cannot hash array columns."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("ks_csv"),
        F.element_at(F.map_values(m), 1).alias("v_first"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).cast("long").alias("n_entries"),
    )


@query(
    "cond_null_funcs",
    """
    SELECT c.c_custkey,
           coalesce(CAST(o.o_totalprice AS DOUBLE), 0.0) AS price_or_zero,
           o.o_orderkey IS NULL AS no_order,
           CASE WHEN o.o_totalprice > 200000 THEN 'big'
                WHEN o.o_totalprice > 100000 THEN 'mid'
                WHEN o.o_totalprice IS NOT NULL THEN 'small'
                ELSE 'none' END AS bucket,
           nullif(c.c_mktsegment, 'BUILDING') AS seg_nb
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def cond_null_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    """Conditional/null-handling scalars over outer-join nulls: coalesce,
    isNull, chained CASE WHEN, nullif."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    price = F.col("o_totalprice")
    return j.select(
        "c_custkey",
        F.coalesce(price, F.lit(0.0)).alias("price_or_zero"),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.when(price > 200000, "big")
        .when(price > 100000, "mid")
        .when(price.isNotNull(), "small")
        .otherwise("none")
        .alias("bucket"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
    )


@query(
    "join_salted",
    """
    WITH prof AS (
      SELECT user_id,
             -- divide AFTER casting the exact DECIMAL sum to double
             -- (DuckDB's avg(DECIMAL) divides in decimal first), and do
             -- NOT round the quotient: per-user averages land exactly on
             -- 0.00005 half-way points, where Spark's round (exact
             -- decimal expansion of the double) and DuckDB's (floating
             -- multiply) disagree — the unrounded double is bit-identical
             -- in both engines (caught by the sf0.1 parity sweep)
             CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)
               AS avg_value
      FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, round(CAST(e.value AS DOUBLE), 4) AS value,
           p.avg_value
    FROM events e JOIN prof p ON e.user_id = p.user_id
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> SDF:
    """Manually salted join: the fact side takes salt = event_id % 8 and
    the dim side replicates ×8, so one hot user's rows spread over 8
    reducers.  This is the pre-AQE/skew-beyond-AQE technique (AQE splits
    skewed SMJ partitions, but salting also fixes skewed shuffled-hash
    and grouped-state paths); the deterministic salt keeps it
    reproducible."""
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_value"
        )
    )
    salts = F.array(*[F.lit(i) for i in range(8)])
    prof_salted = prof.select(
        "user_id", "avg_value", F.explode(salts).alias("salt")
    )
    fact = ev.select(
        "event_id", "user_id", "value", (F.col("event_id") % 8).cast("int").alias("salt")
    )
    return fact.join(prof_salted, ["user_id", "salt"]).select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        # unrounded: see the oracle note on half-way rounding divergence
        "avg_value",
    )


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> SDF:
    """TPC-H Q3: the classic filter→join→join→agg→top-k pipeline.  Scale:
    both filters push to the scans, the customer side reduces before the
    join, and the final ORDER BY+LIMIT plans as TakeOrderedAndProject
    (per-partition top-k, no global sort)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    lin = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(lin, lin.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> SDF:
    """TPC-H Q5: the six-way join — two fact-fact shuffles plus
    broadcast-able dims; Catalyst reorders so region's filter prunes
    nation/supplier before the big joins."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lin = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(lin, lin.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (lin.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "window_first_last",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> SDF:
    """first_value / last_value / nth_value with the full-partition frame
    (the default running frame makes last_value just 'current row' — the
    classic trap, avoided explicitly on both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "agg_approx_quantile",
    """
    SELECT l_returnflag, true AS p50_ok, true AS p95_ok, count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> SDF:
    """approx_percentile: the sketch that replaces exact percentile when
    group value sets no longer fit a reducer (mergeable, bounded-memory,
    single shuffle of sketches not values).

    Oracle contract: sketch values are engine-specific, so the query
    emits per-group booleans asserting the sketch is within 1% relative
    of the exact percentile (computed in the same plan); DuckDB mirrors
    the group keys/counts and asserts the flags.  Output is scalar-only —
    the driver's canonicalizer cannot hash array columns (round-1 redness)."""
    lin = spread(load_table(spark, sf_dir, "lineitem"))
    qs = F.approx_percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10000
    )
    # ONE exact-percentile aggregate for both ranks (array form) — two
    # scalar percentile() calls each buffer the full group separately
    ex = F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))")
    agg = lin.groupBy("l_returnflag").agg(
        F.element_at(qs, 1).alias("a50"),
        F.element_at(qs, 2).alias("a95"),
        F.element_at(ex, 1).alias("e50"),
        F.element_at(ex, 2).alias("e95"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ok = lambda a, e: (F.abs(F.col(a) - F.col(e)) <= 0.01 * F.col(e))  # noqa: E731
    return agg.select(
        "l_returnflag",
        ok("a50", "e50").alias("p50_ok"),
        ok("a95", "e95").alias("p95_ok"),
        "n_rows",
    )
