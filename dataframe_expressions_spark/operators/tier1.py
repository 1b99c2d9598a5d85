"""Tier 1 — the reference's actual surface, expressed THROUGH the capture
DSL and lowered to Spark (SURVEY.md §2 #1–#13).

Each query here builds a lazy expression with ``DataFrame()`` capture
nodes (reference semantics: DataFrame.py / render.py) and lowers it via
``plans/lowering.py``; nothing calls pyspark functions directly except the
final ``select``.  The DuckDB oracles mirror nested semantics with
``list_filter`` / ``list_transform`` / ``len`` over the identical
``orders_nested`` CTE.

Scale notes: every lowered plan is pure JVM higher-order-function /
column arithmetic — no Python in the hot path; filters land in parquet
``PushedFilters`` and unused columns are pruned (verified via
``.explain("formatted")`` in tests/test_lowering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SDF
from pyspark.sql import SparkSession

import numpy as np

from ..plans.alias import clear_aliases, define_alias
from ..plans.nodes import DataFrame
from ..plans.lowering import select
from ..functions.user import user_func
from ..sources.tables import (
    CUSTOMER_NESTED_SQL,
    ORDERS_NESTED_SQL,
    customer_nested,
    load_table,
    orders_nested,
)
from .registry import query

# ---------------------------------------------------------------------------
# 1 — attribute projection (reference: DataFrame.py __getattr__)
# ---------------------------------------------------------------------------


@query(
    "project_scalar",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def project_scalar(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    d = DataFrame()
    return select(
        d, lin, d,
        l_orderkey=d.l_orderkey, l_linenumber=d.l_linenumber, l_quantity=d.l_quantity,
    )


# ---------------------------------------------------------------------------
# 2 — boolean-mask filter (reference: DataFrame.py __getitem__)
# ---------------------------------------------------------------------------


@query(
    "filter_mask",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 30",
)
def filter_mask(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    d = DataFrame()
    f = d[d.l_quantity > 30]
    return select(
        d, lin, f,
        l_orderkey=d.l_orderkey, l_linenumber=d.l_linenumber, l_quantity=d.l_quantity,
    )


# ---------------------------------------------------------------------------
# 3 — callable filter (reference: DataFrame.py __getitem__ + ast_Callable)
# ---------------------------------------------------------------------------


@query(
    "filter_lambda",
    ORDERS_NESTED_SQL
    + "SELECT o_orderkey, len(list_filter(items, it -> it.l_quantity > 30)) AS n_big "
    "FROM orders_nested",
)
def filter_lambda(spark: SparkSession, sf_dir: str) -> SDF:
    nested = orders_nested(spark, sf_dir)
    d = DataFrame()
    big = d.items[lambda it: it.l_quantity > 30]
    return select(d, nested, d, o_orderkey=d.o_orderkey, n_big=big.Count())


# ---------------------------------------------------------------------------
# 4 — comparisons (reference: DataFrame.py rich comparisons)
# ---------------------------------------------------------------------------


@query(
    "cmp_ops",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity <  25  AS lt,
           l_quantity <= 25  AS le,
           l_quantity >  25  AS gt,
           l_quantity >= 25  AS ge,
           l_returnflag = 'A'  AS eq,
           l_linestatus != 'O' AS ne
    FROM lineitem
    """,
)
def cmp_ops(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    d = DataFrame()
    return select(
        d, lin, d,
        l_orderkey=d.l_orderkey, l_linenumber=d.l_linenumber,
        lt=d.l_quantity < 25, le=d.l_quantity <= 25,
        gt=d.l_quantity > 25, ge=d.l_quantity >= 25,
        eq=d.l_returnflag == "A", ne=d.l_linestatus != "O",
    )


# ---------------------------------------------------------------------------
# 5 — mask combinators & | ~ (reference: DataFrame.py BoolOp capture)
# ---------------------------------------------------------------------------


@query(
    "bool_ops",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_quantity > 30 AND (l_discount < 0.02 OR NOT l_returnflag = 'A')
    """,
)
def bool_ops(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    d = DataFrame()
    mask = (d.l_quantity > 30) & ((d.l_discount < 0.02) | ~(d.l_returnflag == "A"))
    return select(d, lin, d[mask], l_orderkey=d.l_orderkey, l_linenumber=d.l_linenumber)


# ---------------------------------------------------------------------------
# 6 — arithmetic (reference: DataFrame.py BinOp capture)
# ---------------------------------------------------------------------------


@query(
    "arith_ops",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity / 7.0 + 1 AS ratio,
           l_extendedprice - l_quantity * 10 AS diff
    FROM lineitem
    """,
)
def arith_ops(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    d = DataFrame()
    return select(
        d, lin, d,
        l_orderkey=d.l_orderkey, l_linenumber=d.l_linenumber,
        charge=d.l_extendedprice * (1 - d.l_discount) * (1 + d.l_tax),
        ratio=d.l_quantity / 7.0 + 1,
        diff=d.l_extendedprice - d.l_quantity * 10,
    )


# ---------------------------------------------------------------------------
# 7 — abs() + numpy ufuncs (reference: DataFrame.py __abs__/__array_ufunc__)
# ---------------------------------------------------------------------------


@query(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           sqrt(l_quantity) AS r,
           abs(l_discount - 0.05) AS a,
           floor(l_extendedprice / 100) AS f,
           ceil(l_tax * 100) AS c
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> SDF:
    lin = load_table(spark, sf_dir, "lineitem")
    d = DataFrame()
    return select(
        d, lin, d,
        l_orderkey=d.l_orderkey, l_linenumber=d.l_linenumber,
        r=np.sqrt(d.l_quantity),
        a=abs(d.l_discount - 0.05),
        f=np.floor(d.l_extendedprice / 100),
        c=np.ceil(d.l_tax * 100),
    )


# ---------------------------------------------------------------------------
# 8 — Count() convention (reference: DataFrame.py __call__; README)
# ---------------------------------------------------------------------------


@query(
    "count_agg",
    ORDERS_NESTED_SQL + "SELECT o_orderkey, len(items) AS n_items FROM orders_nested",
)
def count_agg(spark: SparkSession, sf_dir: str) -> SDF:
    nested = orders_nested(spark, sf_dir)
    d = DataFrame()
    return select(d, nested, d, o_orderkey=d.o_orderkey, n_items=d.items.Count())


# ---------------------------------------------------------------------------
# 9 — event cut on nested aggregate (reference: render.py cross-level refs)
# ---------------------------------------------------------------------------


@query(
    "nested_count_cut",
    ORDERS_NESTED_SQL
    + "SELECT o_orderkey, o_totalprice FROM orders_nested WHERE len(items) > 2",
)
def nested_count_cut(spark: SparkSession, sf_dir: str) -> SDF:
    nested = orders_nested(spark, sf_dir)
    d = DataFrame()
    busy = d[d.items.Count() > 2]
    return select(d, nested, busy, o_orderkey=d.o_orderkey, o_totalprice=d.o_totalprice)


# ---------------------------------------------------------------------------
# 10 — filtered-collection aggregate (reference: render.py CSE identity)
# ---------------------------------------------------------------------------


@query(
    "nested_filter_agg",
    ORDERS_NESTED_SQL
    + "SELECT o_orderkey, len(list_filter(items, it -> it.l_quantity > 20)) AS n_big "
    "FROM orders_nested",
)
def nested_filter_agg(spark: SparkSession, sf_dir: str) -> SDF:
    nested = orders_nested(spark, sf_dir)
    d = DataFrame()
    big = d.items[d.items.l_quantity > 20]  # mask and source share the parent
    return select(d, nested, d, o_orderkey=d.o_orderkey, n_big=big.Count())


# ---------------------------------------------------------------------------
# 11 — alias macros (reference: alias.py define_alias)
# ---------------------------------------------------------------------------


@query(
    "alias_expand",
    ORDERS_NESTED_SQL
    + "SELECT o_orderkey, len(list_filter(items, it -> it.l_quantity > 30)) AS n_big "
    "FROM orders_nested",
)
def alias_expand(spark: SparkSession, sf_dir: str) -> SDF:
    nested = orders_nested(spark, sf_dir)
    clear_aliases()
    define_alias(".", "big_items", lambda o: o.items[o.items.l_quantity > 30])
    d = DataFrame()
    return select(d, nested, d, o_orderkey=d.o_orderkey, n_big=d.big_items.Count())


# ---------------------------------------------------------------------------
# 12 — @user_func (reference: utils.py ast_FunctionPlaceholder)
# ---------------------------------------------------------------------------


@user_func
def _clv(balance: float) -> float:
    """Toy 'customer lifetime value' — numpy-vectorizable, so the pandas
    UDF path runs it on whole Arrow batches."""
    return balance * 1.1 + 5.0


@query(
    "user_func_udf",
    "SELECT c_custkey, c_acctbal * 1.1 + 5.0 AS clv FROM customer",
)
def user_func_udf(spark: SparkSession, sf_dir: str) -> SDF:
    cust = load_table(spark, sf_dir, "customer")
    d = DataFrame()
    return select(d, cust, d, c_custkey=d.c_custkey, clv=_clv(d.c_acctbal))


# ---------------------------------------------------------------------------
# 13 — deferred lambda via .map (reference: render.py render_callable)
# ---------------------------------------------------------------------------


@query(
    "callable_capture",
    # DECIMAL fold mirrors the engine's exact order-independent Sum
    ORDERS_NESTED_SQL
    + "SELECT o_orderkey, CAST(list_sum("
    "list_transform(items, it -> CAST(it.l_extendedprice * (1 - it.l_discount)"
    " AS DECIMAL(38,6)))) AS DOUBLE) AS rev "
    "FROM orders_nested",
)
def callable_capture(spark: SparkSession, sf_dir: str) -> SDF:
    nested = orders_nested(spark, sf_dir)
    d = DataFrame()
    rev = d.items.map(lambda it: it.l_extendedprice * (1 - it.l_discount)).Sum()
    return select(d, nested, d, o_orderkey=d.o_orderkey, rev=rev)


# ---------------------------------------------------------------------------
# aggregation-by-convention beyond Count/Sum: Min/Max/Mean/First
# (reference: DataFrame.py __getattr__+__call__ capture any method name;
#  meaning is assigned by the backend — here, the lowering pass)
# ---------------------------------------------------------------------------


@query(
    "nested_minmax_agg",
    ORDERS_NESTED_SQL
    + """
    , f AS (SELECT o_orderkey, items,
                   list_filter(items, it -> it.l_quantity > 10) AS big
            FROM orders_nested)
    SELECT o_orderkey,
           list_min(list_transform(big, it -> it.l_quantity)) AS min_q,
           list_max(list_transform(big, it -> it.l_quantity)) AS max_q,
           CAST(list_sum(list_transform(big,
                it -> CAST(it.l_extendedprice AS DECIMAL(38,6)))) AS DOUBLE)
             / len(big) AS mean_price,
           items[1].l_returnflag AS first_flag
    FROM f WHERE len(big) > 0
    """,
)
def nested_minmax_agg(spark: SparkSession, sf_dir: str) -> SDF:
    """Min/Max/Mean/First over a filtered nested collection — the full
    aggregate-by-convention family, each lowering to one JVM array
    function (array_min/array_max/decimal-fold aggregate/element_at)."""
    nested = orders_nested(spark, sf_dir)
    d = DataFrame()
    big = d.items[d.items.l_quantity > 10]
    return select(
        d,
        nested,
        d[big.Count() > 0],
        o_orderkey=d.o_orderkey,
        min_q=big.l_quantity.Min(),
        max_q=big.l_quantity.Max(),
        mean_price=big.l_extendedprice.Mean(),
        first_flag=d.items.l_returnflag.First(),
    )


@query(
    "nested_topn_slice",
    ORDERS_NESTED_SQL
    + """
    SELECT o_orderkey,
           list_sort(list_transform(items, it -> it.l_extendedprice), 'DESC')[1]
             AS top1_price,
           list_sort(list_transform(items, it -> it.l_extendedprice), 'DESC')[2]
             AS top2_price
    FROM orders_nested
    WHERE len(items) >= 2
    """,
)
def nested_topn_slice(spark: SparkSession, sf_dir: str) -> SDF:
    """Per-event top-n: sort the nested collection's values descending and
    slice — all inside the row (array_sort + element_at), no explode, no
    shuffle beyond the nested view's own.  Emitted as two scalar columns
    (the driver's canonicalizer cannot hash array columns); element_at is
    safe under ANSI because of the len >= 2 filter."""
    from pyspark.sql import functions as F

    nested = orders_nested(spark, sf_dir)
    prices = F.transform("items", lambda it: it["l_extendedprice"])
    # materialize the sorted array ONCE in its own projection — two
    # element_at calls on the same sort_array expression are NOT merged by
    # Catalyst (no CSE across projection expressions), which doubled the
    # dominant per-row cost
    sorted_once = nested.where(F.size("items") >= 2).select(
        "o_orderkey", F.sort_array(prices, asc=False).alias("sorted_prices")
    )
    return sorted_once.select(
        "o_orderkey",
        F.element_at("sorted_prices", 1).alias("top1_price"),
        F.element_at("sorted_prices", 2).alias("top2_price"),
    )


# ---------------------------------------------------------------------------
# two-level nesting: customer → orders → items (the reference's attribute
# chains compose to arbitrary depth — d.jets.tracks-style; SURVEY.md §1)
# ---------------------------------------------------------------------------


@query(
    "nested_two_level",
    CUSTOMER_NESTED_SQL
    + """
    , f AS (
      SELECT c_custkey,
             list_filter(orders, o -> o.o_totalprice > 150000) AS big_o
      FROM customer_nested),
      g AS (
      SELECT c_custkey, big_o,
             list_transform(big_o,
                 o -> list_filter(o.items, it -> it.l_quantity > 25)) AS big_i
      FROM f WHERE len(big_o) > 0)
    SELECT c_custkey,
           CAST(len(big_o) AS BIGINT) AS n_big_orders,
           CAST(list_sum(list_transform(big_i,
                x -> CAST(CAST(len(x) AS BIGINT) AS DECIMAL(38,6)))) AS DOUBLE)
             AS n_big_items,
           CAST(list_sum(list_transform(big_i,
                x -> CAST(coalesce(CAST(list_sum(list_transform(x,
                         it -> CAST(it.l_extendedprice AS DECIMAL(38,6))))
                     AS DOUBLE), 0.0) AS DECIMAL(38,6)))) AS DOUBLE) AS rev
    FROM g
    """,
)
def nested_two_level(spark: SparkSession, sf_dir: str) -> SDF:
    """Two-level nested query straight through the capture DSL:
    ``d.orders[o-mask].items[i-mask]`` filters at BOTH depths, then
    ``Count().Sum()`` and ``Sum().Sum()`` collapse level by level — the
    lowering emits nested ``F.filter``/``F.transform``/``F.aggregate``
    with no explode and no extra shuffle (reference semantics: arbitrary
    attribute-chain depth, d.jets.tracks; SURVEY.md §1)."""
    nested = customer_nested(spark, sf_dir)
    d = DataFrame()
    big_orders = d.orders[d.orders.o_totalprice > 150000]
    big_items = big_orders.items[big_orders.items.l_quantity > 25]
    return select(
        d,
        nested,
        d[big_orders.Count() > 0],
        c_custkey=d.c_custkey,
        n_big_orders=big_orders.Count(),
        n_big_items=big_items.Count().Sum(),
        rev=big_items.l_extendedprice.Sum().Sum(),
    )
