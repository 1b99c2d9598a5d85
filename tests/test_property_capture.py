"""Property-based lowering fuzz: random scalar expression trees built
through the capture DSL must produce the same values Spark-side as the
same tree evaluated eagerly over pandas.

This EXCEEDS the reference's test strategy (SURVEY.md §5.1: pure
unit tests, no property-based testing) on purpose: the capture layer's
operator overloads (arith/compare/bool/abs, constants on either side)
are exactly the surface where a subtle reversed-operand or precedence
bug survives example-based tests.  Double arithmetic uses the identical
IEEE op order on both sides, so comparison is exact — no tolerance.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataframe_expressions_spark import DataFrame, select

# --- expression trees as tuples -------------------------------------------
# leaves: ("col", name) | ("const", value)
# numeric ops: ("add"|"sub"|"mul", l, r) | ("abs", x) | ("neg", x)
# bool ops:    ("lt"|"le"|"gt"|"ge"|"eq"|"ne", l, r)    (numeric args)
#              ("and"|"or", l, r) | ("not", x)          (bool args)

_NUM_COLS = ("x", "k")
_CONSTS = (-3, -1, 0, 2, 7, 0.5, 2.5, -1.25)


def _num_leaf():
    return st.one_of(
        st.tuples(st.just("col"), st.sampled_from(_NUM_COLS)),
        st.tuples(st.just("const"), st.sampled_from(_CONSTS)),
    )


def _num_expr(depth: int = 3):
    leaf = _num_leaf()
    if depth == 0:
        return leaf
    sub = _num_expr(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(("add", "sub", "mul")), sub, sub),
        st.tuples(st.just("abs"), sub),
        st.tuples(st.just("neg"), sub),
    )


def _bool_expr(depth: int = 2):
    num = _num_expr(2)
    cmp = st.tuples(
        st.sampled_from(("lt", "le", "gt", "ge", "eq", "ne")), num, num
    )
    if depth == 0:
        return cmp
    sub = _bool_expr(depth - 1)
    return st.one_of(
        cmp,
        st.tuples(st.sampled_from(("and", "or")), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def _eval(tree, env):
    """Interpret a tree against ``env`` — works for BOTH the capture DSL
    (env values are capture nodes) and pandas (env values are Series),
    because both overload the same Python operators."""
    op = tree[0]
    if op == "col":
        return env[tree[1]]
    if op == "const":
        return tree[1]
    if op in ("add", "sub", "mul"):
        l, r = _eval(tree[1], env), _eval(tree[2], env)
        return {"add": lambda: l + r, "sub": lambda: l - r, "mul": lambda: l * r}[op]()
    if op == "abs":
        return abs(_eval(tree[1], env))
    if op == "neg":
        return -_eval(tree[1], env)
    if op in ("lt", "le", "gt", "ge", "eq", "ne"):
        l, r = _eval(tree[1], env), _eval(tree[2], env)
        return {
            "lt": lambda: l < r, "le": lambda: l <= r, "gt": lambda: l > r,
            "ge": lambda: l >= r, "eq": lambda: l == r, "ne": lambda: l != r,
        }[op]()
    if op == "and":
        return _eval(tree[1], env) & _eval(tree[2], env)
    if op == "or":
        return _eval(tree[1], env) | _eval(tree[2], env)
    if op == "not":
        v = _eval(tree[1], env)
        if isinstance(v, bool):  # scalar mirror path: ~True == -2 (truthy!)
            return not v
        return ~v
    raise AssertionError(op)


_ROWS = [(i, float(i) * 1.5 - 7.0, i % 11 - 5) for i in range(40)]


@pytest.fixture(scope="module")
def frames(spark):
    sdf = spark.createDataFrame(_ROWS, "rid long, x double, k long")
    pdf = pd.DataFrame(_ROWS, columns=["rid", "x", "k"])
    return sdf, pdf


def _const_to_series(v, pdf):
    # a tree that is pure constants evaluates to a scalar on the pandas
    # side; broadcast it so comparison logic below stays uniform
    return v if isinstance(v, pd.Series) else pd.Series([v] * len(pdf))


@given(tree=_num_expr())
@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
def test_numeric_tree_matches_pandas(spark, frames, tree):
    sdf, pdf = frames
    d = DataFrame()
    node = _eval(tree, {"x": d.x, "k": d.k})
    if not hasattr(node, "_op"):  # pure-constant tree: nothing captured
        return
    got = select(d, sdf, d, rid=d.rid, v=node).toPandas().sort_values("rid")
    want = _const_to_series(_eval(tree, {"x": pdf["x"], "k": pdf["k"]}), pdf)
    assert list(got["v"]) == list(want), tree


@given(tree=_bool_expr())
@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
def test_bool_tree_filter_matches_pandas(spark, frames, tree):
    sdf, pdf = frames
    d = DataFrame()
    mask = _eval(tree, {"x": d.x, "k": d.k})
    if not hasattr(mask, "_op"):  # pure-constant tree: nothing captured
        return
    got = sorted(
        select(d, sdf, d[mask], rid=d.rid).toPandas()["rid"]
    )
    pmask = _const_to_series(_eval(tree, {"x": pdf["x"], "k": pdf["k"]}), pdf)
    want = sorted(pdf[pmask.astype(bool)]["rid"])
    assert got == want, tree


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # partition key
            st.integers(min_value=-4, max_value=4),  # order key (ties)
            st.integers(min_value=0, max_value=99),  # value
        ),
        min_size=1,
        max_size=60,
    ),
    ascending=st.booleans(),
)
def test_window_sugar_matches_raw_windows(spark, rows, ascending):
    """The round-8 .window() capture sugar vs raw pyspark window
    expressions on arbitrary grouped, tie-heavy frames: row_number
    (unique tie-break), rank/dense_rank (tie-stable), lag, and the
    running DECIMAL-folded sum must agree row for row under either
    ordering direction."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dataframe_expressions_spark import DataFrame, select_from

    df = spark.createDataFrame(
        [(g, k, v, i) for i, (g, k, v) in enumerate(rows)],
        "g long, k long, v long, t long",
    )
    d = DataFrame()
    w = d.window(
        d.g,
        order_by=(d.k, d.t),
        ascending=[ascending, True],
        rn="row_number",
        rnk="rank",
        prev=("lag", d.v),
        run=("sum", d.v),
    )
    dsl = select_from(
        {d: df}, w, g=d.g, t=d.t, rn=w.rn, rnk=w.rnk, prev=w.prev, run=w.run
    )
    kcol = F.col("k") if ascending else F.col("k").desc()
    spec = W.partitionBy("g").orderBy(kcol, F.col("t"))
    running = spec.rowsBetween(W.unboundedPreceding, W.currentRow)
    raw = df.select(
        "g",
        "t",
        F.row_number().over(spec).alias("rn"),
        F.rank().over(spec).alias("rnk"),
        F.lag("v").over(spec).alias("prev"),
        F.sum(F.col("v").cast("decimal(38,6)"))
        .over(running)
        .cast("double")
        .alias("run"),
    )
    assert sorted(map(tuple, dsl.collect())) == sorted(
        map(tuple, raw.collect())
    )


# --- conditional aggregates (round-9 _peel_agg_filters) ---------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # group g
            st.integers(min_value=-5, max_value=5),  # value v
            st.integers(min_value=0, max_value=3),   # flag f
        ),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(min_value=-4, max_value=4),
    chain=st.booleans(),  # single mask vs chained d[m1][m2]
)
def test_conditional_agg_matches_pandas(spark, rows, cut, chain):
    """A filtered frame inside .agg() must aggregate ONLY the rows the
    mask admits — count(*) FILTER semantics — for Count, CountDistinct,
    Sum, Mean, Min and Max, including chained masks (d[m1][m2]) and the
    all-rows-excluded group (NULL for Sum/Mean/Min/Max, 0 for counts).
    The round-9 review caught the pre-peel behavior silently counting
    EVERY row; this fuzzes the fix."""
    import math

    from dataframe_expressions_spark import select_from

    pdf = pd.DataFrame(rows, columns=["g", "v", "f"])
    df = spark.createDataFrame(pdf)
    d = DataFrame()
    filt = d[d.v > cut][d.f != 2] if chain else d[d.v > cut]
    got = {
        r["g"]: (r["n"], r["nd"], r["s"], r["m"], r["lo"], r["hi"])
        for r in select_from(
            {d: df},
            d.groupby("g").agg(
                n=filt.Count(),
                nd=filt.f.CountDistinct(),
                s=filt.v.Sum(),
                m=filt.v.Mean(),
                lo=filt.v.Min(),
                hi=filt.v.Max(),
            ),
        ).collect()
    }
    for g, grp in pdf.groupby("g"):
        sub = grp[(grp.v > cut) & (grp.f != 2)] if chain else grp[grp.v > cut]
        n, nd = len(sub), sub.f.nunique()
        s = float(sub.v.sum()) if n else None
        m = s / n if n else None
        lo = int(sub.v.min()) if n else None
        hi = int(sub.v.max()) if n else None
        gn, gnd, gs, gm, glo, ghi = got[g]
        assert (gn, gnd, glo, ghi) == (n, nd, lo, hi), (g, got[g])
        if s is None:
            assert gs is None and gm is None, (g, got[g])
        else:
            assert gs is not None and math.isclose(gs, s, abs_tol=1e-9)
            assert gm is not None and math.isclose(gm, m, abs_tol=1e-9)
