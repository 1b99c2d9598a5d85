"""Property-based fuzz of the NESTED lowering path — the reference's
raison d'être (element-level masks, callable maps, aggregate-by-
convention over filtered collections).

Random element-level mask trees + integer map expressions are lowered
through ``d.items[mask].map(lambda it: expr).Sum()`` / ``.Count()`` and
checked per-order against a plain-Python evaluation of the same trees.
Integer maps keep both sides exact (the engine folds float Sums in
DECIMAL, which plain Python cannot mirror bit-for-bit); floats appear
only inside comparisons, where both sides see identical IEEE doubles.
"""

from __future__ import annotations

import pytest
from hypothesis import assume, given, settings, HealthCheck
from hypothesis import strategies as st

from dataframe_expressions_spark import DataFrame, select
from test_property_capture import _eval  # shared tuple-tree interpreter

_CONSTS_I = (-3, -1, 0, 2, 7)
_CONSTS_F = (0.5, 2.5, -1.25)


def _num_expr(leaves, consts, depth: int = 2):
    leaf = st.one_of(
        st.tuples(st.just("col"), st.sampled_from(leaves)),
        st.tuples(st.just("const"), st.sampled_from(consts)),
    )
    if depth == 0:
        return leaf
    sub = _num_expr(leaves, consts, depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(("add", "sub", "mul")), sub, sub),
        st.tuples(st.just("abs"), sub),
        st.tuples(st.just("neg"), sub),
    )


def _mask_expr(depth: int = 2):
    num = _num_expr(("q", "p"), _CONSTS_I + _CONSTS_F, 1)
    cmp = st.tuples(
        st.sampled_from(("lt", "le", "gt", "ge", "eq", "ne")), num, num
    )
    if depth == 0:
        return cmp
    sub = _mask_expr(depth - 1)
    return st.one_of(
        cmp,
        st.tuples(st.sampled_from(("and", "or")), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def _has_col(tree) -> bool:
    if tree[0] == "col":
        return True
    return any(_has_col(t) for t in tree[1:] if isinstance(t, tuple))


# 25 orders, 0-5 items each, deterministic values incl. negatives/dupes
_ORDERS = [
    (
        oid,
        [
            (int((oid * 7 + j * 3) % 23 - 5), float((oid * 13 + j * 5) % 31) / 4 - 3.0)
            for j in range((oid * 11) % 6)
        ],
    )
    for oid in range(25)
]


@pytest.fixture(scope="module")
def nested_sdf(spark):
    return spark.createDataFrame(
        _ORDERS, "oid long, items array<struct<l_quantity: long, l_price: double>>"
    )


@given(mask=_mask_expr(), val=_num_expr(("q",), _CONSTS_I))
@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
def test_nested_filter_map_agg_matches_python(spark, nested_sdf, mask, val):
    assume(_has_col(mask) and _has_col(val))
    d = DataFrame()
    big = d.items[
        lambda it: _eval(mask, {"q": it.l_quantity, "p": it.l_price})
    ]
    got = (
        select(
            d,
            nested_sdf,
            d,
            oid=d.oid,
            n=big.Count(),
            s=big.map(lambda it: _eval(val, {"q": it.l_quantity})).Sum(),
        )
        .toPandas()
        .set_index("oid")
        .sort_index()
    )
    for oid, items in _ORDERS:
        sel = [it for it in items if _eval(mask, {"q": it[0], "p": it[1]})]
        want_n = len(sel)
        want_s = sum(_eval(val, {"q": it[0]}) for it in sel)
        assert got.loc[oid, "n"] == want_n, (mask, oid)
        assert got.loc[oid, "s"] == want_s, (mask, val, oid)
