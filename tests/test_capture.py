"""Capture-layer unit tests, reference-style (no SparkSession needed).

The reference asserts captured-``ast`` shapes (reference: tests/
test_dataframe.py); we assert node-IR shapes.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataframe_expressions_spark import Column, DataFrame, define_alias, user_func


def test_attr_projection_chain():
    d = DataFrame()
    node = d.jets.pt
    assert node.op == "attr" and node.args[1] == "pt"
    assert node.args[0].op == "attr" and node.args[0].args[1] == "jets"
    assert node.args[0].args[0] is d


def test_attr_memoized_identity():
    d = DataFrame()
    assert d.jets is d.jets  # CSE identity at capture time
    assert d.jets.pt is d.jets.pt


def test_underscore_attrs_refused():
    d = DataFrame()
    with pytest.raises(AttributeError):
        d._private


def test_comparison_yields_bool_column():
    d = DataFrame()
    mask = d.jets.pt > 30
    assert isinstance(mask, Column)
    assert mask.op == "cmp" and mask.args[0] == ">"


def test_all_six_comparisons():
    d = DataFrame()
    for op, expr in [
        ("<", d.x < 1), ("<=", d.x <= 1), (">", d.x > 1),
        (">=", d.x >= 1), ("==", d.x == 1), ("!=", d.x != 1),
    ]:
        assert isinstance(expr, Column) and expr.args[0] == op


def test_mask_combinators():
    d = DataFrame()
    c = (d.x > 1) & (d.y < 2) | ~(d.z == 3)
    assert c.op == "or"
    assert c.args[0].op == "and"
    assert c.args[1].op == "not"


def test_truthiness_guard():
    d = DataFrame()
    with pytest.raises(TypeError, match="[&|~]"):
        bool(d.x > 1)
    with pytest.raises(TypeError):
        (d.x > 1) and (d.y > 2)


def test_filter_composes():
    d = DataFrame()
    f = d[d.x > 1][d.y < 2]
    assert f.op == "filter" and f.args[0].op == "filter"


def test_filter_callable_invoked_with_parent():
    d = DataFrame()
    f = d.jets[lambda j: j.pt > 30]
    assert f.op == "filter"
    mask = f.args[1]
    assert mask.op == "cmp"
    # the lambda received the jets node itself
    assert mask.args[1].args[0] is d.jets


def test_arithmetic_and_reverse():
    d = DataFrame()
    e = d.jets.pt / 1000.0
    assert e.op == "bin" and e.args[0] == "/"
    r = 1000.0 - d.jets.pt
    assert r.op == "bin" and r.args[0] == "-" and r.args[1] == 1000.0


def test_abs_and_numpy_ufunc_capture():
    d = DataFrame()
    a = abs(d.x)
    assert a.op == "ufunc" and a.args[0] == "abs"
    s = np.sin(d.x)
    assert isinstance(s, DataFrame) and s.op == "ufunc" and s.args[0] == "sin"
    q = np.sqrt(d.x)
    assert q.args[0] == "sqrt"


def test_method_call_capture():
    d = DataFrame()
    c = d.jets.Count()
    assert c.op == "call" and c.args[1] == "Count"
    assert c.args[0] is d.jets


def test_nested_count_cut_shape():
    d = DataFrame()
    cut = d[d.jets.Count() > 2]
    assert cut.op == "filter"
    assert cut.args[1].op == "cmp"


def test_alias_expansion():
    define_alias(".", "good_jets", lambda o: o.jets[o.jets.pt > 30])
    d = DataFrame()
    g = d.good_jets
    assert g.op == "filter"
    assert g.args[0] is d.jets


def test_alias_scoped_to_base():
    define_alias(".jets", "ptgev", lambda j: j.pt / 1000.0)
    d = DataFrame()
    e = d.jets.ptgev
    assert e.op == "bin" and e.args[0] == "/"
    # not defined on the root
    plain = d.ptgev
    assert plain.op == "attr"


def test_user_func_deferred():
    @user_func
    def calc(x: float) -> float:
        return x * 2.0

    d = DataFrame()
    node = calc(d.x)
    assert node.op == "udf"
    assert calc(3.0) == 6.0  # plain values execute directly


def test_nodes_immutable():
    d = DataFrame()
    with pytest.raises(AttributeError):
        d.op = "hacked"


def test_join_groupby_capture_shapes():
    """Round 7 (SURVEY §7 M4): joins/groupbys capture through the existing
    attr+call machinery — no new node types, reference-style."""
    from dataframe_expressions_spark.plans.nodes import DataFrame

    d, d2 = DataFrame(), DataFrame()
    j = d.join(d2, on=d.a == d2.b, how="left")
    assert j.op == "call"
    parent, name, args, kwargs = j.args
    assert parent is d and name == "join" and args == (d2,)
    kw = dict(kwargs)
    assert kw["how"] == "left" and kw["on"].op == "cmp"

    g = j.groupby(d.k).agg(n=d.Count(), s=d.x.Sum())
    assert g.op == "call"
    gparent, gname, gargs, gkwargs = g.args
    assert gname == "agg"
    inner = gparent  # the groupby call node (attr -> call chain)
    assert inner.args[1] == "groupby" and inner.args[2] == (d.k,)
    kw = dict(gkwargs)
    assert kw["n"].op == "call" and kw["s"].op == "call"
