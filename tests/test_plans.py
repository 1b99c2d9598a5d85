"""Physical-plan shape assertions — the scale contract, not just results.

These lock in the plans we designed for: bucketed joins must not shuffle
before the join, broadcast joins must broadcast, and scans must prune
columns.  A correctness-preserving regression that reintroduces a shuffle
would pass the oracle tests but fail here.
"""

from __future__ import annotations

import contextlib
import io

from conftest import SF_SMOKE


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle_before_join(spark):
    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()["join_bucketed"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2, plan
    # the single Exchange belongs to the post-join groupBy, not the join
    assert plan.count(") Exchange") == 1, plan
    assert "BroadcastExchange" not in plan


def test_broadcast_join_broadcasts_dims(spark):
    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()["join_broadcast"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # customer side must NOT shuffle: no plain Exchange hashpartitioning
    assert ") Exchange" not in plan, plan


def test_agg_scan_prunes_columns(spark):
    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()["agg_groupby"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(df)
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    # Q1 shape reads 7 lineitem columns, never the full 16-col schema
    assert "l_comment" not in scan and "l_partkey" not in scan, scan


def test_nested_ops_stay_jvm_side(spark):
    """Tier-1 nested semantics lower to higher-order functions, never to
    Python row evaluation."""
    from dataframe_expressions_spark.operators.registry import load_all

    for qid in ("nested_filter_agg", "nested_count_cut", "filter_lambda"):
        df = load_all()[qid].fn(spark, SF_SMOKE)
        plan = _formatted_plan(df)
        assert "BatchEvalPython" not in plan, qid
        assert "ArrowEvalPython" not in plan, qid
