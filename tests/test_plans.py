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


def test_tpch_tier5_broadcast_dims(spark):
    """Q7/Q8/Q21/Q22: every dimension (nation/region/supplier/part and the
    1-row scalar threshold) must broadcast — a plain hash Exchange on a
    dim side would shuffle the fact table needlessly at 100 TB."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    for qid in (
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q21_late_supplier",
        "tpch_q22_idle_customers",
    ):
        plan = _formatted_plan(qs[qid].fn(spark, SF_SMOKE))
        assert "BroadcastExchange" in plan, qid


def test_tpch_tier5_filters_pushed(spark):
    """Q12's year bounds and Q19's disjunctive quantity/size implications
    must reach the parquet scan as PushedFilters."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    plan = _formatted_plan(qs["tpch_q12_priority_class"].fn(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan, plan
    plan = _formatted_plan(qs["tpch_q19_disjunctive"].fn(spark, SF_SMOKE))
    assert "GreaterThanOrEqual(l_quantity" in plan, plan


def test_no_row_at_a_time_python_anywhere(spark):
    """Repo-wide scale guard: NO registered query may evaluate Python
    row-at-a-time (BatchEvalPython).  The Python boundary is allowed only
    as Arrow-vectorized pandas exchange, and only in the queries that
    declare it."""
    from dataframe_expressions_spark.operators.registry import load_all

    # Single-sourced from registry.py (round-10 ADVICE): the same set
    # drives bench.py's worker-pool pre-warm, so an Arrow-crossing
    # operator missing from it fails THIS audit loudly instead of
    # silently missing the pre-warm.
    from dataframe_expressions_spark.operators.registry import (
        PANDAS_PLAN_IDS as declared_pandas,
    )
    for qid, q in load_all().items():
        if "stream" in qid or qid in ("sink_partitioned", "scan_orc",
                                      "cdc_upsert_compact", "join_bucketed"):
            continue  # side-effecting/streaming: planned in their own tests
        plan = _formatted_plan(q.fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, qid
        if qid not in declared_pandas:
            assert "ArrowEvalPython" not in plan, qid
            assert "FlatMapGroupsInPandas" not in plan, qid
            assert "FlatMapCoGroupsInPandas" not in plan, qid
            assert "MapInArrow" not in plan, qid
            assert "MapInPandas" not in plan, qid


def test_sorted_skipping_pushes_date_filter(spark):
    """The data-skipping rewrite only pays off if the date filter reaches
    the parquet scan of the sorted copy."""
    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()["sink_sorted_skipping"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(df)
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_shipdate" in plan, plan


def test_zorder_pushes_both_dimension_filters(spark):
    """Z-order only pays off if BOTH dimension predicates reach the scan
    of the rewritten copy (row-group min/max skipping needs them there)."""
    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()["sink_zorder"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(df)
    assert "GreaterThanOrEqual(o_custkey,40)" in plan, plan
    assert "LessThanOrEqual(o_custkey,119)" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "LessThan(o_orderdate" in plan, plan


def test_spread_skips_exchange_on_parallel_input(spark, tmp_path):
    """spread() exists to fix single-row-group testdata scans; a
    many-FILE scan (the real-lake case) must pass through with NO added
    exchange (VERDICT r2 item 7), and the gate must not touch ``.rdd``
    (forces RDD-conversion planning per call — ADVICE r3)."""
    from dataframe_expressions_spark.functions.dedup import spread

    many = str(tmp_path / "many_files")
    spark.range(0, 1000).repartition(64).write.parquet(many)
    wide = spark.read.parquet(many)
    assert spread(wide) is wide  # gate short-circuits, no new plan node

    # single-file scan (the testdata shape) → one round-robin exchange
    narrow = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = spread(narrow)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    # chained spread (the simhash sandwich): the second call must see the
    # upstream repartition in the lineage and add NO second exchange
    out2 = spread(out.select("doc_id"))
    plan = out2._jdf.queryExecution().analyzed().toString()
    assert plan.count("Repartition") == 1, plan


def test_spread_gate_is_rdd_free():
    """The parallelism probe must be plan/catalog-side only: a ``.rdd``
    touch materializes RDD-conversion lineage on every gated query."""
    import ast
    import inspect
    import textwrap

    from dataframe_expressions_spark.functions import dedup

    tree = ast.parse(textwrap.dedent(inspect.getsource(dedup.spread)))
    rdd_touches = [
        n for n in ast.walk(tree)
        if isinstance(n, ast.Attribute) and n.attr == "rdd"
    ]
    assert not rdd_touches


def test_staged_text_queries_tokenize_once(spark):
    """Token/char arrays must be staged columns, not inline expressions:
    referenced inside a HOF lambda, Catalyst re-evaluates the split per
    element (O(n²) per doc — text_ngram_freq measured 64 s vs 1.8 s at
    sf0.1).  Guard: at most 2 split( calls survive in the optimized plan."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    for qid in ("text_lang_id", "text_quality", "text_rep_bigram", "text_ngram_freq"):
        df = qs[qid].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        n = plan.count("split(")
        assert n <= 2, f"{qid}: {n} split( occurrences — tokenization re-inlined"


def test_round4_ops_plan_shapes(spark):
    """The three round-4 operators' scale contracts: entropy is computed
    in-row (no shuffle before the per-source rollup), and the outlier /
    temperature queries broadcast their small derived tables back onto
    the fact scan instead of shuffling the fact side."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()

    plan = _formatted_plan(qs["text_char_entropy"].fn(spark, SF_SMOKE))
    # exchanges: at most the spread() round-robin + the rollup shuffle —
    # nothing between the scan and the per-source aggregate
    assert plan.count(") Exchange") <= 2, plan

    plan = _formatted_plan(qs["emb_outlier_centroid"].fn(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan, plan  # centroid table is broadcast

    plan = _formatted_plan(qs["mixture_temperature"].fn(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan, plan  # threshold table is broadcast


def test_round4b_ops_plan_shapes(spark):
    """Scale contracts of the second round-4 batch: the JL projection is
    map-only (no shuffle, no Python eval); the boilerplate / containment
    gram pipelines shuffle 8-byte xxhash64 fingerprints (hash calls in
    plan) and never degrade to a nested-loop / cartesian join."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()

    df = qs["emb_random_projection"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan

    # Both gram pipelines hash tokens/shingles BEHIND their deliberate
    # localCheckpoint (the doc-level gram arrays feed multiple consumers,
    # and Generate over an inline HOF re-evaluates the transform per
    # output row), so xxhash64 is not visible in the final plan — assert
    # the join discipline, and hash-only shuffles via the checkpoint
    # payload being long arrays (no string gram column downstream).
    for qid in ("text_boilerplate_ngram", "dedup_containment"):
        df = qs[qid].fn(spark, SF_SMOKE)
        plan = _formatted_plan(df)
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan, (qid, plan)
        assert "gram#" not in plan, (qid, plan)  # no gram STRINGS in any stage


def test_round4c_ops_plan_shapes(spark):
    """Scale contracts of the third round-4 batch: grouping-sets lowers
    to ONE Expand (not a union of aggregates), the window ops are
    single-shuffle, and the correlation matrix runs exactly one
    aggregate over one scan."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()

    plan = _formatted_plan(qs["agg_grouping_sets"].fn(spark, SF_SMOKE))
    assert plan.count("Expand") >= 1 and "Union" not in plan, plan

    for qid in ("scd2_dimension", "join_pit_nearest", "window_pattern_match"):
        df = qs[qid].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one Exchange for the per-user window; pattern-match/pit add one
        # rollup/filter stage at most — never a join shuffle
        assert plan.count("Exchange") <= 2, (qid, plan)
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, (
            qid,
            plan,
        )

    df = qs["stats_corr_matrix"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1, plan  # exactly ONE aggregate subtree
    assert "Union" not in plan, plan


def test_lateral_join_decorrelates_to_window(spark):
    """The LATERAL top-2 subquery must decorrelate: Catalyst rewrites it
    to a partitioned row_number window with WindowGroupLimit (top-k
    pushdown), joined hash-wise — never a per-row subquery loop
    (CartesianProduct / BroadcastNestedLoopJoin), which is what makes
    the SQL spelling survive 100 TB."""
    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()["join_lateral"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tpch_completion_plans(spark):
    """Round-4 TPC-H completion (Q2/Q9/Q16/Q20): dims broadcast, no
    cartesian products, Q2's final top-k is a TakeOrderedAndProject."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    for qid in (
        "tpch_q2_min_cost_supplier",
        "tpch_q9_product_profit",
        "tpch_q16_supplier_relation",
        "tpch_q20_promotion_supplier",
    ):
        plan = _formatted_plan(qs[qid].fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, qid
        assert "BroadcastHashJoin" in plan, qid
    q2 = _formatted_plan(qs["tpch_q2_min_cost_supplier"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in q2, q2


def test_profile_columns_single_scan(spark):
    """The six-column profile must be ONE scan + one expand-based
    multi-distinct aggregate — never a scan per column."""
    from dataframe_expressions_spark.operators.registry import load_all

    plan = _formatted_plan(load_all()["profile_columns"].fn(spark, SF_SMOKE))
    # each physical scan prints twice in formatted output (tree + detail)
    assert plan.count("Scan parquet") == 2, plan
    assert "Expand" in plan, plan


def test_semantic_and_pq_stay_blocked_and_broadcast(spark):
    """dedup_semantic pairs join on the cluster id (equi-join, never a
    cartesian pair explosion); emb_pq_codebook joins the broadcast
    codebook; both argmin folds stay JVM-side."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    sem = _formatted_plan(qs["dedup_semantic"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in sem, sem
    assert "BatchEvalPython" not in sem and "ArrowEvalPython" not in sem
    pq = _formatted_plan(qs["emb_pq_codebook"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in pq, pq
    assert "CartesianProduct" not in pq, pq


def test_substring_spans_semi_join_and_window(spark):
    """dedup_substring_spans: the duplicated-gram probe is a LEFT SEMI
    join on the 8-byte gram hash; the span merge is a window, not a
    self-join."""
    from dataframe_expressions_spark.operators.registry import load_all

    plan = _formatted_plan(
        load_all()["dedup_substring_spans"].fn(spark, SF_SMOKE)
    )
    assert "LeftSemi" in plan, plan
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tier6_scale_shapes(spark):
    """Round-4 tier6 batch: the Bloom prefilter is a 1-row broadcast (the
    only nested-loop join allowed), the reservoir is two window phases,
    the interval-overlap join is an EQUI-join on (user_id, bucket) —
    never a nested-loop range join — and nothing drops to Python."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    bloom = _formatted_plan(qs["decontam_bloom"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in bloom, bloom
    assert "LeftSemi" in bloom, bloom  # exact FP-kill verify join

    res = _formatted_plan(qs["sample_reservoir"].fn(spark, SF_SMOKE))
    assert res.count("Window") >= 2, res  # salted partial + final top-k
    assert "CartesianProduct" not in res, res

    mode = _formatted_plan(qs["agg_mode"].fn(spark, SF_SMOKE))
    assert "Window" in mode and "CartesianProduct" not in mode, mode

    chi2 = _formatted_plan(qs["stats_chi2"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in chi2, chi2
    assert "CartesianProduct" not in chi2, chi2

    iv = _formatted_plan(qs["join_interval_bucketed"].fn(spark, SF_SMOKE))
    assert ("BroadcastHashJoin" in iv) or ("SortMergeJoin" in iv), iv
    assert "BroadcastNestedLoopJoin" not in iv, iv
    assert "CartesianProduct" not in iv, iv

    for qid in (
        "decontam_bloom",
        "sample_reservoir",
        "agg_mode",
        "stats_chi2",
        "join_interval_bucketed",
    ):
        plan = _formatted_plan(qs[qid].fn(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, qid
        assert "ArrowEvalPython" not in plan, qid


def test_ks_test_two_phase_prefix_sum(spark):
    """stats_ks_test / stats_mann_whitney: the only unpartitioned window
    runs over BUCKET TOTALS (a tiny aggregate), the row-bearing cumsum
    is partitioned by bucket, and the totals/offsets reach the rows as
    broadcasts."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    for qid in ("stats_ks_test", "stats_mann_whitney"):
        plan = _formatted_plan(qs[qid].fn(spark, SF_SMOKE))
        assert plan.count("Window") >= 2, (qid, plan)
        assert "BroadcastHashJoin" in plan, (qid, plan)
        assert "CartesianProduct" not in plan, (qid, plan)


def test_emb_dim_slice_broadcast_queries(spark):
    """emb_dim_slice: both cosine passes broadcast the 5-query side —
    the corpus is never shuffled for scoring — and stay JVM-side."""
    from dataframe_expressions_spark.operators.registry import load_all

    plan = _formatted_plan(load_all()["emb_dim_slice"].fn(spark, SF_SMOKE))
    # the vid != qid scoring join has no equi-key: it must be the 5-row
    # BROADCAST nested loop, never a repartitioned one
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


import pytest


@pytest.mark.parametrize(
    "qid",
    [
        "rank_bm25",
        "sample_weighted",
        "rank_mmr",
        "graph_common_neighbors",
        "text_zipf_audit",  # round 9: vocab head rank, rk <= 256
    ],
)
def test_global_topk_plans_as_take_ordered(spark, qid):
    """The global-top-k family's scale story hangs on Catalyst's
    LimitPushDownThroughWindow rewrite: ``row_number() OVER (ORDER BY
    ...)`` + ``rk <= k`` must plan as TakeOrderedAndProject (each
    partition keeps its local top-k, driver merges k rows) feeding the
    single-partition Window — never a full-input global sort.  Nothing
    guarded the rewrite before (r7 VERDICT item 5): a Spark upgrade or a
    query edit that breaks the filter-over-window adjacency would
    silently regress to sorting the whole input on one partition (the
    WindowExec "no partition defined" warning already makes it look
    broken; this proves it isn't)."""
    import re

    from dataframe_expressions_spark.operators.registry import load_all

    df = load_all()[qid].fn(spark, SF_SMOKE)
    df.collect()  # executed (AQE-final) plan, not the initial estimate
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "TakeOrderedAndProject" in plan, plan
    # no full-input global sort may survive anywhere in the plan: the
    # only global orderings are the top-k ones, and those must have been
    # rewritten away (Sort's second toString arg is the global flag)
    global_sorts = re.findall(r"Sort \[[^\]]*\], true, ", plan)
    assert not global_sorts, (global_sorts, plan)


def test_write_once_stores_are_read_through(spark):
    """The round-8 write-once stores must actually serve their consumers:
    dedup_near_minhash's plan is a pure scan of the minhash pair store
    (no shuffle, no window — the pipeline ran at build time, once), and
    graph_common_neighbors scans the scored CN store instead of
    re-running the Σdeg² wedge join (no Join in the plan at all)."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    pairs = qs["dedup_near_minhash"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(pairs)
    assert "spark_graft_mhpairs_" in plan, plan
    assert ") Exchange" not in plan and "Window" not in plan, plan

    cn = qs["graph_common_neighbors"].fn(spark, SF_SMOKE)
    plan = _formatted_plan(cn)
    assert "spark_graft_cnsc_" in plan, plan
    assert "Join" not in plan, plan


def test_daily_rollup_queries_scan_corpus_once(spark):
    """Round-9 scan audit, pinned: Catalyst does not deduplicate a shared
    subplan across self-join/broadcast legs, so a daily/hourly rollup
    consumed by 2-3 legs re-scanned the FULL events corpus once per leg
    (theil_sen 3x) until the rollups got localCheckpoint lineage cuts.
    The returned plan must show ZERO parquet scans (the one real scan
    happens once, at checkpoint materialization) — a refactor that drops
    the cut reintroduces a full extra corpus pass per leg at 100 TB."""
    import re

    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    for qid in (
        "stats_theil_sen_trend",
        "stats_cusum_changepoint",
        "stats_seasonal_decompose",
        "timeseries_gapfill",
        "stats_autocorr_lag",
    ):
        plan = qs[qid].fn(spark, SF_SMOKE)._jdf.queryExecution(
        ).executedPlan().toString()
        n = len(re.findall(r"FileScan parquet", plan))
        assert n == 0, (qid, n, plan[:1500])


def test_dsl_table_pipeline_filters_pushed_to_snapshot_scan(spark):
    """The DSL-over-table query's captured mask must reach the committed
    snapshot's parquet scan as PushedFilters — the table layer blunts
    nothing about Catalyst's pushdown (round 11 continuation)."""
    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    plan = _formatted_plan(qs["dsl_table_pipeline"].fn(spark, SF_SMOKE))
    assert "GreaterThan(n_orders,0)" in plan, plan
    assert "GreaterThan(acctbal,1000.0)" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
