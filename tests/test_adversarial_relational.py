"""Adversarial-input parity for the relational operators: the driver's
TPC-H-ish tables contain no NULLs, no negative measures, no duplicate
keys and no empty strings, so the SQL null/edge semantics of the
aggregate, window and join operators are never exercised there.  Both
engines implement standard SQL nulls — any divergence (or ANSI abort)
is a real portability bug, same class as the zero-norm cosine kill."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oracle_check as oc  # noqa: E402

_D = dt.datetime


def _mk_tables():
    lineitem = []

    def li(ok, ln, qty, price, disc, tax, rf, ls, ship):
        lineitem.append(
            (ok, (ok * 7) % 50 + 1, (ok * 3) % 20 + 1, ln, qty, price,
             disc, tax, rf, ls, ship)
        )

    ship0 = _D(1995, 3, 1)
    # order 1: normal rows + a NULL quantity + NULL price + NULL flag
    li(1, 1, 10.0, 100.0, 0.05, 0.02, "A", "F", ship0)
    li(1, 2, None, 200.0, 0.0, 0.0, "A", "F", ship0)
    li(1, 3, 5.0, None, 0.1, 0.01, None, "O", ship0)
    # order 2: negative quantity/price (returns), zero price
    li(2, 1, -4.0, -40.0, 0.0, 0.0, "R", "F", _D(1995, 6, 1))
    li(2, 2, 0.0, 0.0, 0.5, 0.08, "R", "F", _D(1995, 6, 2))
    # order 3: duplicate (orderkey, linenumber) pair — dirty feed
    li(3, 1, 7.0, 70.0, 0.07, 0.0, "N", "O", _D(1995, 9, 1))
    li(3, 1, 7.0, 70.0, 0.07, 0.0, "N", "O", _D(1995, 9, 1))
    # order 4: NULL shipdate, empty-string flag
    li(4, 1, 3.0, 30.0, 0.03, 0.0, "", "O", None)
    # bulk normal rows so aggregates have mass
    for i in range(5, 25):
        li(i, 1, float(i), 10.0 * i, 0.01 * (i % 5), 0.01, "NAR"[i % 3],
           "OF"[i % 2], _D(1995, 1 + i % 12, 1 + i % 28))

    orders = []

    def od(ok, ck, st, tp, date, prio):
        orders.append((ok, ck, st, tp, date, prio))

    od(1, 1, "F", 300.0, _D(1995, 2, 1), "1-URGENT")
    od(2, 1, "F", -40.0, _D(1995, 5, 1), "2-HIGH")      # negative total
    od(3, 2, "O", None, _D(1995, 8, 1), "3-MEDIUM")     # NULL totalprice
    od(4, None, "O", 30.0, None, "")                    # NULL custkey+date
    for i in range(5, 25):
        od(i, (i % 3) + 1, "OF"[i % 2], 100.0 + i, _D(1995, 1 + i % 12, 5),
           f"{i % 5 + 1}-P")

    # orphan lineitem (no parent order) and childless order: the nested
    # orders-items view build must neither drop nor fabricate rows
    li(99, 1, 2.0, 20.0, 0.0, 0.0, "A", "F", _D(1995, 4, 1))
    od(25, 2, "O", 50.0, _D(1995, 10, 1), "5-LOW")

    customer = [
        (1, "Customer#1", 0, 100.0, "BUILDING"),
        (2, "Customer#2", 1, -5.0, "AUTOMOBILE"),
        (3, None, 2, None, "BUILDING"),               # NULL name+acctbal
        (4, "Customer#4", 3, 0.0, None),              # no orders; NULL segment
    ]
    return lineitem, orders, customer


_QIDS = (
    # tier-1 capture-DSL surface over the nested orders×items view
    "project_scalar",
    "filter_mask",
    "count_agg",
    "nested_count_cut",
    "nested_filter_agg",
    "nested_minmax_agg",
    "nested_topn_slice",
    "agg_groupby",
    "agg_rollup_cube",
    "agg_grouping_sets",
    "window_rank",
    "sort_limit_topk",
    "join_outer",
    # join_full_outer reads nation.parquet, which this fixture doesn't
    # synthesize; join_outer covers the null outer-join semantics
    "stats_corr_matrix",
    "stats_ols_regression",
    "hist_totalprice",
    "stats_winsorize",
    "join_lateral",
    "join_null_safe",
    "agg_filter_clause",
    "sql_group_by_all",
    # round-4: NULL totalprice/custkey/date exercise the null-count and
    # numeric-min/max paths; duplicate lineitem rows exercise the
    # pair-dedup feeding the PageRank edge list
    "profile_columns",
    "graph_pagerank",
    # round-6: single-customer and NULL-key order fixtures — folds must
    # still partition the orders and the leakage audit must stay 0
    "data_kfold_assign",
    # round-7: common-neighbor link prediction — the NULL-custkey order
    # must drop from the edge list on BOTH engines (NULL % 4096 compares
    # unknown), and the tiny mod graph stresses the anti-join (most
    # candidate pairs ARE edges)
    "graph_common_neighbors",
)


@pytest.fixture(scope="module")
def adv_rel_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_rel_sf")
    li, od, cu = _mk_tables()
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
                "l_partkey": pa.array([r[1] for r in li], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in li], pa.int32()),
                "l_quantity": pa.array([r[4] for r in li], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in li], pa.float64()),
                "l_discount": pa.array([r[6] for r in li], pa.float64()),
                "l_tax": pa.array([r[7] for r in li], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in li], pa.string()),
                "l_linestatus": pa.array([r[9] for r in li], pa.string()),
                "l_shipdate": pa.array([r[10] for r in li], pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in od], pa.int64()),
                "o_custkey": pa.array([r[1] for r in od], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in od], pa.string()),
                "o_totalprice": pa.array([r[3] for r in od], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in od], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in od], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in cu], pa.int64()),
                "c_name": pa.array([r[1] for r in cu], pa.string()),
                "c_nationkey": pa.array([r[2] for r in cu], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in cu], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in cu], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    return str(d)


def test_relational_ops_survive_nulls(spark, adv_rel_dir):
    import duckdb

    from dataframe_expressions_spark.operators.registry import load_all

    load_all()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adv_rel_dir}/{t}.parquet')"
        )
    failures = {}
    for qid in _QIDS:
        try:
            err = oc.run_one(qid, spark, con, adv_rel_dir)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {str(e)[:140]}"
        if err:
            failures[qid] = err
    assert not failures, list(failures.items())
