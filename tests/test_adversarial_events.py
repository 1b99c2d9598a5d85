"""Adversarial-input parity for the event/window operators: the driver's
events table has well-spread timestamps, so same-instant ties (where the
(ts, event_id) tie-break discipline actually matters), single-event
users, purchase-free clickers, and extreme values never get exercised
there.  Synthetic events built to hit exactly those, compared through
the driver-grade oracle harness."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oracle_check as oc  # noqa: E402

_T0 = dt.datetime(1995, 6, 1, 12, 0, 0)


def _mk_events():
    rows = []
    eid = 0

    def add(ts, user, etype, value, props="{}"):
        nonlocal eid
        eid += 1
        rows.append((eid, ts, user, etype, value, props))

    # user 1: FIVE events at the SAME instant (tie-break stress), then one more
    for et in ("click", "purchase", "click", "signup", "view"):
        add(_T0, 1, et, 10.0)
    add(_T0 + dt.timedelta(minutes=5), 1, "purchase", 20.0)
    # half-open [ts, ts+10m) boundary for join_interval_bucketed: the
    # last covered microsecond is IN, the exact +10m instant is OUT
    add(_T0 + dt.timedelta(minutes=9, seconds=59, microseconds=999999),
        1, "purchase", 21.0)
    add(_T0 + dt.timedelta(minutes=10), 1, "purchase", 22.0)
    # user 2: single event only
    add(_T0, 2, "click", 1.5)
    # user 3: purchase-rich increasing sequence
    for i in range(8):
        add(_T0 + dt.timedelta(minutes=i), 3,
            "purchase" if i % 2 else "click", float(i))
    # user 4: clicks but NO purchase (null nearest-purchase path)
    for i in range(4):
        add(_T0 + dt.timedelta(hours=i), 4, "click", 2.0 * i)
    # user 5: extreme and negative values, same-day spread
    add(_T0, 5, "signup", -1.0e6)
    add(_T0 + dt.timedelta(seconds=1), 5, "signup", 0.0)
    add(_T0 + dt.timedelta(seconds=2), 5, "signup", 123456789.123456)
    add(_T0 + dt.timedelta(seconds=3), 5, "error", -0.000049)
    # user 6: signup-only history (SCD2 with several versions, ts ties)
    add(_T0, 6, "signup", 1.0)
    add(_T0, 6, "signup", 2.0)
    add(_T0 + dt.timedelta(days=1), 6, "signup", 3.0)
    return rows


_QIDS = (
    # round-6: same-instant ties collapse to ONE day bucket; constant
    # day-counts make every scaled CUSUM value 0 (argmax ties on the
    # earliest day)
    "stats_cusum_changepoint",
    "scd2_dimension",
    "join_pit_nearest",
    "window_pattern_match",
    "window_rolling_median",
    "ewma_smooth",
    "anomaly_zscore",
    "rollup_time_hierarchy",
    # single 'view' event in this data → n-1 = 0 exercises the Welch
    # nullif guard (ANSI division would otherwise kill the job)
    "stats_ab_welch",
    # same-instant signup+purchase (inclusive lower bound), the +10m
    # exact-boundary purchase (exclusive upper), and signup-only /
    # purchase-free users (empty join sides)
    "join_interval_bucketed",
    # duplicate values across BOTH cohorts (midrank ties), negative and
    # extreme magnitudes (bucket boundaries), tiny cohort sizes
    "stats_ks_test",
    "stats_mann_whitney",
    # single-user types, same-user-many-types overlap between the
    # per-type and global bitmap rollup levels
    "agg_bitmap_distinct",
    # round-7 batch B: view/click/purchase at the SAME instant (the
    # us >= t1 inclusive lower bound makes t2 = t1, zero latency),
    # click-only and purchase-free users (empty stage sides → NULL
    # latency averages via nullif on both engines)
    "funnel_time_bounded",
    # round-7 batch D: Theil–Sen — same-instant events collapse to one
    # day bucket (single-day groups yield zero pairs on both engines if
    # the series degenerates); integer day deltas keep slopes exact
    "stats_theil_sen_trend",
    # round-9: OLS twin on the same collapsed-day series (2 distinct
    # days here — the denx<>0 path; the single-day denx=0 path gets its
    # own fixture below)
    "stats_ols_trend",
)


@pytest.fixture(scope="module")
def adv_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_events_sf")
    rows = _mk_events()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_event_ops_survive_adversarial_input(spark, adv_events_dir):
    import duckdb

    from dataframe_expressions_spark.operators.registry import load_all

    load_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{adv_events_dir}/events.parquet')"
    )
    failures = {}
    for qid in _QIDS:
        try:
            err = oc.run_one(qid, spark, con, adv_events_dir)
        except Exception as e:  # noqa: BLE001
            err = f"EXC {type(e).__name__}: {e}"
        if err:
            failures[qid] = err
    assert not failures, failures


def test_welch_constant_tiny_cohorts(spark, tmp_path_factory):
    """Catastrophic-cancellation stress: every 'click' and 'view' value is
    the same tiny constant, so Σx² DECIMAL(38,6)-truncates to 0 while
    (Σx)²/n > 0 — the sample variance computes a hair NEGATIVE on both
    engines.  Unclamped, DuckDB's sqrt(negative) hard-aborts the oracle
    (Spark would return NaN) — the greatest(·, 0) radicand clamp and the
    -0.0 normalization on the rounded vars are what this test pins."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_expressions_spark.operators.registry import load_all

    load_all()
    d = tmp_path_factory.mktemp("welch_tiny_sf")
    t0 = dt.datetime(1995, 6, 1, 12, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "click" if i % 2 else "view",
         0.0004, "{}")
        for i in range(8)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    err = oc.run_one("stats_ab_welch", spark, con, str(d))
    assert err is None, err


def test_rank_stats_degenerate_cohorts(spark, tmp_path_factory):
    """ANSI divide-by-zero guards for the rank statistics: (a) ALL values
    identical → Mann-Whitney's tie-corrected sigma is EXACTLY 0 (the
    radicand cancels exactly in IEEE) → z must be NULL, not a job
    abort; (b) one cohort entirely absent → KS has n=0 in a CDF
    denominator and MW has no location to compare → NULL statistics,
    never an exception.  Both run through the same DuckDB oracle compare
    the driver uses, so the NULL contract is pinned on BOTH engines."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import oracle_check as oc
    from dataframe_expressions_spark.operators.registry import load_all

    load_all()
    t0 = dt.datetime(1995, 6, 1, 12, 0, 0)

    def write(d, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                    "ts": pa.array(
                        [t0 + dt.timedelta(minutes=i) for i in range(len(rows))],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array([t for t, _ in rows], pa.string()),
                    "value": pa.array([v for _, v in rows], pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            str(d / "events.parquet"),
        )

    cases = {
        "all_tied": [("purchase", 5.0)] * 3 + [("click", 5.0)] * 4,
        "cohort_absent": [("purchase", float(i)) for i in range(5)],
    }
    failures = {}
    for name, rows in cases.items():
        d = tmp_path_factory.mktemp(f"rank_degen_{name}")
        write(d, rows)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        for qid in ("stats_ks_test", "stats_mann_whitney"):
            try:
                err = oc.run_one(qid, spark, con, str(d))
            except Exception as e:  # noqa: BLE001
                err = f"EXC {type(e).__name__}: {e}"
            if err:
                failures[f"{name}/{qid}"] = err
    assert not failures, failures


def test_ols_trend_single_day_null_fit(spark, tmp_path_factory):
    """Zero-variance guard (round-9 ADVICE): a SINGLE-day corpus makes
    denx = n·Σx² − (Σx)² = 0, where Spark's Divide yields NULL but
    DuckDB's IEEE default yields inf/nan — the CASE WHEN denx <> 0 gate
    must fire identically on both engines, and the fit columns must be
    genuinely NULL (not 0, not nan) while the exact moment sums still
    report."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataframe_expressions_spark.operators.registry import load_all

    qs = load_all()
    d = tmp_path_factory.mktemp("ols_single_day_sf")
    t0 = dt.datetime(1995, 6, 1, 12, 0, 0)
    rows = [
        (i + 1, t0 + dt.timedelta(minutes=i), 1, "click", float(i), "{}")
        for i in range(5)  # five events, ONE calendar day
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    err = oc.run_one("stats_ols_trend", spark, con, str(d))
    assert not err, err
    row = qs["stats_ols_trend"].fn(spark, str(d)).collect()[0]
    assert row["n_days"] == 1 and row["sy"] == 5
    assert row["slope"] is None
    assert row["intercept"] is None
    assert row["r2"] is None
