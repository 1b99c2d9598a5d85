"""session_window gap-boundary parity (VERDICT r2 item 5 / r1 ADVICE 3).

Pinned empirically (this test): Spark's session_window merges two
sessions when the next event's start is <= the previous session's end —
an event at EXACTLY gap distance still merges.  The oracle therefore
tests same-session membership with '<=' (NOT strict '<' — round 1's
assumption of [t, t+gap) strict-overlap merging was wrong at the
boundary).  Synthetic corpus: exact-gap, 1 us-under-gap, and
1 us-over-gap cases — the cases sf-scale data can't be relied on to
produce.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from dataframe_expressions_spark.operators.registry import QUERIES, load_all
from tests.oracle_check import compare_frames

_T0 = dt.datetime(2024, 3, 1, 9, 0, 0)
_GAP = dt.timedelta(minutes=30)
_US = dt.timedelta(microseconds=1)
_EVENTS = [
    # user 1: gap of exactly 30:00 between e1 and e2 → still ONE session
    # (<= merge); e3 10 min later extends it
    (1, 1, _T0),
    (2, 1, _T0 + _GAP),
    (3, 1, _T0 + _GAP + dt.timedelta(minutes=10)),
    # user 2: gap of 29:59.999999 → one session
    (4, 2, _T0),
    (5, 2, _T0 + _GAP - _US),
    # user 3: gap of 30:00.000001 → TWO sessions
    (6, 3, _T0),
    (7, 3, _T0 + _GAP + _US),
]


def _stage(tmp_path) -> str:
    table = pa.table(
        {
            "event_id": pa.array([e[0] for e in _EVENTS]),
            "ts": pa.array([e[2] for e in _EVENTS], type=pa.timestamp("us")),
            "user_id": pa.array([e[1] for e in _EVENTS]),
            "event_type": pa.array(["view"] * len(_EVENTS)),
            "value": pa.array([1.0] * len(_EVENTS)),
            "props": pa.array(["{}"] * len(_EVENTS)),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_exact_gap_merges_session(spark, tmp_path):
    sf_dir = _stage(tmp_path)
    load_all()
    q = QUERIES["session_window"]

    spark_pdf = q.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    duck_pdf = con.execute(q.oracle).fetchdf()

    assert compare_frames(spark_pdf, duck_pdf) is None

    by_user = spark_pdf.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    u1 = by_user[by_user.user_id == 1]  # exact gap: merged, one session of 3
    assert list(u1.n) == [3]
    assert list(u1.session_start) == [_T0]
    u2 = by_user[by_user.user_id == 2]  # 1 us under the gap: one session
    assert list(u2.n) == [2]
    u3 = by_user[by_user.user_id == 3]  # 1 us over the gap: splits
    assert list(u3.n) == [1, 1]
    assert list(u3.session_start) == [_T0, _T0 + _GAP + _US]
