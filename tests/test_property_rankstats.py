"""Property-based check of the two-phase rank statistics: stats_ks_test
and stats_mann_whitney must equal direct pure-Python references on random
cohorts.  This targets the places the bucketed prefix-sum decomposition
could silently diverge from the textbook single-pass form: bucket
boundaries landing exactly on a value (floor(v/10) edges), duplicate
values inside and across cohorts (midranks), negative values (truncating
vs floor division), and single-element cohorts.

The operators read the events table and fix cohorts to purchase/click, so
random values are written as those two event types; the reference
implementation IS the oracle here (DuckDB parity of the same operators is
covered by tests/test_oracle_parity.py and the adversarial events suite).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_ks(a: list[float], b: list[float]) -> float:
    """Exact two-sample KS D via per-distinct-value step CDFs."""
    xs = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    d = 0.0
    for x in xs:
        fa = sum(1 for v in a if v <= x) / na
        fb = sum(1 for v in b if v <= x) / nb
        d = max(d, abs(fa - fb))
    return d


def _ref_mw(a: list[float], b: list[float]) -> tuple[float, float]:
    """Mann-Whitney U_a with midranks and tie-corrected z."""
    combined = sorted(a + b)
    # midrank per distinct value
    ranks: dict[float, float] = {}
    i = 0
    while i < len(combined):
        j = i
        while j < len(combined) and combined[j] == combined[i]:
            j += 1
        ranks[combined[i]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    na, nb = len(a), len(b)
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - na * (na + 1) / 2.0
    n = na + nb
    tie3 = 0.0
    for x in set(combined):
        t = combined.count(x)
        tie3 += t**3 - t
    sigma2 = na * nb / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u_a - na * nb / 2.0) / math.sqrt(sigma2)
    return u_a, z


# values snapped to a 0.5 grid so ties are common, spanning negatives and
# exact bucket edges (±10.0, 0.0, 20.0)
_vals = st.lists(
    st.sampled_from(
        [-20.0, -10.0, -9.5, -0.5, 0.0, 0.5, 3.0, 9.5, 10.0, 10.5, 20.0, 31.5]
    ),
    min_size=1,
    max_size=20,
)

_T0 = dt.datetime(1996, 3, 1, 12, 0, 0)


def _write_events(d, a_vals, b_vals):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [("purchase", v) for v in a_vals] + [("click", v) for v in b_vals]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                "ts": pa.array(
                    [_T0 + dt.timedelta(minutes=i) for i in range(len(rows))],
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


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_vals, _vals)
def test_rank_stats_match_reference(spark, tmp_path_factory, a_vals, b_vals):
    from dataframe_expressions_spark.operators.registry import load_all

    # n-1 in the z denominator needs two observations; the tie-corrected
    # sigma is 0 when ALL values are identical — both are degenerate
    # inputs the operator is not defined on (stats_ab_welch covers the
    # guarded-degenerate contract); skip, don't mask, per hypothesis norms
    if len(set(a_vals) | set(b_vals)) < 2:
        return

    d = tmp_path_factory.mktemp("prop_rank")
    _write_events(d, a_vals, b_vals)
    qs = load_all()

    ks = qs["stats_ks_test"].fn(spark, str(d)).collect()[0]
    assert ks["n_a"] == len(a_vals) and ks["n_b"] == len(b_vals)
    assert ks["d_stat"] == pytest.approx(
        _ref_ks(a_vals, b_vals), abs=1.5e-6
    )

    mw = qs["stats_mann_whitney"].fn(spark, str(d)).collect()[0]
    ref_u, ref_z = _ref_mw(a_vals, b_vals)
    assert mw["u_a"] == pytest.approx(ref_u, abs=1.5e-6)
    assert mw["z"] == pytest.approx(ref_z, abs=1.5e-6)


# ---------------------------------------------------------------------------
# two_phase_rank ≡ row_number, property-based (round 8)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            # group, with NULLs: native windows keep a NULL partition,
            # so the null-safe join path must too (round-9 ADVICE)
            st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
            # key (heavy ties), with NULLs: NULLS FIRST under ASC
            st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
        ),
        min_size=1,
        max_size=80,
    ),
    n_buckets=st.sampled_from([1, 3, 8]),
)
def test_two_phase_rank_equals_row_number(spark, rows, n_buckets):
    """For ANY grouped, tie-heavy input — including NULL group values
    and NULL keys (all-NULL key groups exercise the NULL-_cuts branch)
    — and ANY bucket count, the range-partitioned rank must equal the
    native window rank row for row — cut placement (including every cut
    landing on one tied key, or n_buckets=1 degenerating to the native
    shape) may only move work between buckets, never ranks across
    them."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dataframe_expressions_spark.functions.ranks import two_phase_rank

    df = spark.createDataFrame(
        [(g, k, i) for i, (g, k) in enumerate(rows)], "g int, k int, t int"
    )
    want = df.select(
        "g",
        "t",
        F.row_number().over(W.partitionBy("g").orderBy("k", "t")).alias("r"),
    )
    got = two_phase_rank(df, ["g"], "k", "t", "r", n_buckets=n_buckets).select(
        "g", "t", "r"
    )
    def _nkey(t):  # None-safe sort key for the python-side comparison
        return tuple((v is None, v) for v in t)

    assert sorted(map(tuple, got.collect()), key=_nkey) == sorted(
        map(tuple, want.collect()), key=_nkey
    )
