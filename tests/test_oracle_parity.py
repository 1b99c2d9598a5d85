"""Every registered query vs its DuckDB oracle at sf0.001 (fast CI
tier), PLUS the 50-id driver window at sf0.01 — the driver's own scale.
The r4 verdict flagged that sf0.001-only CI could let a scale-dependent
bug (skew, overflow, sampling thresholds) pass pytest and fail the
driver; the window tier closes exactly that gap for the ids the driver
will actually check this round.  The standalone tests/oracle_check.py
still covers ALL ids at sf0.01 on demand."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE, SF_SMOKE


def _ids():
    from dataframe_expressions_spark.operators.registry import load_all

    return sorted(load_all())


def _window_ids():
    from dataframe_expressions_spark.operators.registry import (
        DRIVER_WINDOW_PRIORITY,
    )

    return list(DRIVER_WINDOW_PRIORITY)


@pytest.fixture(scope="module")
def duck():
    from oracle_check import duck_con

    return duck_con(SF_SMOKE)


@pytest.fixture(scope="module")
def duck_driver_scale():
    from oracle_check import duck_con

    return duck_con(SF_ORACLE)


@pytest.mark.parametrize("qid", _ids())
def test_query_matches_oracle(qid, spark, duck):
    from oracle_check import run_one

    err = run_one(qid, spark, duck, SF_SMOKE)
    assert err is None, err


@pytest.mark.parametrize("qid", _window_ids())
def test_driver_window_matches_oracle_at_driver_scale(
    qid, spark, duck_driver_scale
):
    from oracle_check import run_one

    err = run_one(qid, spark, duck_driver_scale, SF_ORACLE)
    assert err is None, err
