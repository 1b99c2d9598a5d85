"""Every registered query vs its DuckDB oracle at sf0.001 (fast CI tier;
the standalone tests/oracle_check.py runs the same at sf0.01 like the
driver's t2 gate)."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


def _ids():
    from dataframe_expressions_spark.operators.registry import load_all

    return sorted(load_all())


@pytest.fixture(scope="module")
def duck():
    from oracle_check import duck_con

    return duck_con(SF_SMOKE)


@pytest.mark.parametrize("qid", _ids())
def test_query_matches_oracle(qid, spark, duck):
    from oracle_check import run_one

    err = run_one(qid, spark, duck, SF_SMOKE)
    assert err is None, err
