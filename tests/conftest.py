from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from dataframe_expressions_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(autouse=True)
def _reset_aliases():
    from dataframe_expressions_spark import clear_aliases

    clear_aliases()
    yield
    clear_aliases()
