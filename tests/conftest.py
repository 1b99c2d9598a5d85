from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


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
