"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (TPC-H Q1 shape through the capture
DSL) at sf0.001; ``queries``/``oracle_sql`` expose the operator registry
(dataframe_expressions_spark/operators/) keyed by SURVEY.md §2 ids.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_expressions_spark.operators.registry import load_all  # noqa: E402

_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["agg_groupby"].fn(spark, _SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {qid: q.fn for qid, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    return {qid: q.oracle for qid, q in load_all().items() if q.oracle is not None}
