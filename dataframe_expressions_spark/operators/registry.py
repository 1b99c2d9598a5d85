"""Query registry: the contract between SURVEY.md §2, ``__spark_entry__.py``
and the DuckDB oracle harness.

Every implemented operator registers here with a ``(spark, sf_dir) →
DataFrame`` callable and (when SQL-expressible) the equivalent DuckDB SQL.
Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame as SDF
from pyspark.sql import SparkSession

__all__ = ["Query", "QUERIES", "query"]


@dataclass
class Query:
    id: str
    fn: Callable[[SparkSession, str], SDF]
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check


QUERIES: Dict[str, Query] = {}


def query(qid: str, oracle: Optional[str] = None):
    """Register a query id (SURVEY.md §2 contract name)."""

    def deco(fn: Callable[[SparkSession, str], SDF]):
        QUERIES[qid] = Query(qid, fn, oracle)
        return fn

    return deco


def load_all() -> Dict[str, Query]:
    """Import every operator module so registrations run."""
    from . import tier1, tier2, tier3, tier4  # noqa: F401

    return QUERIES
