"""The external driver hands the engine its OWN vanilla SparkSession —
none of session.py's confs (timezone, nanosAsLong, AQE, Arrow) can be
assumed.  Round 3 nearly shipped a probe that crashed every query on
exactly such a session (conf.get validates its fallback for confs never
set explicitly).  This guard drives representative registry entries in a
SUBPROCESS with a deliberately unconfigured session — in-process a
getOrCreate would silently reuse the tuned test session and hide the
problem.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from conftest import SF_SMOKE

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo_root!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("plain-session-guard").config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
# one batch-events, one streaming, one scan, one pandas-UDF query
for qid in ("map_funcs", "session_window", "scan_parquet", "grouped_map_pandas",
            "sql_recursive_cte", "pipeline_pretrain_corpus",
            # round-4 driver-window representatives: events-sufficient-stats,
            # native XML source, iterative checkpointed graph loop, and the
            # broadcast-codebook embedding path
            "stats_ab_welch", "scan_xml", "graph_pagerank", "dedup_semantic",
            # Python DataSource API (batch + streaming) registration must
            # work on a session that never saw session.py's confs
            "scan_python_datasource", "stream_python_datasource"):
    n = qs[qid](spark, {smoke_dir!r}).count()
    assert n >= 0, qid
print("PLAIN_SESSION_OK")
"""


def test_registry_runs_on_vanilla_session():
    if not os.path.isdir(SF_SMOKE):
        pytest.skip(f"testdata dir {SF_SMOKE} not present")
    script = _SCRIPT.format(repo_root=_REPO_ROOT, smoke_dir=SF_SMOKE)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert "PLAIN_SESSION_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
