"""The versioned table as a streaming source
(streaming/table_source.py, round 12): offset=version checkpointing,
restart recovery, per-bucket partition planning, CDF image contract,
and the scope guardrails."""

from __future__ import annotations

import os

import pytest

import dataframe_expressions_spark.sources.mergetable as mt
from dataframe_expressions_spark.streaming.table_source import (
    _step_partitions,
    register_table_stream_source,
)

CLAUSES = dict(
    matched_update={"val": "t.val + s.amt"},
    not_matched_insert={"val": "s.amt"},
)


def _mk_table(spark, root, n=20, nb=4):
    v0 = spark.createDataFrame(
        [(k, float(k)) for k in range(n)], "k long, val double"
    )
    mt.commit_bucketed(v0, root, 0, on="k", n_buckets=nb, hashed=False)


def _drain(spark, root, ckpt, landing):
    fmt = register_table_stream_source(spark)
    q = (
        spark.readStream.format(fmt)
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", landing)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sorted(tuple(r) for r in spark.read.parquet(landing).collect())


def test_stream_source_feed_and_restart_recovery(spark, tmp_path):
    """One drain delivers the full CDF of the outstanding range (both
    update images + inserts, correct _commit_version stamps); a RESTART
    from the same checkpoint after a new commit consumes ONLY the new
    step — no rows lost at the stop boundary, none replayed after it
    (offsets are versions; versions are immutable)."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root)
    chg = spark.createDataFrame(
        [(0, 5.0), (21, 7.0)], "k long, amt double"
    )
    mt.merge_into_bucketed(spark, root, chg, **CLAUSES)
    ckpt, landing = str(tmp_path / "ckpt"), str(tmp_path / "landing")
    rows = _drain(spark, root, ckpt, landing)
    assert rows == [
        (0, 0.0, "update_preimage", 1),
        (0, 5.0, "update_postimage", 1),
        (21, 7.0, "insert", 1),
    ]
    mt.merge_into_bucketed(
        spark,
        root,
        spark.createDataFrame([(1, 100.0)], "k long, amt double"),
        **CLAUSES,
    )
    rows2 = _drain(spark, root, ckpt, landing)
    assert sorted(set(rows2) - set(rows)) == [
        (1, 1.0, "update_preimage", 2),
        (1, 101.0, "update_postimage", 2),
    ]
    assert len(rows2) == len(rows) + 2  # nothing replayed


def test_stream_source_partition_planning_is_bucket_scoped(
    spark, tmp_path
):
    """partitions() plans ONE partition per manifest-differing bucket
    per step — by-reference buckets are provably unchanged and never
    read (the 2k/B feed bound, now at task granularity)."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root, n=40, nb=8)
    # keys 0 and 8 both land in bucket 0 (modulo 8); key 3 in bucket 3
    chg = spark.createDataFrame(
        [(0, 1.0), (8, 1.0), (3, 1.0)], "k long, amt double"
    )
    mt.merge_into_bucketed(spark, root, chg, **CLAUSES)
    parts = _step_partitions(root, 0)
    assert len(parts) == 2  # buckets {0, 3} only, not all 8
    got_buckets = set()
    for cv, keys, pre_rel, post_rel in parts:
        assert cv == 1 and keys == ["k"]
        assert len(pre_rel) == 1 and len(post_rel) == 1
        got_buckets.add(pre_rel[0].rsplit("=", 1)[1])
    assert got_buckets == {"0", "3"}


def test_stream_source_delete_rows_and_start_version(spark, tmp_path):
    """A MERGE delete clause surfaces as 'delete' feed rows, and
    start_version= skips already-consumed history."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root)
    mt.merge_into_bucketed(
        spark,
        root,
        spark.createDataFrame([(2, 1.0)], "k long, amt double"),
        **CLAUSES,
    )
    mt.merge_into_bucketed(
        spark,
        root,
        spark.createDataFrame([(4, 0.0)], "k long, amt double"),
        matched_update={"val": "t.val"},
        not_matched_insert={"val": "s.amt"},
        matched_delete="t.val >= 0",
    )
    ckpt, landing = str(tmp_path / "c2"), str(tmp_path / "l2")
    fmt = register_table_stream_source(spark)
    q = (
        spark.readStream.format(fmt)
        .option("root", root)
        .option("start_version", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", landing)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = sorted(tuple(r) for r in spark.read.parquet(landing).collect())
    assert rows == [(4, 4.0, "delete", 2)]  # v1 history skipped


def test_stream_source_plain_table_and_guardrails(spark, tmp_path):
    """Plain (non-bucketed) tables feed with an explicit keys= option
    (full-diff partitions), raise without it, and MoR versions raise
    loudly at plan time."""
    root = str(tmp_path / "plain")
    mt.commit_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        root,
        0,
    )
    mt.commit_snapshot(
        spark.createDataFrame([(1, "a2"), (2, "b")], "k long, v string"),
        root,
        1,
    )
    fmt = register_table_stream_source(spark)
    ckpt, landing = str(tmp_path / "c"), str(tmp_path / "l")
    q = (
        spark.readStream.format(fmt)
        .option("root", root)
        .option("keys", "k")
        .load()
        .writeStream.format("parquet")
        .option("path", landing)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = sorted(tuple(r) for r in spark.read.parquet(landing).collect())
    assert rows == [
        (1, "a", "update_preimage", 1),
        (1, "a2", "update_postimage", 1),
    ]
    # no keys option: plan-time error surfaces as a stream failure
    q2 = (
        spark.readStream.format(fmt)
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "l3"))
        .option("checkpointLocation", str(tmp_path / "c3"))
        .start()
    )
    with pytest.raises(Exception, match="key columns"):
        q2.processAllAvailable()
    q2.stop()
    # MoR delete version: loud refusal at plan time
    mt.commit_mor_delete(spark, root, "k = 2", on="k")
    with pytest.raises(ValueError, match="compact_mor"):
        _step_partitions(root, 1)


def test_stream_source_schema_mapping_guard(spark, tmp_path):
    """An unmapped arrow type (timestamp) raises loudly at schema
    declaration instead of mis-declaring the feed schema."""
    from dataframe_expressions_spark.streaming.table_source import (
        _table_ddl,
    )

    root = str(tmp_path / "ts")
    df = spark.sql(
        "SELECT 1 AS k, TIMESTAMP '2024-01-01 00:00:00' AS ts"
    )
    mt.commit_snapshot(df, root, 0, n_files=1)
    with pytest.raises(ValueError, match="no DDL mapping"):
        _table_ddl(root)
    root2 = str(tmp_path / "ok")
    mt.commit_snapshot(
        spark.createDataFrame([(1, 2.0, "x")], "k long, v double, s string"),
        root2,
        0,
        n_files=1,
    )
    ddl, names = _table_ddl(root2)
    assert names == ["k", "v", "s"]
    assert "change_type` string" in ddl and "_commit_version` bigint" in ddl


def test_stream_source_bigint_null_fidelity(spark, tmp_path):
    """An int64 column holding NULLs must survive the Arrow diff
    exactly: plain to_pandas would upcast to float64 and corrupt
    values above 2^53 (round-12 review) — nullable Int dtypes keep
    them exact, and NULLs emit as NULL."""
    big = 9007199254740993  # 2**53 + 1: float64 cannot represent it
    root = str(tmp_path / "tbl")
    mt.commit_snapshot(
        spark.createDataFrame(
            [(1, big), (2, None), (3, 7)], "k long, val long"
        ),
        root,
        0,
        n_files=1,
    )
    mt.commit_snapshot(
        spark.createDataFrame(
            [(1, big), (2, big + 2), (3, None)], "k long, val long"
        ),
        root,
        1,
        n_files=1,
    )
    fmt = register_table_stream_source(spark)
    q = (
        spark.readStream.format(fmt)
        .option("root", root)
        .option("keys", "k")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "l"))
        .option("checkpointLocation", str(tmp_path / "c"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "l")).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert rows == [
        (2, big + 2, "update_postimage", 1),
        (2, None, "update_preimage", 1),
        (3, None, "update_postimage", 1),
        (3, 7, "update_preimage", 1),
    ]


def test_stream_source_spans_version_gaps(spark, tmp_path):
    """A skipped dead-claimant orphan inside the committed range must
    not break the stream: partitions() pairs consecutive COMMITTED
    versions, so the gap's step folds into the surrounding pair's diff
    (stamped with the later committed version)."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root, n=10)
    os.makedirs(os.path.join(root, "v1"))  # dead claimant's orphan
    n = mt.merge_into_bucketed_exclusive(
        spark,
        root,
        spark.createDataFrame([(0, 3.0)], "k long, amt double"),
        marker_timeout=0.3,
        **CLAUSES,
    )
    assert n == 2 and mt.committed_versions(root) == [0, 2]
    rows = _drain(
        spark, root, str(tmp_path / "c"), str(tmp_path / "l")
    )
    assert rows == [
        (0, 0.0, "update_preimage", 2),
        (0, 3.0, "update_postimage", 2),
    ]
