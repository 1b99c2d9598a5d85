"""Commit-log checkpointing (round 15, r14 VERDICT item 1): the
``_checkpoints/<seq>`` summaries that make version resolution read
O(tail) markers instead of O(versions) on a long log — store-op counts
asserted with a counting CommitStore wrapper, resolution equivalence
asserted against the checkpoint-less full walk, and the OCC/vacuum/
fence interactions driven explicitly."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from dataframe_expressions_spark.sources.commitstore import (
    CommitStore,
    FaultyCommitStore,
    LocalFSCommitStore,
    set_commit_store_factory,
)
from dataframe_expressions_spark.sources import mergetable as mt


class CountingStore(CommitStore):
    """Counts every store op by (op, top-level keyspace) — the
    instrument the O(tail) assertions read."""

    def __init__(self, root):
        self.inner = LocalFSCommitStore(root)
        self.counts: dict = {}
        self._lock = threading.Lock()

    def _bump(self, op, key):
        space = key.split("/", 1)[0]
        with self._lock:
            self.counts[(op, space)] = self.counts.get((op, space), 0) + 1

    def reset(self):
        with self._lock:
            self.counts = {}

    def reads(self, space="_commits"):
        return self.counts.get(("read", space), 0)

    def put_if_absent(self, key, data):
        self._bump("put", key)
        return self.inner.put_if_absent(key, data)

    def read(self, key):
        self._bump("read", key)
        return self.inner.read(key)

    def list(self, prefix):
        self._bump("list", prefix)
        return self.inner.list(prefix)

    def delete(self, key):
        self._bump("delete", key)
        self.inner.delete(key)


@pytest.fixture
def counting():
    stores: dict = {}
    lock = threading.Lock()

    def factory(root):
        with lock:
            if root not in stores:
                stores[root] = CountingStore(root)
            return stores[root]

    set_commit_store_factory(factory)
    try:
        yield stores
    finally:
        set_commit_store_factory(None)


def synth_table(root: str, n_commits: int) -> None:
    """A marker-accurate long log without Spark data writes: each
    version gets its snapshot dir and a protocol-shaped marker (the
    resolution layer under test never opens the parquet)."""
    st = mt.commit_store_for(root)
    for n in range(n_commits):
        os.makedirs(os.path.join(root, f"v{n}"), exist_ok=True)
        st.put_if_absent(  # no-op for already-present markers
            f"_commits/{n}",
            json.dumps(
                {"version": n, "committed_at": time.time() + n * 0.001}
            ).encode(),
        )


def test_resolution_reads_o_tail_markers_on_300_commit_log(counting):
    import tempfile

    root = os.path.join(tempfile.mkdtemp(prefix="ck300"), "t")
    synth_table(root, 300)
    assert mt.write_checkpoint(root) == 0
    store = counting[root]

    store.reset()
    assert mt.committed_versions(root) == list(range(300))
    # one checkpoint read + ZERO marker reads (through_version == 299,
    # empty tail); listing _commits is one op, not O(versions)
    assert store.reads("_commits") == 0
    assert store.reads("_checkpoints") == 1
    assert store.counts.get(("list", "_commits"), 0) == 1

    # grow a tail past the checkpoint: resolution reads ONLY the tail
    synth_table(root, 305)  # adds 300..304 (lower puts no-op)
    store.reset()
    assert mt.committed_versions(root) == list(range(305))
    assert store.reads("_commits") == 5

    # version_as_of is one _log_state pass too — no per-version walk
    store.reset()
    assert mt.version_as_of(root, time.time() + 3600) == 304
    assert store.reads("_commits") == 5

    # a fresh checkpoint re-covers the log and reuses the previous
    # checkpoint's records (no re-read of the 300 covered markers)
    store.reset()
    assert mt.write_checkpoint(root) == 1
    assert store.reads("_commits") == 5


def test_checkpoint_resolution_equivalent_to_full_walk(counting):
    """The driver-facing invariant: checkpointed resolution and the
    checkpoint-less full marker walk agree exactly — committed set,
    latest, timestamp travel — including across fenced gaps."""
    import shutil
    import tempfile

    root = os.path.join(tempfile.mkdtemp(prefix="ckeq"), "t")
    synth_table(root, 40)
    # poke a fenced gap and an orphan (marker-less dir) into the log
    st = mt.commit_store_for(root)
    st.delete("_commits/17")
    assert mt._publish_fence(root, 17)
    st.delete("_commits/23")  # marker gone, dir remains: orphan

    assert mt.write_checkpoint(root) is not None
    with_ck = mt.committed_versions(root)
    asof_ck = mt.version_as_of(root, time.time() + 3600)

    # remove the checkpoints: the full walk is the ground truth
    shutil.rmtree(os.path.join(root, "_checkpoints"))
    full = mt.committed_versions(root)
    asof_full = mt.version_as_of(root, time.time() + 3600)

    want = [n for n in range(40) if n not in (17, 23)]
    assert with_ck == full == want
    assert asof_ck == asof_full == 39


def test_cadence_writes_checkpoints_automatically(spark, tmp_path):
    """Real commits through the public paths: crossing a multiple of
    CHECKPOINT_EVERY leaves a checkpoint behind, and reads keep
    resolving identically before and after."""
    root = str(tmp_path / "cad")
    for n in range(mt.CHECKPOINT_EVERY + 2):
        mt.commit_snapshot(
            spark.createDataFrame([(n, float(n))], "k long, v double"),
            root,
            n,
        )
    names = os.listdir(os.path.join(root, "_checkpoints"))
    assert names, "no checkpoint written at the cadence multiple"
    ck = mt._latest_checkpoint(root)
    assert ck["through_version"] == mt.CHECKPOINT_EVERY
    assert mt.committed_versions(root) == list(
        range(mt.CHECKPOINT_EVERY + 2)
    )
    got = {r.k: r.v for r in mt.read_version(spark, root).collect()}
    assert got == {mt.CHECKPOINT_EVERY + 1: float(mt.CHECKPOINT_EVERY + 1)}


def test_vacuum_intersection_refresh_and_retirement(spark, tmp_path):
    """Vacuum under a checkpoint: dropped versions vanish from
    resolution immediately (marker-listing intersection — even while
    the old checkpoint still names them), the refreshed checkpoint
    stops carrying their records, superseded checkpoints are retired,
    and swept reads classify as VersionVacuumedError."""
    root = str(tmp_path / "ckvac")
    for n in range(12):
        mt.commit_snapshot(
            spark.createDataFrame([(n,)], "k long"), root, n
        )
    assert mt._latest_checkpoint(root) is not None

    dropped = mt.vacuum(root, keep=3)
    assert dropped == list(range(9))
    assert mt.committed_versions(root) == [9, 10, 11]
    ck = mt._latest_checkpoint(root)
    # refreshed: the live checkpoint no longer names swept versions
    assert set(map(int, ck["info"])) == {9, 10, 11} - {
        n for n in (10, 11) if n > ck["through_version"]
    }
    assert ck["committed"] == [n for n in (9, 10, 11) if n <= ck["through_version"]]
    # retirement: only the newest checkpoint survives
    seqs = [
        int(x)
        for x in os.listdir(os.path.join(root, "_checkpoints"))
        if x.isdigit()
    ]
    assert seqs == [ck["_seq"]]
    with pytest.raises(mt.VersionVacuumedError):
        mt.read_version(spark, root, 2)
    # a torn/stale checkpoint NEVER resurrects swept versions: plant
    # the pre-vacuum state back as a NEWER checkpoint and re-resolve
    stale = dict(ck)
    stale["committed"] = list(range(12))
    stale["info"] = {
        str(n): {"committed_at": 0.0} for n in range(12)
    }
    stale["through_version"] = 11
    stale.pop("_seq", None)
    assert mt.commit_store_for(root).put_if_absent(
        f"_checkpoints/{ck['_seq'] + 1}", json.dumps(stale).encode()
    )
    assert mt.committed_versions(root) == [9, 10, 11]


def test_write_checkpoint_survives_ack_loss_and_races(tmp_path):
    """The OCC publish dance under a faulty store: with every put's
    ack lost, write_checkpoint still lands exactly one usable
    checkpoint (lost-ack stand-down), and concurrent writers from two
    threads land a consistent newest checkpoint."""
    stores: dict = {}
    lock = threading.Lock()

    def factory(root):
        with lock:
            if root not in stores:
                stores[root] = FaultyCommitStore(
                    LocalFSCommitStore(root), ack_loss_every=1
                )
            return stores[root]

    set_commit_store_factory(factory)
    try:
        root = str(tmp_path / "ckocc")
        # markers must pre-exist: put them through the INNER store so
        # the fault plan only exercises the checkpoint publishes
        inner = LocalFSCommitStore(root)
        for n in range(15):
            os.makedirs(os.path.join(root, f"v{n}"))
            inner.put_if_absent(
                f"_commits/{n}",
                json.dumps(
                    {"version": n, "committed_at": time.time()}
                ).encode(),
            )
        # lost ack on the put: write_checkpoint must recognise its own
        # landed checkpoint (through_version coverage) and stand down
        assert mt.write_checkpoint(root) is None  # ack lost, but landed
        assert mt._latest_checkpoint(root)["through_version"] == 14
        assert mt.committed_versions(root) == list(range(15))

        # concurrent writers: both return, newest checkpoint is usable
        for n in range(15, 20):
            os.makedirs(os.path.join(root, f"v{n}"))
            inner.put_if_absent(
                f"_commits/{n}",
                json.dumps(
                    {"version": n, "committed_at": time.time()}
                ).encode(),
            )
        errs: list = []

        def w():
            try:
                mt.write_checkpoint(root)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=w) for _ in range(2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        assert mt._latest_checkpoint(root)["through_version"] == 19
        assert mt.committed_versions(root) == list(range(20))
    finally:
        set_commit_store_factory(None)


def test_feed_since_reads_o_range_markers_under_checkpoint(
    spark, tmp_path, counting
):
    """A caught-up-ish consumer on a checkpointed log: feed_since from
    a late cursor reads the checkpoint plus the few range/tail markers
    — not one marker per historical version."""
    root = str(tmp_path / "ckfeed")
    for n in range(13):
        mt.commit_snapshot(
            spark.createDataFrame(
                [(k, float(n)) for k in range(4)], "k long, val double"
            ),
            root,
            n,
            meta={"step": n},
        )
    store = counting[root]
    assert mt._latest_checkpoint(root) is not None
    store.reset()
    feed = mt.feed_since(spark, root, 11, on="k")
    rows = feed.collect()
    # one diff step (11 -> 12): every k updated, pre+post images
    assert {r.change_type for r in rows} == {
        "update_preimage", "update_postimage"
    }
    assert {r._commit_version for r in rows} == {12}
    # marker reads: two _log_state passes (latest + committed walk,
    # tail of 2 each) + the diff endpoints' commit_meta/read_version
    # metadata — a constant ~10, not one read per historical version
    # (the checkpoint-less walk pays 13 for EACH committed_versions
    # call alone and grows with every commit; this does not)
    assert store.reads("_commits") <= 12
