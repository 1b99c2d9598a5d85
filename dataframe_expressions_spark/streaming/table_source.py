"""The versioned table as a Structured Streaming SOURCE (round 12, r11
VERDICT item 2): a Spark 4 Python streaming DataSource whose OFFSET is
the commit VERSION of a sources/mergetable.py table, and whose batches
are the table's CHANGE DATA FEED — the engine-native incremental
contract (Delta's ``readStream`` on a table / ``readChangeFeed``),
replacing driver-side foreachBatch polling with checkpointed offsets.

Design — each piece priced for 100 TB:

* **Offsets are versions, with the committed chain PINNED.**
  ``initialOffset`` = the caller's starting version (``start_version``
  option, default 0 = feed everything after v0); ``latestOffset`` =
  the table's current committed version PLUS the committed-version
  chain up to it.  Spark checkpoints the offset per batch, so restart
  recovery replays exactly the outstanding range — and because
  versions are immutable AND the chain rides in the offset, a replayed
  batch re-plans exactly the original diff steps even if a stalled
  claimant fills a version gap after the first planning: exactly-once
  without a transactional sink.  Retention caveat (standard for every
  log-backed source): offsets must not outlive vacuum — a start offset
  with no committed version at or before it raises loudly, and a
  vacuumed INTERIOR version folds its step into the surrounding pair's
  diff (cumulative state change identical; at-least-once only if the
  checkpoint itself predates the retained history).
* **Partitions are (commit step, bucket) diffs.**  ``partitions(start,
  end)`` plans one input partition per commit step per CHANGED bucket
  (manifest fast path: identical manifest entry ⇒ identical immutable
  files ⇒ no changes — only differing buckets are read, the same 2k/B
  bound as ``table_changes``).  Non-bucketed snapshots fall back to one
  partition per step (full diff).  Planning is driver-side JSON marker
  reads; NO data files are touched at plan time.
* **The diff runs executor-side in Arrow.**  ``read(partition)`` loads
  the pre/post bucket directories with pyarrow and computes the
  key-level diff in pandas — insert / delete / update_preimage /
  update_postimage, the Delta CDF image contract ``_diff_changes``
  implements Spark-side, restated over Arrow batches because a Python
  DataSource partition cannot hold a SparkSession.  Per partition the
  work is two bucket-dir reads + one hash merge: the unit a
  1000-executor cluster schedules as one task.

* **Merge-on-read delete commits plan as O(k) delete steps** (round
  13, r12 VERDICT item 3): a step whose post version is a MoR delete
  on the pre version reads the O(deleted keys) key file plus the
  resolved pre state and emits pure ``delete`` rows with the resolved
  pre-images — the same coverage ``feed_since`` already had, so the
  two CDF consumers agree.  Any other MoR-involving step (compaction
  retiring a chain, chains across gaps) resolves BOTH sides through
  the delete chain executor-side and diffs the resolved content —
  content-exact, conservatively O(base) for that step.
* **Offsets are BOUNDED** (round 13, r12 VERDICT item 4): instead of
  pinning the whole committed chain (O(commits) per checkpointed
  offset), ``latestOffset`` pins only the chain SEGMENT since the
  previous poll plus the anchor version at its base — O(new commits)
  ≈ O(1) in steady state.  Replay stays deterministic because the
  segment rides in the checkpointed end offset; offsets from older
  checkpoints (full-chain pins, or a start the segment does not
  cover) fall back to re-deriving the committed listing — the
  documented legacy path.

Scope guards: plain tables need the ``keys`` option since they carry
no bucket spec to derive key columns from; a bucket-spec CHANGE
across the range degrades that step to one conservative
whole-snapshot diff partition (content-correct, O(table) for that
step — re-bucketing invalidates the manifest fast path's
identical-entry reasoning, not the diff itself).

NaN caveat (documented contract, r12 ADVICE): double/float columns
cross the Arrow→pandas diff as numpy floats, where stored NULL and
stored NaN both surface as NaN — the emitted feed therefore reports
NULL for both (and treats NaN == NaN as unchanged, so no spurious
updates).  Preserving the NULL/NaN distinction would need an
arrow-native diff kernel (pandas' masked FloatingArray collapses NaN
into NA in comparisons, isna and tolist alike); the table format
itself stores the distinction losslessly.

Reference parity note: gordonwatts/dataframe_expressions is a
capture-only front end (no streaming, no storage; SURVEY.md §1) — this
module is extension scope, expressed on public Spark 4 DataSource and
commit-log designs.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional, Tuple

__all__ = ["MergeTableStreamSource", "register_table_stream_source"]

_FORMAT_NAME = "spark_graft_table_stream"

# arrow type name -> Spark DDL type, for the schema the source declares.
# Deliberately small: the table format's ledgers use exactly these;  an
# unmapped type raises loudly rather than mis-declaring a schema.
_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "float32": "float",
    "double": "double",
    "float64": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
}


def _marker(root: str, n: int) -> dict:
    """Version ``n``'s commit metadata — delegated to the table
    format's own reader so commit-log semantics live in ONE place
    (round-12 review: a hand-rolled copy here would silently miss the
    next change to marker resolution).  Driver-side only."""
    from ..sources.mergetable import commit_meta

    return commit_meta(root, n)


def _latest_version(root: str) -> Optional[int]:
    from ..sources.mergetable import latest_version

    return latest_version(root)


def _dir_parquet_files(root: str, rel: str) -> List[str]:
    d = os.path.join(root, rel)
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]


def _sample_parquet_file(root: str) -> str:
    """One data file of the latest committed version — the schema
    anchor.  Bucketed versions resolve through the manifest (the files
    may live under older version dirs)."""
    n = _latest_version(root)
    if n is None:
        raise FileNotFoundError(f"no committed version under {root}")
    while n >= 0:
        try:
            meta = _marker(root, n)
        except (FileNotFoundError, json.JSONDecodeError):
            n -= 1  # vacuumed/partial marker: keep looking back
            continue
        man = meta.get("manifest")
        rels = sorted(man.values()) if man else [f"v{n}"]
        for rel in rels:
            try:
                files = _dir_parquet_files(root, rel)
            except OSError:
                files = []  # vacuumed data dir
            if files:
                return files[0]
        n -= 1  # empty version (e.g. an all-delete merge): look back
    raise FileNotFoundError(f"no parquet data under any version of {root}")


def _table_ddl(root: str) -> Tuple[str, List[str]]:
    """(DDL schema for the CHANGE FEED, table column names): the
    table's own columns in parquet order plus ``change_type`` and
    ``_commit_version``."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(_sample_parquet_file(root))
    parts, names = [], []
    for field in sch:
        ddl = _ARROW_TO_DDL.get(str(field.type))
        if ddl is None:
            raise ValueError(
                f"table stream source: no DDL mapping for arrow type "
                f"{field.type} (column {field.name!r})"
            )
        parts.append(f"`{field.name}` {ddl}")
        names.append(field.name)
    parts.append("`change_type` string")
    parts.append("`_commit_version` bigint")
    return ", ".join(parts), names


def _resolved_view(root: str, n: int) -> tuple:
    """Version ``n`` as (data_rel_dirs, delete_chain, base_meta): a
    MERGE-ON-READ delete version resolves through its base chain —
    the data dirs are the plain/bucketed ancestor's, and
    ``delete_chain`` lists (delete_rel, key_cols) specs, newest first,
    to anti-join away executor-side (the pandas twin of
    ``read_version``'s stacked broadcast anti-joins)."""
    m = _marker(root, n)
    dels: List[tuple] = []
    v = n
    while "mor_base" in m:
        dels.append((m["delete_rel"], list(m["delete_key"])))
        v = m["mor_base"]
        m = _marker(root, v)
    man = m.get("manifest")
    rels = sorted(man.values()) if man else [f"v{v}"]
    return rels, dels, m


def _step_partitions(root: str, v: int, w: Optional[int] = None) -> List[tuple]:
    """Plan the diff of the commit step ``v`` -> ``w`` (consecutive
    COMMITTED versions — ``w`` defaults to ``v + 1`` but callers must
    pass the true committed successor: the version sequence may have
    gaps from skipped dead-claimant OCC orphans, and a gap's changes
    fold into the surrounding committed pair's diff).  One partition
    per changed bucket under the manifest fast path; ONE O(k)
    delete-keys partition when ``w`` is a MoR delete on ``v``'s
    resolved state (round 13); one whole-snapshot resolved-diff
    partition otherwise.  Partition value: (commit_version, key_cols,
    pre_rel_dirs, pre_delete_chain, post_rel_dirs, post_delete_chain)
    — ``post_rel_dirs=None`` marks the delete-keys kind, with the NEW
    delete specs in the last slot.  All JSON-ish, picklable, and
    deterministic (immutable versions ⇒ deterministic replay)."""
    if w is None:
        w = v + 1
    pre, post = _marker(root, v), _marker(root, w)
    pspec, qspec = pre.get("bucket"), post.get("bucket")
    keys = list((qspec or pspec or {}).get("on", []))
    if "mor_base" in pre or "mor_base" in post:
        pre_dirs, pre_dels, pre_base = _resolved_view(root, v)
        post_dirs, post_dels, post_base = _resolved_view(root, w)
        keys = list(
            (
                (post_base.get("bucket") or pre_base.get("bucket") or {})
            ).get("on", [])
        )
        extra = len(post_dels) - len(pre_dels)
        if (
            post_dirs == pre_dirs
            and extra > 0
            and post_dels[extra:] == pre_dels
        ):
            # w deletes from v's own resolved state: emit the resolved
            # pre-images of the newly-deleted keys — O(base scan + k),
            # never a second post-side scan
            return [(w, keys, pre_dirs, pre_dels, None, post_dels[:extra])]
        # conservative resolved diff (compaction retiring a chain, a
        # chain replaced across a gap): both sides resolved, one task
        return [(w, keys, pre_dirs, pre_dels, post_dirs, post_dels)]
    fman, tman = pre.get("manifest"), post.get("manifest")
    if (
        fman is not None
        and tman is not None
        and pspec
        and qspec
        and pspec["expr"] == qspec["expr"]
    ):
        diff = {b for b in set(fman) ^ set(tman)} | {
            b for b in set(fman) & set(tman) if fman[b] != tman[b]
        }
        return [
            (
                w,
                keys,
                [fman[b]] if b in fman else [],
                [],
                [tman[b]] if b in tman else [],
                [],
            )
            for b in sorted(diff)
        ]
    # plain snapshots (or a bucket-spec change, diffed conservatively
    # as whole snapshots): one full-diff partition for the step
    pre_rel = (
        sorted(fman.values()) if fman is not None else [f"v{v}"]
    )
    post_rel = (
        sorted(tman.values()) if tman is not None else [f"v{w}"]
    )
    return [(w, keys, pre_rel, [], post_rel, [])]


def _read_rel_frame(root: str, rel_dirs: List[str], columns: List[str]):
    """The union of the given dirs' parquet files as a pandas frame
    restricted to ``columns`` (empty with the right columns when the
    side has no files).  Two fidelity rules:

    * integer/bool columns map to pandas NULLABLE dtypes — plain
      ``to_pandas`` upcasts an int64 column holding a NULL to
      float64, silently corrupting values above 2^53 in the emitted
      feed (round-12 review);
    * a file PREDATING an evolved column NULL-fills it instead of
      raising (round 13, r12 ADVICE): replaying a checkpointed range
      that spans schema evolution would otherwise wedge the stream —
      mirroring ``feed_since``'s allowMissingColumns union."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    files: List[str] = []
    for rel in rel_dirs:
        files.extend(_dir_parquet_files(root, rel))
    if not files:
        return pd.DataFrame({c: [] for c in columns})
    tbls = []
    for f in files:
        # one ParquetFile handle = ONE footer read for both the schema
        # probe and the column-pruned load (round-13 review: read_schema
        # + read_table paid two footer round-trips per file per task)
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        present = [c for c in columns if c in names]
        t = pf.read(columns=present)
        for c in columns:
            if c not in present:
                t = t.append_column(c, pa.nulls(t.num_rows))
        tbls.append(t.select(columns))
    tbl = pa.concat_tables(tbls, promote_options="default")
    mapper = {
        pa.int8(): pd.Int8Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int64(): pd.Int64Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }.get
    return tbl.to_pandas(types_mapper=mapper)


def _split_on_keys(df, kdf, keys: List[str]) -> tuple:
    """``(hits, remainder)`` of ``df`` against ``kdf``'s key set — the
    ONE pandas merge/indicator idiom shared by the MoR anti-join
    (_read_side keeps the remainder) and the delete-step emission
    (_delete_rows needs both), so the dtype- and NA-matching-sensitive
    join semantics can never diverge between the two (round-13
    review).  pandas merge matches NA keys on both sides, mirroring
    ``read_version``'s eqNullSafe anti-join."""
    m = df.merge(
        kdf.drop_duplicates(),
        on=list(keys),
        how="left",
        indicator="_mt_del_ind",
    )
    hits = m[m["_mt_del_ind"] == "both"].drop(columns="_mt_del_ind")
    rem = m[m["_mt_del_ind"] == "left_only"].drop(columns="_mt_del_ind")
    return hits, rem


def _read_side(
    root: str,
    rel_dirs: List[str],
    columns: List[str],
    dels: "Optional[List[tuple]]" = None,
):
    """One side of a diff as a pandas frame, with the MoR delete chain
    (if any) anti-joined away — the executor-side twin of
    ``read_version``'s stacked NULL-SAFE broadcast anti-joins."""
    df = _read_rel_frame(root, rel_dirs, columns)
    for rel, keys in dels or ():
        kdf = _read_rel_frame(root, [rel], list(keys))
        if kdf.empty or df.empty:
            continue
        _, df = _split_on_keys(df, kdf, list(keys))
    return df


def _py_column(series) -> list:
    """A pandas column as plain Python values: NA/NaN -> None, numpy
    scalars unboxed — what the DataSource row tuples must carry.
    NaN→NULL for float columns is the module's DOCUMENTED coercion
    (see the module docstring's NaN caveat): after to_pandas, stored
    NULL and stored NaN are indistinguishable in a numpy float column,
    and pandas' masked FloatingArray collapses the distinction in
    every downstream op — so the feed deliberately reports NULL for
    both rather than guessing."""
    import pandas as pd

    out = []
    for v in series.tolist():
        if v is None or (isinstance(v, float) and v != v) or v is pd.NA:
            out.append(None)
        elif hasattr(v, "item"):
            out.append(v.item())
        else:
            out.append(v)
    return out


def _frame_rows(frame, columns, kind, commit_version) -> Iterator[tuple]:
    """Column-wise tuple emission (round-12 review: iterrows built a
    Series per row in the per-task hot path — 10-100x slower than
    extracting columns once and zipping)."""
    cols = [_py_column(frame[c]) for c in columns]
    for vals in zip(*cols):
        yield vals + (kind, commit_version)


def _diff_rows(
    pre, post, keys: List[str], columns: List[str], commit_version: int
) -> Iterator[tuple]:
    """The CDF kernel over pandas frames: outer-merge on the key,
    classify VECTORIZED, emit (row..., change_type, _commit_version)
    tuples in ``columns`` order — the same image contract as
    mergetable ``_diff_changes`` (updates emit BOTH images; unchanged
    keys emit nothing; NA==NA counts as equal, mirroring the null-safe
    Spark comparison)."""

    # an empty side needs no diff at all (and would poison the outer
    # merge with object-dtype columns): a brand-new bucket is pure
    # inserts, a vanished one pure deletes
    if pre.empty and post.empty:
        return
    if pre.empty:
        yield from _frame_rows(post, columns, "insert", commit_version)
        return
    if post.empty:
        yield from _frame_rows(pre, columns, "delete", commit_version)
        return
    m = pre.merge(
        post,
        on=keys,
        how="outer",
        suffixes=(" pre", " post"),
        indicator=True,
    )
    nonkey = [c for c in columns if c not in keys]
    flags = m["_merge"]

    def _side_frame(rows, side):
        sel = {}
        for c in columns:
            sel[c] = rows[c] if c in keys else rows[f"{c} {side}"]
        import pandas as pd

        return pd.DataFrame(sel)

    ins = m[flags == "right_only"]
    if len(ins):
        yield from _frame_rows(
            _side_frame(ins, "post"), columns, "insert", commit_version
        )
    dele = m[flags == "left_only"]
    if len(dele):
        yield from _frame_rows(
            _side_frame(dele, "pre"), columns, "delete", commit_version
        )
    both = m[flags == "both"]
    if len(both):
        changed = None
        for c in nonkey:
            a, b = both[f"{c} pre"], both[f"{c} post"]
            both_na = a.isna() & b.isna()
            eq = (a == b)
            if hasattr(eq, "fillna"):
                eq = eq.fillna(False)
            neq = ~(both_na | eq)
            changed = neq if changed is None else (changed | neq)
        upd = both[changed] if changed is not None else both.iloc[0:0]
        if len(upd):
            yield from _frame_rows(
                _side_frame(upd, "pre"),
                columns,
                "update_preimage",
                commit_version,
            )
            yield from _frame_rows(
                _side_frame(upd, "post"),
                columns,
                "update_postimage",
                commit_version,
            )


def _make_source_class():
    """Build the DataSource class lazily so importing this module never
    requires pyspark.sql.datasource at import time (Spark 4 only)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Reader(DataSourceStreamReader):
        def __init__(self, options):
            self.root = options["root"]
            self.start = int(options.get("start_version", 0))
            self.opt_keys = [
                k for k in options.get("keys", "").split(",") if k
            ]
            _, self.columns = _table_ddl(self.root)
            # the newest version this reader instance has already
            # pinned into an emitted offset — what bounds the next
            # offset's chain segment (round 13).  A fresh instance
            # (restart) pins from start_version again: a superset
            # segment, never a gap.
            self._last_pin: Optional[int] = None

        def initialOffset(self):
            return {"version": self.start}

        def latestOffset(self):
            from ..sources.mergetable import committed_versions

            # ONE commit-log listing serves both the latest version
            # and the segment pin (round-13 review: _latest_version +
            # committed_versions each relisted _commits and parsed
            # every marker — 2 × O(commits) per trigger poll)
            committed = committed_versions(self.root)
            if not committed:
                return {"version": self.start}
            v = max(committed[-1], self.start)
            # the offset pins the committed-chain SEGMENT since the
            # previous poll plus the anchor at its base (round 13,
            # r12 VERDICT item 4) — O(new commits) per offset instead
            # of the round-12 full-chain pin's O(all commits).  The
            # pin is still what makes replay deterministic (round-12
            # review): a stalled claimant filling a gap after plan
            # time cannot re-split a replayed batch's diff steps,
            # because partitions() reads the chain from the
            # checkpointed end offset, never the live listing.
            since = (
                self._last_pin if self._last_pin is not None else self.start
            )
            self._last_pin = v
            return {
                "version": v,
                "since": since,
                "base": max((c for c in committed if c <= since), default=None),
                "chain": [c for c in committed if since < c <= v],
            }

        def partitions(self, start, end):
            from ..sources.mergetable import committed_versions

            # pair consecutive COMMITTED versions inside the offset
            # range: the sequence may have gaps (fenced dead-claimant
            # OCC slots) and a v->v+1 walk would raise on the first
            # one (round-12 review).  The chain comes from the END
            # offset when its pinned segment covers the start:
            # [base] + chain holds every committed version in
            # (since, e] plus the anchor at or below since, and
            # since <= s in every Spark planning mode (batches run
            # between consecutive offsets; a restarted reader pins
            # from start_version, a superset).  Offsets that cannot
            # cover (legacy full-chain pins; an alien checkpoint)
            # fall back as documented.
            s, e = start["version"], end["version"]
            since = end.get("since")
            if since is not None and since <= s:
                all_vs = (
                    [end["base"]] if end.get("base") is not None else []
                ) + list(end.get("chain") or [])
            elif end.get("chain") is not None:
                # round-12 offsets pinned the FULL chain up to e
                all_vs = list(end["chain"])
            else:
                all_vs = committed_versions(self.root)
            base = max((v for v in all_vs if v <= s), default=None)
            if base is None:
                # no committed anchor at or before the start offset:
                # the checkpoint predates the table's retention —
                # refuse loudly rather than silently skip the
                # unanchored steps (round-12 review)
                raise ValueError(
                    f"stream start offset version {s} of {self.root} "
                    "predates retention (no committed version at or "
                    "before it) — reset the checkpoint or re-seed the "
                    "consumer"
                )
            chain = [base] + [v for v in all_vs if s < v <= e]
            parts = []
            for a, b in zip(chain, chain[1:]):
                for p in _step_partitions(self.root, a, b):
                    cv, keys, pre_rel, pre_dels, post_rel, post_dels = p
                    keys = keys or self.opt_keys
                    if not keys:
                        raise ValueError(
                            "table stream source needs key columns: the "
                            "table has no bucket spec — pass "
                            '.option("keys", "k1,k2")'
                        )
                    parts.append(
                        InputPartition(
                            (cv, keys, pre_rel, pre_dels, post_rel,
                             post_dels)
                        )
                    )
            return parts

        def read(self, partition):
            cv, keys, pre_rel, pre_dels, post_rel, post_dels = (
                partition.value
            )
            pre = _read_side(self.root, pre_rel, self.columns, pre_dels)
            if post_rel is None:
                # MoR delete step (round 13): post = pre minus the new
                # delete specs' keys — emit the resolved pre-images of
                # exactly those rows as deletes, never a post-side scan
                return self._delete_rows(pre, post_dels, cv)
            post = _read_side(self.root, post_rel, self.columns, post_dels)
            return _diff_rows(pre, post, keys, self.columns, cv)

        def _delete_rows(self, pre, new_dels, cv):
            for rel, dkeys in new_dels:
                kdf = _read_rel_frame(self.root, [rel], list(dkeys))
                if kdf.empty or pre.empty:
                    continue
                hit, pre = _split_on_keys(pre, kdf, list(dkeys))
                yield from _frame_rows(hit, self.columns, "delete", cv)

        def commit(self, end):
            pass  # versions are immutable; nothing to clean up

    class MergeTableStreamSource(DataSource):
        """``spark.readStream.format("spark_graft_table_stream")
        .option("root", <table root>).load()`` — the table's change
        feed as a streaming DataFrame."""

        @classmethod
        def name(cls):
            return _FORMAT_NAME

        def schema(self):
            ddl, _ = _table_ddl(self.options["root"])
            return ddl

        def streamReader(self, schema):
            return _Reader(self.options)

    return MergeTableStreamSource


MergeTableStreamSource = None  # populated on first registration


def register_table_stream_source(spark) -> str:
    """Register the format with this session (idempotent) and return
    the format name."""
    global MergeTableStreamSource
    if MergeTableStreamSource is None:
        MergeTableStreamSource = _make_source_class()
    spark.dataSource.register(MergeTableStreamSource)
    return _FORMAT_NAME
