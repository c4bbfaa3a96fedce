"""Commit-store implementations for the WAP protocol (split out of
wap.py in round 13 — pure move, zero behavior change; wap.py
re-exports every name so existing imports keep working).

A :class:`CommitStore` is the ONE primitive the protocol needs from
storage: atomic create-if-absent publication of an immutable commit
record (contract in the class docstring). Implementations here map
that CAS onto POSIX (``os.link``), an object-store client seam
(put-if-absent — S3 ``If-None-Match: *``, GCS ``ifGenerationMatch=0``),
in-memory (tests), and a fault-injecting wrapper (crash tests).
"""

from __future__ import annotations

import os
import re
import threading
import time
import uuid


class CommitConflict(Exception):
    """Raised by a :class:`CommitStore` when the version slot is
    already taken. Table-level code translates this into
    :class:`ConcurrentWriteError` or a partition-scoped rebase."""


class CommitStore:
    """The ONE primitive the WAP protocol needs from storage: atomic
    create-if-absent publication of an immutable commit record.

    Contract (what any implementation must guarantee):

    - ``publish(version, payload)`` either installs the COMPLETE
      payload at the version slot or raises :class:`CommitConflict`
      if that slot is taken. Readers must never observe a partial
      payload — not even transiently, not even across a writer crash
      mid-publish.
    - ``read(version)`` returns the exact published payload, or
      ``None`` for a never-published slot.
    - ``max_version()`` returns the highest published version (0 when
      empty). It may lag concurrent publishes (it is only used to
      pick an optimistic base; staleness costs a retry, not
      correctness).

    Production mappings of the CAS primitive:

    - local POSIX (:class:`LocalFSCommitStore`): write + fsync a temp
      file, then ``os.link`` into the slot — link is atomic and fails
      with EEXIST when taken.
    - S3: ``PutObject`` with ``If-None-Match: *`` — HTTP 412 is the
      conflict. (Available since 2024; before that, a DynamoDB
      conditional write served as the slot lock, which is exactly
      what delta-rs's S3 commit store does.)
    - GCS: upload with precondition ``ifGenerationMatch=0``.
    - HDFS / ABFS: ``rename()`` without overwrite onto the slot path
      — atomic within a namespace, fails when the target exists.

    Everything else in the protocol (immutable uniquely-named data
    dirs, read-back audits, max-version resolution) is plain
    list/read/write — no further atomicity is required of storage.
    """

    def publish(self, version: int, payload: bytes) -> None:
        raise NotImplementedError

    def read(self, version: int) -> bytes | None:
        raise NotImplementedError

    def max_version(self) -> int:
        raise NotImplementedError

    def clean_temp(self, min_age_seconds: float) -> list[str]:
        """Remove publication debris a crashed writer may have left
        (e.g. fsynced-but-never-linked temp records). Entries younger
        than ``min_age_seconds`` are protected — they may belong to a
        writer that is about to complete its CAS."""
        return []


class LocalFSCommitStore(CommitStore):
    """POSIX implementation: ``os.link`` create-if-absent."""

    def __init__(self, log_dir: str) -> None:
        self.log_dir = log_dir

    def _slot(self, version: int) -> str:
        return os.path.join(self.log_dir, f"commit-{version:05d}.json")

    def publish(self, version: int, payload: bytes) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._slot(version))
        except FileExistsError:
            raise CommitConflict(version) from None
        finally:
            os.unlink(tmp)

    def read(self, version: int) -> bytes | None:
        try:
            with open(self._slot(version), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def max_version(self) -> int:
        if not os.path.isdir(self.log_dir):
            return 0
        versions = [
            int(f[len("commit-") : -len(".json")])
            for f in os.listdir(self.log_dir)
            if f.startswith("commit-") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def clean_temp(self, min_age_seconds: float) -> list[str]:
        removed = []
        if not os.path.isdir(self.log_dir):
            return removed
        now = time.time()
        for entry in os.listdir(self.log_dir):
            if not (entry.startswith(".tmp-") and entry.endswith(".json")):
                continue
            full = os.path.join(self.log_dir, entry)
            try:
                if now - os.path.getmtime(full) < min_age_seconds:
                    continue
                os.unlink(full)
            except OSError:
                continue
            removed.append(entry)
        return removed


class PreconditionFailed(Exception):
    """An object-store conditional PUT found the key already present
    (S3 HTTP 412 / GCS precondition failure / ABFS create-exists)."""


class ObjectStoreClient:
    """Minimal blob-store client surface :class:`ObjectStoreCommitStore`
    needs — three calls, each mapping 1:1 onto every major store. The
    consistency envelope assumed (and all that is assumed):

    - ``put_if_absent``: atomic create of the COMPLETE object, or
      :class:`PreconditionFailed` if the key exists. S3 ``PutObject``
      with ``If-None-Match: *`` (412 on conflict, available since
      2024 — before that, a DynamoDB conditional write plays this
      slot, as in delta-rs); GCS upload with ``ifGenerationMatch=0``;
      ABFS/Azure Blob create-without-overwrite (``If-None-Match: *``).
      There is never a partial-object state: the stores commit a blob
      only when the upload completes.
    - ``get``: read-after-write consistent for NEW keys — true of S3
      (since 2020-12), GCS, and ABFS. Commit records are immutable,
      so no update-consistency is ever relied on.
    - ``list_keys``: MAY lag recent puts (the weakest listing any of
      the stores ever documented). The commit store never trusts it
      alone — see ``ObjectStoreCommitStore.max_version``.
    """

    def put_if_absent(self, key: str, data: bytes) -> None:
        raise NotImplementedError

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def list_keys(self, prefix: str) -> list[str]:
        raise NotImplementedError


class InMemoryObjectStore(ObjectStoreClient):
    """Mock object store with exactly the envelope above: strongly
    consistent conditional PUT and GET under a lock (races come from
    real threads in the tests), plus an injectable LISTING LAG —
    ``list_lag=n`` hides the n most recently created blobs from
    ``list_keys`` to simulate an eventually-consistent listing, while
    GET still sees them (the split S3 actually had for years)."""

    def __init__(self, list_lag: int = 0) -> None:
        import threading

        self._lock = threading.Lock()
        self._blobs: dict[str, bytes] = {}
        self._order: list[str] = []
        self.list_lag = list_lag

    def put_if_absent(self, key: str, data: bytes) -> None:
        with self._lock:
            if key in self._blobs:
                raise PreconditionFailed(key)
            self._blobs[key] = bytes(data)
            self._order.append(key)

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._blobs.get(key)

    def list_keys(self, prefix: str) -> list[str]:
        with self._lock:
            visible = (
                self._order[: max(0, len(self._order) - self.list_lag)]
                if self.list_lag
                else list(self._order)
            )
            return sorted(k for k in visible if k.startswith(prefix))


class ObjectStoreCommitStore(CommitStore):
    """Durable :class:`CommitStore` for S3/GCS/ABFS — the deployment
    where POSIX rename/link semantics DO NOT EXIST (S3 "rename" is
    copy+delete, not atomic), which is exactly why the CAS seam is an
    interface. The mapping is direct: one conditional PUT of the
    complete record IS the commit — no temp file, no link, no
    publication debris (``clean_temp`` is a structural no-op, not an
    unimplemented one).

    ``max_version`` never trusts LIST alone: it takes the listed
    maximum, then probes FORWARD with strongly-consistent GETs until
    the first absent slot. An eventually-consistent listing therefore
    costs a few extra GETs, never a wrong answer — stronger than the
    base contract requires (staleness there costs only a retry), and
    what makes reads correct the instant a writer on another node
    publishes.

    Consistency assumptions are exactly the three documented on
    :class:`ObjectStoreClient`; nothing else (no locks, no lease, no
    DynamoDB table) is required where conditional PUT exists.

    Semantics anchor: the reference's MERGE/transactional surface
    (reference connector/snowpark_connector.py:607-1004) — this store
    is what carries its atomicity on object storage."""

    def __init__(self, client: ObjectStoreClient, prefix: str = "") -> None:
        self.client = client
        self.prefix = (prefix.rstrip("/") + "/") if prefix else ""

    def _key(self, version: int) -> str:
        return f"{self.prefix}commit-{version:05d}.json"

    def publish(self, version: int, payload: bytes) -> None:
        try:
            self.client.put_if_absent(self._key(version), payload)
        except PreconditionFailed:
            raise CommitConflict(version) from None

    def read(self, version: int) -> bytes | None:
        return self.client.get(self._key(version))

    def max_version(self) -> int:
        best = 0
        for k in self.client.list_keys(self.prefix):
            m = re.search(r"commit-(\d+)\.json$", k)
            if m:
                best = max(best, int(m.group(1)))
        # forward-probe past listing staleness with consistent GETs
        while self.client.get(self._key(best + 1)) is not None:
            best += 1
        return best


class InMemoryCommitStore(CommitStore):
    """Object-store-shaped implementation: a dict guarded by a lock,
    publish = compare-and-swap on slot absence. Exists to prove the
    protocol depends only on the :class:`CommitStore` contract (the
    S3 conditional-PUT shape), not on filesystem semantics — the
    full crash/race suite parametrizes over this and the local store.
    """

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self._slots: dict[int, bytes] = {}

    def publish(self, version: int, payload: bytes) -> None:
        with self._lock:
            if version in self._slots:
                raise CommitConflict(version)
            self._slots[version] = bytes(payload)

    def read(self, version: int) -> bytes | None:
        with self._lock:
            return self._slots.get(version)

    def max_version(self) -> int:
        with self._lock:
            return max(self._slots, default=0)


class FlakyCommitStore(CommitStore):
    """Failure-injecting wrapper for crash tests: raises
    ``RuntimeError`` BEFORE (crash_before) or AFTER (crash_after) the
    nth publish reaches the inner store — the two writer-death points
    the protocol must survive (record never installed → invisible;
    record installed but writer died → commit IS durable)."""

    def __init__(
        self,
        inner: CommitStore,
        crash_before: int | None = None,
        crash_after: int | None = None,
    ) -> None:
        self.inner = inner
        self.crash_before = crash_before
        self.crash_after = crash_after
        self.n_publishes = 0

    def publish(self, version: int, payload: bytes) -> None:
        self.n_publishes += 1
        if self.n_publishes == self.crash_before:
            raise RuntimeError("simulated crash before publish")
        self.inner.publish(version, payload)
        if self.n_publishes == self.crash_after:
            raise RuntimeError("simulated crash after publish")

    def read(self, version: int) -> bytes | None:
        return self.inner.read(version)

    def max_version(self) -> int:
        return self.inner.max_version()

    def clean_temp(self, min_age_seconds: float) -> list[str]:
        return self.inner.clean_temp(min_age_seconds)
