"""Storage seam for the WAP table DATA PLANE.

Round 8 made the WAP commit *log* object-store-ready (the
``CommitStore`` CAS seam in ``operators/wap.py``); this module is the
matching seam for the *data plane* — listing a snapshot's files,
deleting dead snapshot dirs, aging crash orphans — so a table can live
on storage where POSIX verbs (``os.listdir``, ``shutil.rmtree``,
directory mtime) do not exist. Division of labour at a real
deployment, mirroring how Delta/Iceberg split it:

- **Bulk data I/O stays with Spark.** Parquet reads/writes go through
  the Hadoop FileSystem connector for whatever ``url()`` returns
  (``file:/``, ``s3a://``, ``gs://``, ``abfss://``) — executors never
  touch this module.
- **Control-plane metadata goes through these verbs**, each of which
  maps 1:1 onto every object store's API: ``list_prefix`` (LIST),
  ``delete_key`` (DELETE object), ``last_modified`` (HEAD →
  LastModified). There is deliberately no ``rename``, no directory
  create, and no directory mtime in the contract, because object
  stores have none of them.

Two concrete backends ship in-container:

- :class:`LocalFSStorage` — the POSIX table layout all rounds so far
  used (behaviour-identical to the old inline ``os.*`` calls).
- :class:`BlobStorage` — object-store SEMANTICS emulated over a local
  directory: the same physical bytes Spark can read in ``local[*]``
  mode, but the control plane is restricted to the three object-store
  verbs (flat keys, per-object delete, per-object LastModified,
  mkdir-is-a-no-op). Running the full WAP suite over this backend is
  what proves ``wap.py`` no longer relies on POSIX semantics; swapping
  in a real S3/GCS client is then an adapter, not a refactor
  (see ``S3TableStorage`` for the boto3-shaped adapter).

Consistency: no verb here needs read-after-write LIST. Through
round 9 the WAP writer relied on it in exactly one place —
discovering the leaves/files Spark just wrote under a fresh commit
root before publishing the record (an under-listing there would have
published a record missing just-written data). Round 10 removed it:
commit-time discovery now unions the WRITE MANIFEST (Spark's own
``inputFiles()`` enumeration through the FileSystem client that
performed the write — ``wap._spark_write_manifest``) with this
seam's LIST as a cross-check, so an under-reporting on either side
is covered by the other, and ``expected_rows``/audits guard row
completeness on top. Cross-writer LIST lag is tolerated everywhere
else — the commit store forward-probes with GETs, and vacuum
candidates that LIST late are simply collected by a later vacuum.

Semantics anchor: the reference's transactional MERGE surface
(reference connector/snowpark_connector.py:607-1004) assumes a
warehouse whose storage layer provides exactly these verbs; this seam
is where the Spark twin gets them.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote, urlparse


def is_external(pointer: str) -> bool:
    """True for pointers that escape the table root — absolute paths
    or full URLs. Clone-inherited entries (``clone_table``) are the
    one producer of these; everything written by the table itself is
    table-root-relative."""
    return os.path.isabs(pointer) or "://" in pointer


class TableStorage:
    """Data-plane storage contract. Backend verbs (override these):

    - ``url(rel)`` — location Spark reads/writes ``rel`` at.
    - ``absolute_url(rel)`` — fully-qualified form of ``url`` (what
      clone pointers record, so they stay valid from any cwd/mount).
    - ``list_prefix(rel)`` — ALL object keys equal to or under
      ``rel``, '/'-separated, table-root-relative, flat (the S3 LIST
      shape; no directory entries — directories do not exist).
    - ``delete_key(rel)`` — delete one object; False if absent.
    - ``delete_prefix(rel)`` — delete every object under ``rel``.
    - ``last_modified(rel)`` — per-OBJECT LastModified epoch seconds,
      None when unanswerable (e.g. asked about a "directory" on a
      store that has none). Vacuum uses it only as the orphan-aging
      FALLBACK; referenced entries age by commit timestamps.
    - ``prepare_root()`` — create the table root where the concept
      exists (POSIX); a structural no-op on object stores.
    - ``default_commit_store()`` — the commit-log store this backend
      pairs with when the caller doesn't supply one.
    - ``list_files_at(location)`` — data-file names at an EXTERNAL
      location (a clone source's leaf dir), already resolved.

    Everything else is derived, backend-independent string logic over
    the flat key listing.
    """

    # ------------------------------------------------- backend verbs
    def url(self, rel: str = "") -> str:
        raise NotImplementedError

    def absolute_url(self, rel: str = "") -> str:
        raise NotImplementedError

    def list_prefix(self, rel: str = "") -> list[str]:
        raise NotImplementedError

    def delete_key(self, rel: str) -> bool:
        raise NotImplementedError

    def delete_prefix(self, rel: str) -> int:
        raise NotImplementedError

    def last_modified(self, rel: str) -> float | None:
        raise NotImplementedError

    def put_key(self, rel: str, data: bytes) -> None:
        """Write one small metadata object at ``rel``, overwriting any
        existing object — a plain unconditional PUT (S3 ``PutObject``,
        GCS upload, ABFS create-or-replace). Used for table-level
        side metadata (the clone registry), never for data files or
        commit records (those go through Spark writes and the
        :class:`CommitStore` CAS respectively)."""
        raise NotImplementedError

    def read_key(self, rel: str) -> bytes | None:
        """Read one object's bytes, ``None`` when absent (S3
        ``GetObject`` → 404)."""
        raise NotImplementedError

    def prepare_root(self) -> None:
        raise NotImplementedError

    def default_commit_store(self):
        raise NotImplementedError

    def branch_commit_store(self, name: str):
        """A SEPARATE commit-log namespace for a named branch — same
        CAS primitive, different slot prefix, so branch commits can
        never collide with (or be read as) main-log versions."""
        raise NotImplementedError

    def list_files_at(self, location: str, suffix: str = ".parquet") -> list[str]:
        raise NotImplementedError

    # ---------------------------------------------- derived helpers
    def resolve(self, pointer: str) -> str:
        """Spark-consumable location of a commit-record pointer:
        external (clone) pointers pass through untouched; relative
        ones anchor at the table root."""
        return pointer if is_external(pointer) else self.url(pointer)

    def exists(self, rel: str) -> bool:
        return bool(self.list_prefix(rel))

    def list_files(self, rel_dir: str, suffix: str = ".parquet") -> list[str]:
        """Basenames of DIRECT child objects of ``rel_dir`` with the
        suffix — derived from the flat listing, so it means the same
        thing on every backend."""
        pref = rel_dir.rstrip("/") + "/"
        out = []
        for k in self.list_prefix(pref):
            sub = k[len(pref):]
            if "/" not in sub and sub.endswith(suffix):
                out.append(sub)
        return sorted(out)

    def leaf_partition_dirs(self, rel_root: str) -> list[str]:
        """Relative paths (under ``rel_root``) of hive-style leaf
        partition "dirs": every path component ``k=v`` and at least
        one parquet object inside. Pure string logic over the flat
        key list — the object-store replacement for ``os.walk``."""
        pref = rel_root.rstrip("/") + "/"
        leaves: set[str] = set()
        for k in self.list_prefix(pref):
            sub = k[len(pref):]
            parts = sub.split("/")
            if len(parts) < 2 or not parts[-1].endswith(".parquet"):
                continue
            if all("=" in p for p in parts[:-1]):
                leaves.add("/".join(parts[:-1]))
        return sorted(leaves)

    def top_roots(self) -> list[str]:
        """Distinct first path components of all keys — the snapshot
        roots vacuum iterates. POSIX backends may additionally report
        empty directories (object stores cannot have any)."""
        return sorted({k.split("/", 1)[0] for k in self.list_prefix("")})

    def relativize(self, file_uri: str) -> str:
        """Table-root-relative key of a Spark file URI (the
        ``input_file_name()`` / ``_metadata.file_path`` form) —
        URI-decoded, '/'-separated."""
        p = unquote(urlparse(file_uri).path)
        rel = os.path.relpath(p, os.path.abspath(self._local_root()))
        return rel.replace(os.sep, "/")

    def _local_root(self) -> str:
        raise NotImplementedError


class LocalFSStorage(TableStorage):
    """POSIX backend — behaviour-identical to the pre-seam inline
    ``os.*``/``shutil`` calls, so every existing on-disk layout and
    test expectation is unchanged."""

    def __init__(self, root: str) -> None:
        self.root = root

    def url(self, rel: str = "") -> str:
        return os.path.join(self.root, rel) if rel else self.root

    def absolute_url(self, rel: str = "") -> str:
        base = os.path.abspath(self.root)
        return os.path.join(base, rel) if rel else base

    def list_prefix(self, rel: str = "") -> list[str]:
        rel = rel.rstrip("/")
        start = self.url(rel) if rel else self.root
        if os.path.isfile(start):
            return [rel]
        if not os.path.isdir(start):
            return []
        keys = []
        for dirpath, _dirnames, filenames in os.walk(start):
            reldir = os.path.relpath(dirpath, self.root)
            for f in filenames:
                k = f if reldir == "." else f"{reldir}/{f}"
                keys.append(k.replace(os.sep, "/"))
        return sorted(keys)

    def delete_key(self, rel: str) -> bool:
        try:
            os.remove(self.url(rel))
            return True
        except OSError:
            return False

    def delete_prefix(self, rel: str) -> int:
        full = self.url(rel)
        if os.path.isdir(full):
            n = len(self.list_prefix(rel))
            shutil.rmtree(full, ignore_errors=True)
            return n
        return 1 if self.delete_key(rel) else 0

    def last_modified(self, rel: str) -> float | None:
        try:
            return os.path.getmtime(self.url(rel))
        except OSError:
            return None

    def put_key(self, rel: str, data: bytes) -> None:
        full = self.url(rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())

    def read_key(self, rel: str) -> bytes | None:
        try:
            with open(self.url(rel), "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def prepare_root(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def top_roots(self) -> list[str]:
        # listdir (not the flat-key derivation) so EMPTY orphan dirs —
        # a POSIX-only artifact — are still visible to vacuum
        if not os.path.isdir(self.root):
            return []
        return sorted(os.listdir(self.root))

    def default_commit_store(self):
        from etl_reporting_spark.operators.wap import LocalFSCommitStore

        return LocalFSCommitStore(os.path.join(self.root, "_wap"))

    def branch_commit_store(self, name: str):
        from etl_reporting_spark.operators.wap import LocalFSCommitStore

        return LocalFSCommitStore(
            os.path.join(self.root, f"_wap_branch_{name}")
        )

    def list_files_at(self, location: str, suffix: str = ".parquet") -> list[str]:
        return sorted(f for f in os.listdir(location) if f.endswith(suffix))

    def _local_root(self) -> str:
        return self.root


class BlobStorage(TableStorage):
    """Object-store-SEMANTICS backend over a local directory: Spark
    still does the bulk parquet I/O against real local files (exactly
    as it would against ``s3a://`` in production), but every
    control-plane operation is restricted to the three object-store
    verbs — flat-key LIST, per-object DELETE, per-object
    LastModified. ``prepare_root`` is a no-op (there is no mkdir),
    ``top_roots``/``leaf_partition_dirs`` are derived from the flat
    listing (there are no directories), and recursive deletes happen
    object-by-object off a LIST (there is no rmtree). Empty
    directories the emulation's backing dir accumulates after
    per-object deletes are pruned opportunistically — a housekeeping
    detail of the emulation, invisible at the verb level.

    The full WAP suite runs parameterized over this backend; that run
    is the executable proof the table code never needs POSIX."""

    def __init__(self, root: str) -> None:
        self.root = root

    def url(self, rel: str = "") -> str:
        return os.path.join(self.root, rel) if rel else self.root

    def absolute_url(self, rel: str = "") -> str:
        base = os.path.abspath(self.root)
        return os.path.join(base, rel) if rel else base

    # --- the three object-store verbs -----------------------------
    def list_prefix(self, rel: str = "") -> list[str]:
        """Emulation divergence, deliberate: a real S3 LIST matches any
        key with the given CHARACTER prefix (``v0001-ab`` matches
        ``v0001-abcd/file``), while this emulation returns ``[]`` for a
        partial-basename prefix — it only resolves whole path
        components. Stricter than the thing it emulates; no WAP caller
        passes partial basenames (pointers are always whole dir/file
        keys), so the strictness can never hide a key the production
        adapter would return."""
        # scope the walk to the prefix's directory portion — the local
        # stand-in for a server-side prefix LIST, so a per-candidate
        # vacuum LIST doesn't scan the whole table
        rel = rel.rstrip("/")
        start = self.url(rel) if rel else self.root
        if os.path.isfile(start):
            return [rel]
        if not os.path.isdir(start):
            return []
        keys = []
        for dirpath, _dirnames, filenames in os.walk(start):
            reldir = os.path.relpath(dirpath, self.root)
            for f in filenames:
                k = f if reldir == "." else f"{reldir}/{f}"
                keys.append(k.replace(os.sep, "/"))
        return sorted(keys)

    def delete_key(self, rel: str) -> bool:
        full = self.url(rel)
        try:
            os.remove(full)
        except OSError:
            return False
        self._prune_empty_dirs(os.path.dirname(full))
        return True

    def delete_prefix(self, rel: str) -> int:
        n = 0
        for k in self.list_prefix(rel):
            if self.delete_key(k):
                n += 1
        return n

    def last_modified(self, rel: str) -> float | None:
        full = self.url(rel)
        if not os.path.isfile(full):  # objects only; dirs don't exist
            return None
        try:
            return os.path.getmtime(full)
        except OSError:
            return None

    def put_key(self, rel: str, data: bytes) -> None:
        # plain unconditional PUT; the backing-dir makedirs is an
        # emulation detail (keys imply their "path" on a real store)
        full = self.url(rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())

    def read_key(self, rel: str) -> bytes | None:
        full = self.url(rel)
        if not os.path.isfile(full):
            return None
        try:
            with open(full, "rb") as fh:
                return fh.read()
        except OSError:
            return None

    # --- structure -------------------------------------------------
    def prepare_root(self) -> None:
        pass  # object stores have no mkdir; keys imply their "path"

    def default_commit_store(self):
        from etl_reporting_spark.operators.wap import ObjectStoreCommitStore

        return ObjectStoreCommitStore(
            LocalDirObjectStore(self.root), prefix="_wap/"
        )

    def branch_commit_store(self, name: str):
        from etl_reporting_spark.operators.wap import ObjectStoreCommitStore

        return ObjectStoreCommitStore(
            LocalDirObjectStore(self.root), prefix=f"_wap_branch_{name}/"
        )

    def list_files_at(self, location: str, suffix: str = ".parquet") -> list[str]:
        # external (clone-source) listing: same LIST verb against the
        # source location; the local emulation reads the backing dir
        try:
            return sorted(
                f for f in os.listdir(location) if f.endswith(suffix)
            )
        except OSError:
            return []

    def _local_root(self) -> str:
        return self.root

    def _prune_empty_dirs(self, dirpath: str) -> None:
        root = os.path.abspath(self.root)
        d = os.path.abspath(dirpath)
        while d.startswith(root) and d != root:
            try:
                os.rmdir(d)  # fails (→ stop) while non-empty
            except OSError:
                return
            d = os.path.dirname(d)


class LocalDirObjectStore:
    """``ObjectStoreClient`` backed by a local directory — blobs are
    plain files, ``put_if_absent`` is the fsync-then-``os.link`` CAS
    (the same primitive ``LocalFSCommitStore`` uses), GET/LIST are
    strongly consistent. This is :class:`BlobStorage`'s default
    commit-log client, so a blob-backed table is object-store-shaped
    END TO END (conditional-PUT commits + flat-key data plane) while
    remaining a plain directory a human can inspect."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _full(self, key: str) -> str:
        return os.path.join(self.root, key.replace("/", os.sep))

    def put_if_absent(self, key: str, data: bytes) -> None:
        import uuid

        from etl_reporting_spark.operators.wap import PreconditionFailed

        full = self._full(key)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = os.path.join(
            os.path.dirname(full), f".blobtmp-{uuid.uuid4().hex}"
        )
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, full)
        except FileExistsError:
            raise PreconditionFailed(key) from None
        finally:
            os.unlink(tmp)

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._full(key), "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def list_keys(self, prefix: str) -> list[str]:
        # walk only the deepest directory the prefix implies (server-
        # side prefix LIST stand-in): "_wap/commit-" starts at _wap/
        start_rel = prefix.rsplit("/", 1)[0] if "/" in prefix else ""
        start = (
            os.path.join(self.root, start_rel.replace("/", os.sep))
            if start_rel
            else self.root
        )
        if not os.path.isdir(start):
            return []
        keys = []
        for dirpath, _dirnames, filenames in os.walk(start):
            rel = os.path.relpath(dirpath, self.root)
            for f in filenames:
                if f.startswith(".blobtmp-"):
                    continue
                k = f if rel == "." else f"{rel}/{f}"
                k = k.replace(os.sep, "/")
                if k.startswith(prefix):
                    keys.append(k)
        return sorted(keys)
