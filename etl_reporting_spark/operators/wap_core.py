"""Shared WAP primitives — exceptions, sticky-key registry, and the
path/partition-key helpers (split out of wap.py in round 13; pure
move, zero behavior change). This is a LEAF module: it imports
nothing from the wap family, so the mixin modules (wap_dv, wap_schema)
and wap.py itself can all import it at the top without cycles; wap.py
re-exports every name here, so existing ``from operators.wap import
ConcurrentWriteError`` paths keep working.
"""

from __future__ import annotations

import re
from typing import Sequence

#: characters hive-style partition paths percent-escape (mirrors
#: Spark's ExternalCatalogUtils escape set)
_HIVE_ESCAPE = set('"#%\'*/:=?\\{[]^') | {chr(c) for c in range(0x20)} | {chr(0x7F)}


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a conflicting change first; re-read
    the table and retry the merge from the new snapshot."""


class AuditError(RuntimeError):
    """The written snapshot failed validation; nothing was published."""


class ConstraintViolation(AuditError):
    """A batch being committed violates a table CHECK constraint
    (:meth:`WapTable.add_check_constraint`); nothing was published.
    Carries the violated constraint name(s) and one exemplar row.
    Subclasses :class:`AuditError` because enforcement IS the audit
    step of write-audit-publish — callers that already handle audit
    failure handle this."""


class CloneRetentionWarning(UserWarning):
    """A vacuum retained entries beyond its ``keep_last`` window
    because a registered live clone still references them (see
    :func:`clone_table` / :meth:`WapTable.registered_clones`). Not an
    error — the files are protected, which is the point — but loud,
    because an operator sizing retention should know clones are what
    is holding space. Release the clone (or pass
    ``ignore_clones=True`` to accept breaking it) to reclaim."""


#: commit-record keys that survive every commit unless a path sets
#: them explicitly — inherited centrally in :meth:`WapTable._publish`
_STICKY_RECORD_KEYS: tuple[str, ...] = (
    "constraints",
    "partition_spec",
    "partition_spec_history",
    "prior_names",
    "table_stats",
)


def hive_partition_key(cols: Sequence[str], values: Sequence) -> str:
    """The hive-style path key Spark's ``partitionBy`` writer produces
    for one partition-value tuple — ``ds=2026-01-02/region=EU%2FWEST``
    — so metadata-layer code can name partitions without listing the
    filesystem. Mirrors ``ExternalCatalogUtils.escapePathName``
    (percent-escape of path-hostile characters) and the
    ``__HIVE_DEFAULT_PARTITION__`` null sentinel. Values must already
    be rendered as strings the way Spark casts them (dates as
    ``YYYY-MM-DD``, integers bare)."""
    parts = []
    for col, v in zip(cols, values):
        if v is None:
            sv = "__HIVE_DEFAULT_PARTITION__"
        else:
            sv = "".join(
                f"%{ord(ch):02X}" if ch in _HIVE_ESCAPE else ch for ch in str(v)
            )
        parts.append(f"{col}={sv}")
    return "/".join(parts)


#: every commit root this module writes is ``d-`` + 12 hex (see the
#: ``uuid4().hex[:12]`` writers below); the per-row lineage key in
#: ``_read_paths`` anchors its regexp on the same shape. Partition
#: components can never collide with it (they always carry ``=``).
_DROOT_RE = re.compile(r"^d-[0-9a-f]{12}$")


def _droot_index(parts: Sequence[str]) -> int | None:
    """Index of the FIRST ``d-<12hex>`` component — the same leftmost
    anchor the ``__file`` lineage regexp uses, so driver-side parsing
    and the executor-side row key always agree."""
    for i, p in enumerate(parts):
        if _DROOT_RE.match(p):
            return i
    return None


def _dv_key_of(pointer: str) -> str:
    """The d-root-anchored MASK key of a (possibly absolute) file
    pointer — the form sidecar ``relfile``/``file_key`` columns carry
    (``d-xxx/k=v/file``). Record-level ``delete_vectors`` keys can be
    ABSOLUTE for clone-inherited entries; any comparison against
    sidecar rows must normalize through this first."""
    parts = pointer.split("/")
    i = _droot_index(parts)
    return "/".join(parts[i:]) if i is not None else pointer


def _pkey_of_file(relfile: str) -> str:
    """Partition key of a data-file path: the ``k=v`` components AFTER
    its ``d-<12hex>`` commit root. Anchoring at the root (not "any
    component containing '='") keeps absolute clone pointers correct
    even when the SOURCE table's own path contains ``=`` in a
    directory name (e.g. ``/data/run=5/tbl/d-ab…/ds=1/f.parquet`` →
    ``ds=1``, never ``run=5/ds=1``)."""
    parts = relfile.split("/")
    i = _droot_index(parts)
    scope = parts[i + 1 : -1] if i is not None else parts[:-1]
    return "/".join(p for p in scope if "=" in p)


def _root_of(rel: str) -> str:
    """Physical commit root of a pointer: everything up to and
    including its ``d-<12hex>`` component — ``d-xxx`` for
    table-relative pointers, the absolute ``/…/src/d-xxx`` for clone
    pointers. This is exactly the ``basePath`` hive partition
    inference needs, and it stays correct when the clone source's
    table path itself contains ``=``-bearing directories."""
    parts = rel.split("/")
    i = _droot_index(parts)
    if i is not None:
        return "/".join(parts[: i + 1])
    # pre-d-root layouts (full-snapshot WapTable data dirs): fall back
    # to the first partition component
    for j, p in enumerate(parts):
        if "=" in p:
            return "/".join(parts[:j])
    return parts[0]


def _spark_write_manifest(spark, fs, root: str, schema) -> list[str]:
    """The WRITE MANIFEST: table-root-relative parquet keys Spark
    just wrote under the fresh commit root ``root`` — discovered by
    asking the WRITE PATH itself (a schema-pinned ``spark.read`` of
    the root; ``inputFiles()`` is driver-side FileIndex enumeration
    through the same Hadoop FileSystem connector that performed the
    write — no job runs, no rows are read), NOT the control-plane
    seam's ``list_prefix``.

    Round-10 brief #1: commit-time written-file discovery used to be
    the single place the commit path trusted the seam's
    read-after-write LIST — an under-listing there would have
    published a commit record silently missing just-written data.
    Discovery now takes the UNION of this manifest and the seam LIST
    (each covers an under-reporting on the other side), and row-level
    completeness is additionally guarded by the ``expected_rows`` /
    audit count over the discovered set. Schema pinning matters: it
    makes a zero-row write (a root holding only ``_SUCCESS``) return
    an empty manifest instead of failing schema inference.

    The ``_dv`` sidecar (written under the same root by
    ``upsert_rows_dv`` before its append) is invisible here by
    construction — Hadoop's hidden-file filter skips ``_``-prefixed
    paths, the same property that hides it from table reads."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        uris = reader.parquet(fs.url(root)).inputFiles()
    except Exception:
        # no schema pin and nothing written -> inference fails; the
        # seam LIST side of the union still covers the root
        return []
    out = []
    for uri in uris:
        rel = fs.relativize(uri)
        base = rel.rsplit("/", 1)[-1]
        if base.endswith(".parquet") and not base.startswith((".", "_")):
            out.append(rel)
    return sorted(out)


def _leaves_from_keys(keys: Sequence[str], root: str) -> list[str]:
    """Hive leaf-partition dirs (relative to ``root``) implied by a
    set of parquet file keys — the same pure string logic as
    ``TableStorage.leaf_partition_dirs``, applied to an
    already-discovered key list instead of a fresh LIST."""
    pref = root.rstrip("/") + "/"
    leaves: set[str] = set()
    for k in keys:
        if not k.startswith(pref):
            continue
        parts = k[len(pref):].split("/")
        if len(parts) >= 2 and all("=" in p for p in parts[:-1]):
            leaves.add("/".join(parts[:-1]))
    return sorted(leaves)
