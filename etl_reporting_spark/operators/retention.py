"""Compliance-grade row erasure and snapshot manifest export.

``delete_rows`` makes rows INVISIBLE (deletion vectors — zero files
rewritten, the right default); a right-to-be-forgotten request needs
the bytes GONE. :func:`purge_rows` is the composition that gets there
honestly, and says at each step what is and is not yet true:

1. **Mask** — ``delete_rows(predicate)``: one atomic commit, rows
   invisible to every reader from this version on. Cost ∝ matched
   rows (sidecar write).
2. **Rewrite** — ``optimize_partitions`` over ONLY the partitions the
   delete touched: masked rows are physically absent from the new
   files. Cost ∝ touched partitions, never the table.
3. **Erase history** (``erase_history=True``) — ``vacuum(keep_last=1,
   ...)``: pre-delete files (which still hold the bytes) are
   physically removed. This DESTROYS time travel and the change-feed
   basis for the vacuumed range — that destruction is the point of a
   purge, and the flag makes it consent, not surprise. Registered
   live clones still refuse collection (CloneRetentionWarning) unless
   ``ignore_clones=True`` — a purge must not silently corrupt a
   clone; release the clones first, or purge them too.
4. **Verify** — re-scan the surviving physical files RAW (deletion
   vectors deliberately NOT applied): the predicate must match zero
   rows. A purge that cannot prove erasure did not happen; the report
   carries the scan's result rather than assuming it.

The reference has no erasure primitive — its loaders DELETE+INSERT
through the warehouse and rely on the warehouse's own time-travel
retention to age bytes out (reference
connector/snowpark_connector.py:607-688 staging pattern). Spelling
the full mask→rewrite→vacuum→verify chain explicitly is what a
self-managed table format owes a compliance request.

:func:`export_snapshot_manifest` is the interoperability half: a
snapshot's complete data-file list (the Hive
``SymlinkTextInputFormat`` / Delta ``GENERATE symlink_format_manifest``
convention — one absolute path per line) so external engines (DuckDB,
Trino, Presto) read a consistent pinned snapshot without speaking the
commit protocol. Snapshots whose visibility depends on deletion
vectors REFUSE to export (an external engine would resurrect masked
rows) with compact-first guidance.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import functions as F

from etl_reporting_spark.operators.wap import (
    PartitionedWapTable,
    WapTable,
    optimize_partitions,
)


@dataclass
class PurgeReport:
    """What the purge did and — critically — what it proved."""

    rows_purged: int
    delete_version: int | None
    rewrite_version: int | None
    files_removed: list[str] = field(default_factory=list)
    history_erased: bool = False
    #: residual matches found by the raw-file verification scan; 0 is
    #: the only acceptable value when erase_history=True
    residual_rows: int = 0

    @property
    def verified(self) -> bool:
        return self.residual_rows == 0


class PurgeVerificationError(RuntimeError):
    """The post-purge raw-file scan still matched rows — surviving
    physical files hold the data the purge was asked to erase.
    Nothing is rolled back (the commits stand); the error carries the
    residual count so the operator can diagnose instead of trusting a
    false completion."""


def purge_rows(
    table: PartitionedWapTable,
    predicate: str,
    erase_history: bool = False,
    min_age_seconds: float = 0.0,
    ignore_clones: bool = False,
    n_files: int = 1,
) -> PurgeReport:
    """Mask → rewrite → (optionally) erase history → verify. See the
    module docstring for the contract of each step.

    Without ``erase_history`` the purge is COMPLETE for current
    readers and PENDING for history: old snapshots still resolve the
    bytes until a later vacuum ages them out — the report says so via
    ``history_erased=False``. ``min_age_seconds=0`` is the purge
    default (erasure requests do not wait for an age horizon); pass a
    positive horizon if concurrent writers may be mid-commit."""
    if not isinstance(table, PartitionedWapTable):
        raise TypeError(
            "purge_rows targets partitioned WAP tables; for a full-"
            "snapshot table, commit(filter(NOT predicate)) + vacuum is "
            "already the whole operation"
        )
    base = table.current_version()
    if base == 0:
        raise FileNotFoundError(f"no committed WAP table at {table.path}")

    # 1. MASK — atomic invisibility
    delete_version, n_deleted = table.delete_rows(predicate)
    if n_deleted == 0:
        return PurgeReport(
            rows_purged=0, delete_version=None, rewrite_version=None
        )

    # 2. REWRITE — only the partitions the delete touched. On a
    # spec-EVOLVED table (round-12), touched partitions still under an
    # old era cannot compact in place (their rows re-derive under the
    # current spec) — those migrate via rewrite_era_partitions, which
    # equally rewrites the masked rows out of existence; the rest
    # compact normally. ``verify_keys`` accumulates every partition a
    # rewrite commit produced, so step 4 scans exactly where purged
    # bytes could survive — including migration TARGETS.
    touched = list(table._commit_record(delete_version).get("touched", []))
    old_era = (
        set(table._live_old_era_keys())
        if hasattr(table, "_live_old_era_keys")
        else set()
    )
    migrate = sorted(set(touched) & old_era)
    verify_keys: set[str] = set()
    rewrite_version = delete_version
    if migrate:
        rewrite_version = table.rewrite_era_partitions(partitions=migrate)
        verify_keys |= set(
            table._commit_record(rewrite_version).get("touched", [])
        )
    rest = sorted(set(touched) - set(migrate))
    if rest:
        rewrite_version = optimize_partitions(
            table, partitions=rest, n_files=n_files
        )
        verify_keys |= set(rest)

    # 3. ERASE HISTORY — physically remove the pre-delete files
    removed: list[str] = []
    if erase_history:
        removed = table.vacuum(
            keep_last=1,
            min_age_seconds=min_age_seconds,
            ignore_clones=ignore_clones,
        )

    # 4. VERIFY — raw scan of the surviving physical files, deletion
    # vectors deliberately NOT applied: the bytes must be gone from
    # the files themselves, not merely masked. Scoped to the touched
    # partitions (everything else was provably never rewritten).
    survivors: list[str] = []
    for pk in sorted(verify_keys):
        if pk in table.partition_map(rewrite_version):
            survivors.extend(
                table.partition_files(pk, version=rewrite_version)
            )
    residual = 0
    if survivors:
        raw = table._read_paths(
            survivors, rewrite_version, apply_dvs=False
        )
        residual = raw.filter(F.expr(predicate)).count()
    report = PurgeReport(
        rows_purged=n_deleted,
        delete_version=delete_version,
        rewrite_version=rewrite_version,
        files_removed=removed,
        history_erased=erase_history,
        residual_rows=residual,
    )
    if residual:
        raise PurgeVerificationError(
            f"purge verification failed: {residual} row(s) matching "
            f"{predicate!r} remain in surviving physical files of "
            f"{table.path} (versions d{delete_version}/r{rewrite_version})"
        )
    return report


def export_snapshot_manifest(
    table: WapTable,
    version: int | None = None,
    manifest_key: str | None = None,
) -> tuple[str, list[str]]:
    """Write the snapshot's complete data-file list — one ABSOLUTE
    path per line, the symlink-manifest convention external engines
    already consume — into the table's storage under
    ``_manifests/v{N}.manifest`` (or ``manifest_key``). Returns
    ``(manifest_storage_key, file_list)``.

    Refuses a snapshot whose visibility depends on deletion vectors:
    a raw-parquet consumer would resurrect masked rows. Compact first
    (``optimize_partitions`` / ``compact_vectors`` does not help —
    the masks must be CLEARED, i.e. the masked files rewritten), then
    export; the refusal names the masked file count so the operator
    knows the cost."""
    v = version if version is not None else table.current_version()
    if v == 0:
        raise FileNotFoundError(f"no committed WAP table at {table.path}")
    rec = table._commit_record(v)
    dvs = rec.get("delete_vectors", {})
    if dvs:
        raise ValueError(
            f"snapshot v{v} masks {len(dvs)} file(s) with deletion "
            "vectors — a raw-parquet reader would resurrect the deleted "
            "rows. Rewrite the masked partitions (optimize_partitions) "
            "and export that version instead."
        )
    # same external-reader hazard class for RENAMED columns: a raw
    # consumer resolves by physical name only, so every chained column
    # must exist physically in EVERY live root (one footer read per
    # root, bounded by live_commit_roots ≤ the read-width policy)
    chained = sorted(
        set(rec.get("prior_names") or {})
        - set(rec.get("partition_by") or [])
    )
    if chained:
        from pyspark.sql.types import StructType

        cur = {
            f.name for f in StructType.fromJson(rec["schema"]).fields
        }
        chained = [c for c in chained if c in cur]
    if chained and isinstance(table, PartitionedWapTable):
        for root in table.live_commit_roots(v):
            physical = set(
                table.spark.read.parquet(
                    table.fs.resolve(root)
                ).schema.names
            )
            stale = [c for c in chained if c not in physical]
            if stale:
                raise ValueError(
                    f"snapshot v{v} cannot export a manifest: column(s) "
                    f"{stale} were renamed and commit root {root} still "
                    "holds files under the OLD physical names — an "
                    "external raw-parquet reader resolves by name only. "
                    "Rewrite first (optimize_partitions) and export that "
                    "version."
                )
    files: list[str] = []
    if isinstance(table, PartitionedWapTable):
        for pk in sorted(table.partition_map(v)):
            for rel in table.partition_files(pk, version=v):
                files.append(table.fs.absolute_url(rel))
    else:
        data_dir = rec["data_dir"]
        for f in table.fs.list_files_at(table.fs.resolve(data_dir)):
            if f.endswith(".parquet"):
                files.append(
                    table.fs.absolute_url(posixpath.join(data_dir, f))
                )
    key = manifest_key or f"_manifests/v{v:05d}.manifest"
    table.fs.put_key(key, ("\n".join(files) + "\n").encode())
    return key, files
