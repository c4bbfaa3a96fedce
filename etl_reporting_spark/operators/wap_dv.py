"""Deletion-vector machinery for partitioned WAP tables — row-level
DELETE / UPSERT / UPDATE via DV sidecars plus their compaction (split
out of wap.py in round 13 as a mixin; pure move, zero behavior
change). Mixed into
:class:`~etl_reporting_spark.operators.wap.PartitionedWapTable`; every
``self.`` reference resolves there (read paths, commit protocol,
``dv_sidecar_rows_per_file``), and the behavior contracts live in the
method docstrings, verbatim from wap.py.
"""

from __future__ import annotations

import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame

from etl_reporting_spark.operators.table_storage import (
    is_external as _is_external,
)
from etl_reporting_spark.operators.wap_core import (
    AuditError,
    ConcurrentWriteError,
    _dv_key_of,
    _leaves_from_keys,
    _pkey_of_file,
    hive_partition_key,
)


class DeleteVectorOps:
    """DV delete / keyed upsert / predicate update / vector
    compaction, as a mixin over the partitioned table (see module
    docstring)."""

    @staticmethod
    def _match_visible_rows(
        snap: DataFrame, source: DataFrame, keys: Sequence[str]
    ) -> DataFrame:
        """Visible target rows whose key appears in the merge source —
        a plain semi join with NO broadcast hint: the source's key set
        is unbounded (a nightly fact batch can carry tens of millions
        of distinct keys), so forcing it onto the driver would OOM at
        exactly the scale the DV MERGE exists for. AQE promotes the
        build side to a broadcast automatically whenever it really is
        small, so narrow-churn callers lose nothing."""
        from pyspark.sql import functions as F

        return snap.join(
            source.select(*keys).distinct(), list(keys), "semi"
        ).select(
            *keys,
            F.col("__file").alias("file_key"),
            F.col("__ridx").alias("row_index"),
        )

    def _write_dv_sidecar(self, dv_df: DataFrame, dv_rel: str) -> int:
        """Write a deletion-vector sidecar dir; returns the exact row
        count written. Small vectors (the narrow-churn / GDPR shape)
        stay one file; past ``dv_sidecar_rows_per_file`` the write
        fans out hash-partitioned on (file_key, row_index) so a
        large vector is written by many tasks — readers consume the
        DIR, so the file count is invisible to them. Sizing comes
        from counting the DEDUPED frame itself (persisted, so the
        write reuses the materialization): the input often unions
        the new rows with ALL prior cumulative mask rows for the
        touched files, so a caller-supplied "new rows" count would
        under-size exactly when the vector is biggest."""
        out = dv_df.select("file_key", "relfile", "row_index").distinct().persist()
        try:
            n_rows = out.count()
            n_files = max(1, -(-n_rows // self.dv_sidecar_rows_per_file))
            sized = (
                out.coalesce(1)
                if n_files == 1
                else out.repartition(n_files, "file_key", "row_index")
            )
            sized.write.parquet(self.fs.url(dv_rel))
        finally:
            out.unpersist()
        return n_rows

    def upsert_rows_dv(
        self,
        source: DataFrame,
        keys: Sequence[str],
        base_version: int | None = None,
        max_rebase: int = 5,
        stats_cols: Sequence[str] | None = None,
        operation: str = "merge",
        extra: dict | None = None,
    ) -> tuple[int, int, int]:
        """MINIMAL-WRITE upsert (Delta's DV-enabled MERGE): matched
        old row versions are deletion-vectored in place and every
        source row is APPENDED as new files — one atomic commit, zero
        existing files rewritten. Write amplification is ∝ |source|
        (the appended rows) + a sidecar ∝ matched rows; compare
        ``merge_partition_files`` (rewrites whole matched files) and
        partition-scoped MERGE (rewrites whole partitions). The
        trade: reads accumulate mask + small files until compaction —
        ``maintenance_plan`` flags both.

        Scope: the target is metadata-pruned to the source's
        partition values (the same PARTITION-STABILITY contract as
        ``merge_upsert_wap(partition_by=...)`` — a key living outside
        those partitions duplicates). Update = retract-old+insert-new
        (the versioned-append model); there are no delete branches —
        use :meth:`delete_rows`.

        Returns ``(version, rows_updated, rows_inserted)`` —
        rows_updated counts distinct MATCHED KEYS (not masked target
        rows: a key with several visible target versions masks them
        all, which must not deflate the insert count).

        Scale posture: the match is a PLAIN semi join (AQE broadcasts
        genuinely-small sources itself; a forced hint would OOM on a
        wide-key nightly batch) and the sidecar write fans out past
        ``dv_sidecar_rows_per_file`` rows — both ends survive a 100×
        batch, not just narrow churn.
        """
        from pyspark.sql import functions as F

        base = base_version if base_version is not None else self.current_version()
        if base == 0:
            raise FileNotFoundError(
                f"no committed WAP table at {self.path} — bootstrap with "
                "create_partitioned_wap_table / commit_partitions"
            )
        # constraints gate BEFORE any write: every source row is
        # appended verbatim, so the source IS the new-rows batch
        self._enforce_constraints(source, self._commit_record(base))
        keys = list(keys)
        vals = (
            source.select(
                *[F.col(c).cast("string") for c in self.partition_by]
            )
            .distinct()
            .collect()
        )
        touched_pkeys = sorted(
            hive_partition_key(self.partition_by, tuple(r)) for r in vals
        )
        # match scope may be WIDER than the write scope: a table whose
        # partition spec evolved holds old-era partitions under a
        # different layout, and a key matching there must still be
        # retracted (HiddenPartitionedWapTable overrides the hook to
        # union per-era candidate keys; default: write scope == match
        # scope, the single-layout contract documented above)
        match_pkeys = self._match_scope_pkeys(source, base, touched_pkeys)
        existing = set(self.partition_map(base))
        present = [k for k in match_pkeys if k in existing]

        # 1. MATCH — visible rows of the pruned target whose key is in
        # the source (one semi-shaped join; lineage gives the mask)
        paths: list[str] = []
        for k in present:
            paths.extend(self.partition_files(k, version=base))
        shared = sorted(p for p in paths if _is_external(p))
        if shared:
            raise ValueError(
                "row-granular mutation of files still SHARED with a clone "
                f"source ({len(shared)} pointer(s)): localize first — "
                "optimize_partitions(table, partitions=...) copies-on-write "
                "the touched partitions into this table"
            )
        n_matched = 0
        n_matched_keys = 0
        masked: list[str] = []
        dv_rel: str | None = None
        root = f"d-{uuid.uuid4().hex[:12]}"
        if paths:
            from urllib.parse import unquote

            snap = self._read_paths(paths, base, with_lineage=True)
            matched = self._match_visible_rows(snap, source, keys).persist()
            try:
                n_matched = matched.count()
                if n_matched:
                    # rows_updated = distinct MATCHED KEYS, not masked
                    # target rows: a target holding several visible
                    # versions of one key (concurrent blind appends,
                    # non-unique history) masks them all, and counting
                    # those rows would under-count (even negative)
                    # inserts below
                    n_matched_keys = matched.select(*keys).distinct().count()
                    fkeys = sorted(
                        r["file_key"]
                        for r in matched.select("file_key").distinct().collect()
                    )
                    rel_of = {fk: unquote(fk) for fk in fkeys}
                    masked = sorted(rel_of.values())
                    base_rec0 = self._commit_record(base)
                    old_dvs = base_rec0.get("delete_vectors", {})
                    prior_refs = sorted(
                        {old_dvs[f] for f in masked if f in old_dvs}
                    )
                    map_df = self.spark.createDataFrame(
                        sorted(rel_of.items()), "file_key string, relfile string"
                    )
                    dv_df = matched.join(F.broadcast(map_df), "file_key").select(
                        "file_key", "relfile", "row_index"
                    )
                    if prior_refs:
                        prior = (
                            self.spark.read.parquet(
                                *[self.fs.resolve(d) for d in prior_refs]
                            )
                            .filter(F.col("relfile").isin(masked))
                            .select("file_key", "relfile", "row_index")
                        )
                        dv_df = dv_df.unionByName(prior)
                    dv_rel = f"{root}/_dv"
                    self.fs.prepare_root()
                    self._write_dv_sidecar(dv_df, dv_rel)
            finally:
                matched.unpersist()

        # 2. APPEND — every source row as new files under the same root
        root_path = self.fs.url(root)
        self.fs.prepare_root()
        source.write.partitionBy(*self.partition_by).mode("append").parquet(
            root_path
        )
        written_keys = self._written_parquet_keys(root, source.schema)
        written = _leaves_from_keys(written_keys, root)
        if not set(written) <= set(touched_pkeys):
            self.fs.delete_prefix(root)
            raise AuditError(
                "source wrote partitions outside its declared values: "
                f"{sorted(set(written) - set(touched_pkeys))}"
            )
        new_files: dict[str, list[str]] = {}
        for leaf in written:
            new_files[leaf] = sorted(
                k for k in written_keys
                if k.startswith(f"{root}/{leaf}/")
                and "/" not in k[len(f"{root}/{leaf}/"):]
            )
        back = (
            # NEW files can't be masked by the base version's vectors,
            # so the audit/stats read skips DV application — which also
            # keeps the plan single-source (input_file_name() in the
            # per-file stats aggregate rejects multi-source plans, and
            # the DV anti-join would add the sidecar as a second one)
            self._read_paths(
                [f for fl in new_files.values() for f in fl],
                base,
                apply_dvs=False,
            )
            if written
            else source.limit(0)
        )
        n_source = back.count()
        our_file_stats = (
            self._file_slice_stats(back, stats_cols, root)
            if stats_cols and written
            else {}
        )
        n_inserted = n_source - n_matched_keys
        if n_source == 0 and n_matched == 0:
            self.fs.delete_prefix(root)
            return (base, 0, 0)

        masked_by_pkey: dict[str, list[str]] = {}
        for f in masked:
            masked_by_pkey.setdefault(_pkey_of_file(f), []).append(f)
        # conflict scope = write scope ∪ every partition that gained a
        # mask (old-era partitions under an evolved spec show up only
        # in masked_by_pkey — an intervening rewrite of those files
        # must still conflict)
        all_touched = sorted(set(touched_pkeys) | set(masked_by_pkey))

        # 3. PUBLISH — one record carrying BOTH the new files and the
        # updated vectors (atomic: readers see retract+insert together)
        attempt = 0
        while True:
            new_version = base + 1
            base_rec = self._commit_record(base)
            pmap = dict(base_rec.get("partitions", {}))
            stats = dict(base_rec.get("stats", {}))
            fmap = dict(base_rec.get("files", {}))
            fstats = dict(base_rec.get("file_stats", {}))
            dvs = dict(base_rec.get("delete_vectors", {}))
            if dv_rel is not None:
                for f in masked:
                    dvs[f] = dv_rel
            for pk in touched_pkeys:
                cur = (
                    self.partition_files(pk, version=base)
                    if pk in set(self.partition_map(base))
                    else []
                )
                final = sorted(cur + new_files.get(pk, []))
                if final:
                    pmap.pop(pk, None)
                    fmap[pk] = final
                # appended values may exceed recorded bounds: stale
                # stats could wrongly SKIP — recompute from complete
                # per-file stats or drop (same rule as file commits)
                fstats.update(our_file_stats)
                if stats_cols and final and all(f in fstats for f in final):
                    merged: dict[str, list] = {}
                    for c in stats_cols:
                        los = [fstats[f][c][0] for f in final if c in fstats[f]]
                        his = [fstats[f][c][1] for f in final if c in fstats[f]]
                        if los and his and None not in los and None not in his:
                            merged[c] = [min(los), max(his)]
                    if merged:
                        stats[pk] = merged
                    else:
                        stats.pop(pk, None)
                else:
                    stats.pop(pk, None)
            record = {
                "version": new_version,
                "partitions": pmap,
                "partition_by": self.partition_by,
                "touched": all_touched,
                "touched_files": {
                    k: sorted(masked_by_pkey.get(k, [])) for k in all_touched
                },
                "row_count": n_source,
                "schema": source.schema.jsonValue(),
                "operation": operation,
                "committed_at": time.time(),
            }
            if stats:
                record["stats"] = stats
            if fmap:
                record["files"] = fmap
            if fstats:
                record["file_stats"] = fstats
            if dvs:
                record["delete_vectors"] = dvs
            if extra:
                record.update(extra)
            try:
                self._publish(record)
                return (new_version, n_matched_keys, n_inserted)
            except ConcurrentWriteError:
                attempt += 1
                latest = self.current_version()
                conflict: set[str] = set()
                for k in all_touched:
                    conflict |= self._conflicting_files(
                        base, latest, k, masked_by_pkey.get(k, [])
                    )
                if conflict or attempt > max_rebase:
                    self.fs.delete_prefix(root)
                    if conflict:
                        raise ConcurrentWriteError(
                            f"files {sorted(conflict)} were committed by "
                            "another writer; re-read and retry the merge"
                        ) from None
                    raise
                base = latest

    def _match_scope_pkeys(
        self,
        source: DataFrame,
        base: int,
        touched_pkeys: Sequence[str],
    ) -> list[str]:
        """Partition keys :meth:`upsert_rows_dv` scans for MATCHED
        rows. Default: exactly the keys the source writes to — the
        single-layout partition-stability contract.
        :class:`HiddenPartitionedWapTable` overrides this to add
        old-era candidate keys after a partition-spec evolution (a
        matching key may live in a partition laid out under a prior
        spec)."""
        return list(touched_pkeys)

    def _conflicting_files(
        self,
        base: int,
        latest: int,
        partition: str,
        replace_files: Sequence[str],
    ) -> set[str]:
        """File-granular conflict probe: files (or the whole-partition
        sentinel ``'*'``) that both we and an intervening commit
        replaced within ``partition``."""
        ours = set(replace_files)
        conflict: set[str] = set()
        for v in range(base + 1, latest + 1):
            rec = self._commit_record(v)
            theirs_parts = rec.get("touched")
            if theirs_parts is None:
                return ours or {"*"}
            if partition not in theirs_parts:
                continue
            tf = rec.get("touched_files", {}).get(partition)
            if tf is None:
                # they replaced the whole partition
                return ours or {"*"}
            conflict |= ours & set(tf)
        return conflict

    def delete_rows(
        self,
        condition=None,
        partitions: Sequence[str] | None = None,
        base_version: int | None = None,
        max_rebase: int = 5,
        operation: str = "delete",
        keys_df: DataFrame | None = None,
        keys: Sequence[str] | None = None,
    ) -> tuple[int, int]:
        """Row-level DELETE via DELETION VECTORS — no data file is
        rewritten (Delta's deletion-vector refinement, one step past
        file-granular commits): matching rows' (file, parquet row
        index) pairs are written to a tiny sidecar and the commit
        record maps each masked file to its CUMULATIVE vector; every
        read (snapshot, time travel, file-granular, CDF, merge
        target) applies the vectors as a broadcast anti-join on the
        scan. At 100 TB a narrow delete costs a metadata-pruned scan
        + a sidecar ∝ deleted rows — zero bytes of the fact rewritten.

        ``condition`` is a Column or SQL string over the committed
        schema — or pass ``keys_df``+``keys`` instead to erase every
        row whose key appears in a key SET (the GDPR right-to-be-
        forgotten shape: millions of subject ids can't be an IN-list;
        the match is one semi join against the pruned snapshot).
        ``partitions`` optionally metadata-prunes the scan (rows
        outside are silently kept, the pruned-DML contract). Returns
        ``(version, rows_deleted)`` — a no-match delete is a NO-OP
        returning (base, 0), publishing nothing.

        Conflict rule: masking a file is touching it — a DV commit
        conflicts with an intervening rewrite of (or another DV on)
        the same file, and rebases automatically past writers of
        disjoint files. Partition stats are NOT tightened by deletes
        (bounds may describe masked rows): pruning stays conservative
        — never wrong — until compaction (``optimize_partitions``
        reads masked and rewrites clean, dropping the vectors).
        """
        from urllib.parse import unquote

        from pyspark.sql import functions as F

        base = base_version if base_version is not None else self.current_version()
        if base == 0:
            raise FileNotFoundError(f"no committed WAP table at {self.path}")
        if (condition is None) == (keys_df is None):
            raise ValueError("pass exactly one of condition / keys_df")
        if keys_df is not None and not keys:
            raise ValueError("keys_df requires keys=[...]")

        pkeys = (
            list(partitions)
            if partitions is not None
            else sorted(self.partition_map(base))
        )
        paths: list[str] = []
        for k in pkeys:
            paths.extend(self.partition_files(k, version=base))
        shared = sorted(p for p in paths if _is_external(p))
        if shared:
            raise ValueError(
                "row-granular mutation of files still SHARED with a clone "
                f"source ({len(shared)} pointer(s), e.g. {shared[0]}): "
                "localize first — optimize_partitions(table, partitions=...) "
                "copies-on-write the touched partitions into this table"
            )
        known = set(paths)
        snap = self._read_paths(paths, base, with_lineage=True)
        if keys_df is not None:
            matched_rows = snap.join(
                keys_df.select(*keys).distinct(), list(keys), "semi"
            )
        else:
            cond = F.expr(condition) if isinstance(condition, str) else condition
            matched_rows = snap.filter(cond)
        new_rows = (
            matched_rows.select(
                F.col("__file").alias("file_key"),
                F.col("__ridx").alias("row_index"),
            )
            .persist()
        )
        try:
            n_deleted = new_rows.count()
            if n_deleted == 0:
                return (base, 0)
            # encoded key → canonical on-disk relpath (urllib unquote
            # inverts the URI %-encoding and leaves '+' alone, unlike
            # form decoding)
            keys = sorted(
                r["file_key"]
                for r in new_rows.select("file_key").distinct().collect()
            )
            rel_of = {fk: unquote(fk) for fk in keys}
            stray = sorted(set(rel_of.values()) - known)
            if stray:
                raise AuditError(
                    f"matched rows map to files outside the snapshot: {stray}"
                )
            masked = sorted(rel_of.values())
            base_rec = self._commit_record(base)
            old_dvs: dict[str, str] = base_rec.get("delete_vectors", {})
            prior_refs = sorted({old_dvs[f] for f in masked if f in old_dvs})
            map_df = self.spark.createDataFrame(
                sorted(rel_of.items()), "file_key string, relfile string"
            )
            dv_df = new_rows.join(F.broadcast(map_df), "file_key").select(
                "file_key", "relfile", "row_index"
            )
            if prior_refs:
                prior = (
                    self.spark.read.parquet(
                        *[self.fs.resolve(d) for d in prior_refs]
                    )
                    .filter(F.col("relfile").isin(masked))
                    .select("file_key", "relfile", "row_index")
                )
                dv_df = dv_df.unionByName(prior)
            root = f"d-{uuid.uuid4().hex[:12]}"
            dv_rel = f"{root}/_dv"
            self.fs.prepare_root()
            self._write_dv_sidecar(dv_df, dv_rel)
        finally:
            new_rows.unpersist()

        touched = sorted({_pkey_of_file(f) for f in masked})
        touched_files: dict[str, list[str]] = {}
        for f in masked:
            touched_files.setdefault(_pkey_of_file(f), []).append(f)

        attempt = 0
        while True:
            new_version = base + 1
            base_rec = self._commit_record(base)
            dvs = dict(base_rec.get("delete_vectors", {}))
            for f in masked:
                dvs[f] = dv_rel
            record = {
                "version": new_version,
                "partitions": dict(base_rec.get("partitions", {})),
                "partition_by": self.partition_by,
                "touched": touched,
                "touched_files": {k: sorted(v) for k, v in touched_files.items()},
                "row_count": n_deleted,
                "schema": base_rec["schema"],
                "operation": operation,
                "committed_at": time.time(),
                "delete_vectors": dvs,
            }
            for carry in ("stats", "files", "file_stats"):
                if base_rec.get(carry):
                    record[carry] = dict(base_rec[carry])
            try:
                self._publish(record)
                return (new_version, n_deleted)
            except ConcurrentWriteError:
                attempt += 1
                latest = self.current_version()
                conflict: set[str] = set()
                for k, fl in touched_files.items():
                    conflict |= self._conflicting_files(base, latest, k, fl)
                if conflict or attempt > max_rebase:
                    self.fs.delete_prefix(root)
                    if conflict:
                        raise ConcurrentWriteError(
                            f"files {sorted(conflict)} were rewritten or "
                            "re-masked by another writer; re-read and retry "
                            "the delete"
                        ) from None
                    raise
                base = latest

    def update_rows_dv(
        self,
        condition,
        assignments: dict[str, object],
        partitions: Sequence[str] | None = None,
        base_version: int | None = None,
        max_rebase: int = 5,
        operation: str = "update",
        stats_cols: Sequence[str] | None = None,
    ) -> tuple[int, int]:
        """Row-level UPDATE via DELETION VECTORS — Delta's DV-enabled
        UPDATE, the missing rung between ``delete_rows`` (DV retract)
        and ``upsert_rows_dv`` (DV retract + keyed append): matching
        rows are masked in place and their UPDATED copies appended as
        new files, one atomic commit, zero existing files rewritten.
        Write amplification ∝ matched rows — a one-key UPDATE on a
        100 TB fact costs a sidecar + one tiny file, where the
        partition-granular rewrite (``sql_dml``'s default UPDATE
        route) rewrites the whole touched partition.

        ``condition`` is a Column or SQL string; ``assignments`` maps
        column → Column/SQL expression evaluated over the PRE-update
        row (standard UPDATE semantics: ``{"amt": "amt + 1"}`` uses
        the old amt). Updating partition columns is allowed — the
        new copy lands in its new partition (retract-here,
        insert-there falls out of the mask+append shape). Keyless by
        design: identity is the row's physical address, so duplicate
        rows update independently — no unique-key requirement.

        Era posture (spec-evolved hidden tables): fully era-agnostic.
        The match scans the visible snapshot (like DELETE); the
        updated copies re-derive under the CURRENT spec
        (:class:`HiddenPartitionedWapTable` hooks
        ``_prepare_update_rows``), so updating an old-era resident
        retracts it in its old-era partition and lands the new
        version under the current layout — an incremental era
        migration of exactly the touched rows.

        Conflict rule: masking a file is touching it, and the append
        touches its partitions — rebases past disjoint writers,
        conflicts with a rewrite of (or another DV on) the same
        files. Returns ``(version, rows_updated)``; no match is a
        no-op returning (base, 0)."""
        from urllib.parse import unquote

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        base = base_version if base_version is not None else self.current_version()
        if base == 0:
            raise FileNotFoundError(f"no committed WAP table at {self.path}")
        base_rec0 = self._commit_record(base)
        schema = StructType.fromJson(base_rec0["schema"])
        names_l = {f.name.lower(): f.name for f in schema.fields}
        norm_assign: dict[str, object] = {}
        for c, e in assignments.items():
            if c.lower() not in names_l:
                raise ValueError(
                    f"UPDATE assigns unknown column {c!r} "
                    f"(schema: {sorted(names_l.values())})"
                )
            norm_assign[names_l[c.lower()]] = (
                F.expr(e) if isinstance(e, str) else e
            )
        self._refuse_update_of_layout_columns(norm_assign)

        pkeys = (
            list(partitions)
            if partitions is not None
            else sorted(self.partition_map(base))
        )
        paths: list[str] = []
        for k in pkeys:
            paths.extend(self.partition_files(k, version=base))
        shared = sorted(p for p in paths if _is_external(p))
        if shared:
            raise ValueError(
                "row-granular mutation of files still SHARED with a clone "
                f"source ({len(shared)} pointer(s)): localize first — "
                "optimize_partitions(table, partitions=...) copies-on-write "
                "the touched partitions into this table"
            )
        snap = self._read_paths(paths, base, with_lineage=True)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        matched = snap.filter(cond).persist()
        try:
            n_updated = matched.count()
            if n_updated == 0:
                return (base, 0)
            # ------ mask: cumulative sidecar, same shape as delete_rows
            fkeys = sorted(
                r["file_key"]
                for r in matched.select(
                    F.col("__file").alias("file_key")
                ).distinct().collect()
            )
            rel_of = {fk: unquote(fk) for fk in fkeys}
            masked = sorted(rel_of.values())
            old_dvs: dict[str, str] = base_rec0.get("delete_vectors", {})
            prior_refs = sorted({old_dvs[f] for f in masked if f in old_dvs})
            map_df = self.spark.createDataFrame(
                sorted(rel_of.items()), "file_key string, relfile string"
            )
            dv_df = (
                matched.select(
                    F.col("__file").alias("file_key"),
                    F.col("__ridx").alias("row_index"),
                )
                .join(F.broadcast(map_df), "file_key")
                .select("file_key", "relfile", "row_index")
            )
            if prior_refs:
                prior = (
                    self.spark.read.parquet(
                        *[self.fs.resolve(d) for d in prior_refs]
                    )
                    .filter(F.col("relfile").isin(masked))
                    .select("file_key", "relfile", "row_index")
                )
                dv_df = dv_df.unionByName(prior)
            root = f"d-{uuid.uuid4().hex[:12]}"
            dv_rel = f"{root}/_dv"
            self.fs.prepare_root()
            self._write_dv_sidecar(dv_df, dv_rel)

            # ------ the updated copies, standard UPDATE semantics
            # (every RHS sees the pre-update row), re-prepared for the
            # current layout (hidden tables re-derive partition values)
            updated = matched.select(
                *[
                    (norm_assign[f.name] if f.name in norm_assign else F.col(f.name))
                    .cast(f.dataType)
                    .alias(f.name)
                    for f in schema.fields
                ]
            )
            updated = self._prepare_update_rows(updated)
            self._enforce_constraints(updated, base_rec0)

            # ------ append under the same root (the commit references
            # root-relative paths; mask + new files publish together)
            updated.write.partitionBy(*self.partition_by).mode(
                "append"
            ).parquet(self.fs.url(root))
            written_keys = [
                k
                for k in self._written_parquet_keys(root, updated.schema)
                if not k[len(root) + 1:].startswith("_dv/")
            ]
            written = _leaves_from_keys(written_keys, root)
            new_files: dict[str, list[str]] = {}
            for leaf in written:
                new_files[leaf] = sorted(
                    k
                    for k in written_keys
                    if k.startswith(f"{root}/{leaf}/")
                    and "/" not in k[len(f"{root}/{leaf}/"):]
                )
            back = (
                self._read_paths(
                    [f for fl in new_files.values() for f in fl],
                    base,
                    apply_dvs=False,
                )
                if written
                else updated.limit(0)
            )
            n_back = back.count()
            if n_back != n_updated:
                self.fs.delete_prefix(root)
                raise AuditError(
                    f"update wrote {n_back} rows for {n_updated} matched — "
                    "refusing to publish a lossy rewrite"
                )
            our_file_stats = (
                self._file_slice_stats(back, stats_cols, root)
                if stats_cols and written
                else {}
            )
        finally:
            matched.unpersist()

        masked_by_pkey: dict[str, list[str]] = {}
        for f in masked:
            masked_by_pkey.setdefault(_pkey_of_file(f), []).append(f)
        all_touched = sorted(set(masked_by_pkey) | set(written))

        # ------ publish (the upsert-rung record shape: DVs + files in
        # one atomic commit; rebase past disjoint writers)
        attempt = 0
        while True:
            new_version = base + 1
            base_rec = self._commit_record(base)
            pmap = dict(base_rec.get("partitions", {}))
            stats = dict(base_rec.get("stats", {}))
            fmap = dict(base_rec.get("files", {}))
            fstats = dict(base_rec.get("file_stats", {}))
            dvs = dict(base_rec.get("delete_vectors", {}))
            for f in masked:
                dvs[f] = dv_rel
            for pk in written:
                cur = (
                    self.partition_files(pk, version=base)
                    if pk in set(self.partition_map(base))
                    else []
                )
                final = sorted(cur + new_files.get(pk, []))
                pmap.pop(pk, None)
                fmap[pk] = final
                fstats.update(our_file_stats)
                # appended values may exceed recorded bounds — same
                # recompute-or-drop rule as the upsert rung
                if stats_cols and final and all(f in fstats for f in final):
                    merged: dict[str, list] = {}
                    for c in stats_cols:
                        los = [fstats[f][c][0] for f in final if c in fstats[f]]
                        his = [fstats[f][c][1] for f in final if c in fstats[f]]
                        if los and his and None not in los and None not in his:
                            merged[c] = [min(los), max(his)]
                    if merged:
                        stats[pk] = merged
                    else:
                        stats.pop(pk, None)
                else:
                    stats.pop(pk, None)
            record = {
                "version": new_version,
                "partitions": pmap,
                "partition_by": self.partition_by,
                "touched": all_touched,
                "touched_files": {
                    k: sorted(masked_by_pkey.get(k, [])) for k in all_touched
                },
                "row_count": n_updated,
                "schema": base_rec0["schema"],
                "operation": operation,
                "committed_at": time.time(),
                "delete_vectors": dvs,
            }
            if stats:
                record["stats"] = stats
            if fmap:
                record["files"] = fmap
            if fstats:
                record["file_stats"] = fstats
            try:
                self._publish(record)
                return (new_version, n_updated)
            except ConcurrentWriteError:
                attempt += 1
                latest = self.current_version()
                conflict: set[str] = set()
                for k in all_touched:
                    conflict |= self._conflicting_files(
                        base, latest, k, masked_by_pkey.get(k, [])
                    )
                if conflict or attempt > max_rebase:
                    self.fs.delete_prefix(root)
                    if conflict:
                        raise ConcurrentWriteError(
                            f"files {sorted(conflict)} were committed by "
                            "another writer; re-read and retry the update"
                        ) from None
                    raise
                base = latest

    def _prepare_update_rows(self, updated: DataFrame) -> DataFrame:
        """Hook: re-shape updated copies for the current physical
        layout before the append. Default: identity (explicit
        partition columns are data columns and ride along).
        :class:`transforms.HiddenPartitionedWapTable` re-derives the
        hidden partition values — which is what routes an updated
        old-era resident into the current layout."""
        return updated

    def _refuse_update_of_layout_columns(
        self, assignments: dict[str, object]
    ) -> None:
        """Hook for layout-column assignment policy. Explicit
        partitioning allows it (the new copy lands in its new
        partition); the hidden subclass refuses assigning DERIVED
        columns (the table computes those) while allowing transform
        SOURCES (re-derivation moves the row)."""

    def compact_vectors(
        self,
        base_version: int | None = None,
        max_rebase: int = 5,
    ) -> tuple[int, int]:
        """Consolidate ALL referenced deletion-vector sidecars into
        ONE — without touching a byte of data (the cheap middle rung
        between "let masks accumulate" and a full compaction that
        rewrites the files). High-frequency DV churn leaves one
        sidecar dir per commit; every read unions the referenced dirs
        into its broadcast anti-join, so both the scan count and the
        broadcast payload grow with commit count AND with stale rows
        (cumulative sidecars keep rows for files since rewritten).
        This commit reads the union once, drops rows whose file is no
        longer masked, dedups, writes one sidecar, and re-points
        every masked file at it: reads go back to one tiny scan and a
        minimal broadcast. Nightly-cheap; the weekly full compaction
        (``optimize_partitions``) still clears masks entirely.

        Conflict rule: consolidating a file's vector is touching that
        file (same as ``delete_rows``) — a concurrent rewrite of, or
        new DV on, a masked file wins or loses cleanly; writers of
        disjoint files rebase past us automatically.

        Returns ``(version, n_mask_rows)``; a table with fewer than
        two referenced sidecars (nothing to consolidate) is a no-op
        returning ``(base, 0)`` and publishing nothing."""
        from pyspark.sql import functions as F

        base = base_version if base_version is not None else self.current_version()
        if base == 0:
            raise FileNotFoundError(f"no committed WAP table at {self.path}")
        base_rec = self._commit_record(base)
        dvs: dict[str, str] = dict(base_rec.get("delete_vectors", {}))
        if len(set(dvs.values())) < 2:
            return (base, 0)
        masked = sorted(dvs)
        # sidecar rows carry d-root-anchored keys; record keys can be
        # ABSOLUTE for clone-inherited vectors — normalize before the
        # membership filter or those rows would be dropped and their
        # deleted rows silently resurrected in the clone
        mask_keys = sorted({_dv_key_of(f) for f in masked})
        union = self.spark.read.parquet(
            *sorted(self.fs.resolve(d) for d in set(dvs.values()))
        ).filter(F.col("relfile").isin(mask_keys))
        root = f"d-{uuid.uuid4().hex[:12]}"
        dv_rel = f"{root}/_dv"
        # the helper dedups/persists/counts once and writes from the
        # same materialization — no second scan of the union
        n_rows = self._write_dv_sidecar(union, dv_rel)

        touched_files: dict[str, list[str]] = {}
        for f in masked:
            touched_files.setdefault(_pkey_of_file(f), []).append(f)
        attempt = 0
        while True:
            new_version = base + 1
            base_rec = self._commit_record(base)
            new_dvs = dict(base_rec.get("delete_vectors", {}))
            for f in masked:
                new_dvs[f] = dv_rel
            record = {
                "version": new_version,
                "partitions": dict(base_rec.get("partitions", {})),
                "partition_by": self.partition_by,
                "touched": sorted(touched_files),
                "touched_files": {k: sorted(v) for k, v in touched_files.items()},
                "row_count": n_rows,
                "schema": base_rec["schema"],
                "operation": "compact_vectors",
                "committed_at": time.time(),
                "delete_vectors": new_dvs,
            }
            for carry in ("stats", "files", "file_stats"):
                if base_rec.get(carry):
                    record[carry] = dict(base_rec[carry])
            try:
                self._publish(record)
                return (new_version, n_rows)
            except ConcurrentWriteError:
                attempt += 1
                latest = self.current_version()
                conflict: set[str] = set()
                for k, fl in touched_files.items():
                    conflict |= self._conflicting_files(base, latest, k, fl)
                if conflict or attempt > max_rebase:
                    self.fs.delete_prefix(root)
                    if conflict:
                        raise ConcurrentWriteError(
                            f"files {sorted(conflict)} were rewritten or "
                            "re-masked by another writer; re-run vector "
                            "compaction from the new snapshot"
                        ) from None
                    raise
                base = latest
