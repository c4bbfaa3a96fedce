"""Change feed, compaction, cloning, and the maintenance planner —
split out of wap.py in round 13 (pure move, zero behavior change;
wap.py re-exports every public name at its bottom, so existing
``from etl_reporting_spark.operators.wap import table_changes`` paths
keep working, and the imports below from wap resolve because wap
imports THIS module only after all its definitions).
"""

from __future__ import annotations

import json
import math
import time
import uuid
import warnings
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_reporting_spark.operators.table_storage import (
    is_external as _is_external,
)
from etl_reporting_spark.operators.wap import (
    CloneRetentionWarning,
    PartitionedWapTable,
    WapTable,
    _pkey_of_file,
    _root_of,
    _STICKY_RECORD_KEYS,
    hive_partition_key,
    open_wap_table,
)


def table_changes(
    table: WapTable,
    keys: Sequence[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level changes between two committed snapshots — the
    diff-derived twin of Delta's change data feed. Emits the table's
    columns plus ``_change_type`` ∈ {insert, delete,
    update_preimage, update_postimage} (Delta's CDF vocabulary), keyed
    by ``keys``: a key only in the newer snapshot is an insert, only
    in the older a delete, in both with any non-key difference an
    update (both images emitted).

    Scale: for a :class:`PartitionedWapTable` the diff reads ONLY
    partitions whose pointer changed between the two versions' maps —
    and within a changed partition, only the FILES exclusive to one
    side (files present in both versions are immutable, so their rows
    cannot differ). All metadata-level comparisons, no data touched
    for inherited partitions or retained files — CDC cost tracks file
    churn, not table size (a one-key file-granular upsert into a
    years-deep fact diffs one file pair). A full-snapshot table diffs
    everything, which is what its commit rewrote anyway. One
    full-outer shuffle on the keys either way.
    """
    to_version = to_version if to_version is not None else table.current_version()
    from pyspark.sql import functions as F

    if from_version == 0:
        # diff from "before the table existed": every current row is
        # an insert — the natural CDC bootstrap read
        new = table.read(version=to_version)
        old = new.limit(0)
    elif isinstance(table, PartitionedWapTable):
        m_old = table.partition_map(from_version)
        m_new = table.partition_map(to_version)
        dv_old = table._commit_record(from_version).get("delete_vectors", {})
        dv_new = table._commit_record(to_version).get("delete_vectors", {})
        changed = {k for k, d in m_old.items() if m_new.get(k) != d}
        changed |= {k for k, d in m_new.items() if m_old.get(k) != d}
        # a deletion-vector commit changes NO pointers — detect masked
        # files whose vector ref moved and mark their partitions
        changed |= {
            _pkey_of_file(f)
            for f in set(dv_old) | set(dv_new)
            if dv_old.get(f) != dv_new.get(f)
        }
        # file-granular refinement: within a changed partition, files
        # present in BOTH versions with the SAME delete vector are
        # immutable and identically masked — only each side's
        # exclusive files, plus common files whose vector changed
        # (read on BOTH sides: the newly-masked rows surface as
        # deletes through the join), can produce change rows. A
        # dir-granular pointer falls back to whole-partition file
        # lists (partition_files derives them from the immutable
        # leaf), and the set difference still prunes inherited files.
        old_files: list[str] = []
        new_files: list[str] = []
        for k in sorted(changed):
            fo = set(table.partition_files(k, from_version)) if k in m_old else set()
            fn = set(table.partition_files(k, to_version)) if k in m_new else set()
            dv_churned = {
                f for f in fo & fn if dv_old.get(f) != dv_new.get(f)
            }
            old_files.extend(sorted((fo - fn) | dv_churned))
            new_files.extend(sorted((fn - fo) | dv_churned))
        old = table.read_files(old_files, version=from_version)
        new = table.read_files(new_files, version=to_version)
    else:
        old = table.read(version=from_version)
        new = table.read(version=to_version)
    keys = list(keys)
    rec_to = table._commit_record(to_version)
    rec_from = (
        table._commit_record(from_version) if from_version else {}
    )
    # RENAME between the versions (round-12): the old side reads under
    # the column's old physical-era name — logically the SAME column.
    # Resolve it through the to-version's name chain BEFORE the union
    # alignment, or a pure rename would diff as a spurious whole-table
    # update (old amt=x/amount=NULL vs new amt=NULL/amount=x).
    prior: dict[str, list[str]] = rec_to.get("prior_names", {})
    if prior:
        old_cols = set(old.columns)
        for cur, chain in prior.items():
            if cur in old_cols:
                continue
            for p in reversed(chain):
                if p in old_cols:
                    old = old.withColumnRenamed(p, cur)
                    break
    # hidden-partitioning derived columns are physical layout, not
    # logical data — and under SPEC EVOLUTION each side would carry
    # its own era's targets, NULL-filling into spurious updates. Drop
    # every era's targets from both sides (matches what read() hides).
    derived: set[str] = set()
    for rec in (rec_from, rec_to):
        eras = rec.get("partition_spec_history") or (
            [rec["partition_spec"]] if rec.get("partition_spec") else []
        )
        if not eras:
            continue
        # late import: transforms.py imports this module
        from etl_reporting_spark.operators.transforms import Transform

        derived.update(
            Transform.from_json(t).target
            for era in eras
            for t in era
            if t.get("kind") != "identity"
        )
    if derived:
        old = old.drop(*sorted(derived & set(old.columns)))
        new = new.drop(*sorted(derived & set(new.columns)))
    # schema evolution: each side reads as its own committed schema;
    # align both to the union (ADD COLUMN between the versions would
    # otherwise fail resolving old.select(new-only column), and a
    # DROP COLUMN would lose the old side's values from the diff).
    # Missing columns read NULL, the same semantics read() applies to
    # pre-column partitions.
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in new.schema.fields}
    for name, f in new_fields.items():
        if name not in old_fields:
            old = old.withColumn(name, F.lit(None).cast(f.dataType))
    for name, f in old_fields.items():
        if name not in new_fields:
            new = new.withColumn(name, F.lit(None).cast(f.dataType))
    missing_keys = [k for k in keys if k not in old_fields and k not in new_fields]
    if missing_keys:
        raise ValueError(f"change-feed keys absent from both snapshots: {missing_keys}")
    nonkeys = [c for c in new.columns if c not in keys]
    old = old.select(*keys, *nonkeys)
    new = new.select(*keys, *nonkeys)
    o = old.select(
        *keys,
        F.struct(*nonkeys).alias("__o"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys,
        F.struct(*nonkeys).alias("__n"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, on=keys, how="full_outer")
    ins = j.filter(F.col("__in_old").isNull()).select(
        *keys, F.col("__n").alias("__v"), F.lit("insert").alias("_change_type")
    )
    dele = j.filter(F.col("__in_new").isNull()).select(
        *keys, F.col("__o").alias("__v"), F.lit("delete").alias("_change_type")
    )
    upd = j.filter(
        F.col("__in_old").isNotNull()
        & F.col("__in_new").isNotNull()
        # null-safe struct compare: any non-key difference is a change
        & ~F.col("__o").eqNullSafe(F.col("__n"))
    )
    pre = upd.select(
        *keys, F.col("__o").alias("__v"), F.lit("update_preimage").alias("_change_type")
    )
    post = upd.select(
        *keys, F.col("__n").alias("__v"), F.lit("update_postimage").alias("_change_type")
    )
    stacked = ins.unionByName(dele).unionByName(pre).unionByName(post)
    return stacked.select(
        *keys, *[F.col(f"__v.{c}").alias(c) for c in nonkeys], "_change_type"
    )


from etl_reporting_spark.operators.skew import zorder_key  # noqa: E402


def optimize_partitions(
    table: PartitionedWapTable,
    partitions: Sequence[str] | None = None,
    n_files: int = 1,
    cluster_by: Sequence[str] | None = None,
    stats_cols: Sequence[str] | None = None,
    zorder: bool = False,
) -> int:
    """Compaction commit (Delta OPTIMIZE at partition granularity):
    rewrite the named partitions' many small files — the residue of
    high-frequency streaming epochs — into ``n_files`` per partition,
    as a normal partition-scoped commit with IDENTICAL logical
    content. Returns the new version.

    ``cluster_by`` additionally range-clusters the rewrite on the
    named columns: rows are range-partitioned so each output file
    holds a tight, near-disjoint value range, which is what makes the
    per-file [min, max] stats (``stats_cols`` — defaults to
    ``cluster_by``) actually selective. Compact-then-cluster is the
    maintenance step that turns an append-churned partition back
    into one where ``merge_partition_files`` / ``files_intersecting``
    touch O(1) files per narrow key.

    Plain ``cluster_by`` over several columns is LEXICOGRAPHIC —
    files are selective on the leading column only. ``zorder=True``
    (Delta ``OPTIMIZE ... ZORDER BY``'s multi-column case) instead
    range-clusters on the bit-interleaved :func:`zorder_key`, so a
    range predicate on ANY of the clustered columns skips most files
    (the test pins exactly this contrast). Z-ordering needs numeric
    columns; stats still record the raw columns.

    Because compaction rides the same commit protocol, it gets the
    same guarantees free: readers atomically flip to the compacted
    layout, time travel keeps the old one, a concurrent upsert to the
    SAME partition conflicts (one winner — rerun compaction on the
    merged state), and disjoint-partition writers are untouched by
    the rebase rule."""
    from pyspark.sql import functions as F

    pmap = table.partition_map()
    todo = sorted(pmap) if partitions is None else sorted(partitions)
    df = table.read(partitions=todo)
    if cluster_by:
        n_ranges = max(n_files, 1) * max(len(todo), 1)
        if zorder:
            # bounds collected over the touched slice only; the key
            # is literal-constant codegen — no join, no extra shuffle
            df, zkey = zorder_key(df, cluster_by)
            keys = [*(F.col(c) for c in table.partition_by), zkey]
            df = df.repartitionByRange(n_ranges, *keys)
        else:
            # range-cluster WITHIN each hive partition: partition cols
            # lead the range key so a multi-partition rewrite doesn't
            # interleave partitions across tasks, then the cluster
            # cols give each task (→ each output file) a contiguous
            # range
            keys = [F.col(c) for c in (*table.partition_by, *cluster_by)]
            df = df.repartitionByRange(n_ranges, *keys)
        if stats_cols is None:
            stats_cols = list(cluster_by)
    else:
        df = df.coalesce(n_files)
    return table.commit_partitions(
        df, replace=todo, operation="optimize", stats_cols=stats_cols
    )


def clone_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | None = None,
) -> PartitionedWapTable:
    """Zero-copy SHALLOW CLONE (Delta's CREATE TABLE ... SHALLOW
    CLONE): the clone is a new commit log whose v1 pointers reference
    the source's data files ABSOLUTELY — no byte copied, created in
    O(metadata) at any table size. The dev/test/backfill-sandbox
    primitive: experiment on a 100 TB fact for the cost of one JSON
    record.

    Copy-on-write from there: ``commit_partitions`` (and compaction)
    write LOCAL roots and drop the shared pointers they replace —
    the source is never touched by any clone mutation. Deletion
    vectors keep masking through the clone (the per-row key anchors
    at the ``d-*`` root, not the table path). Row-granular mutation
    of still-shared files (``delete_rows`` / ``upsert_rows_dv`` /
    ``merge_partition_files``) requires localizing the touched
    partitions first — ``optimize_partitions(clone, partitions=…)``
    is the one-step localizer — and refuses with that guidance.

    CLONE REGISTRATION (round-11; historically this carried Delta's
    unprotected-clone caveat — a source vacuum could silently collect
    files a clone still referenced): cloning now writes a small
    registration object under the SOURCE's ``_clones/`` prefix, BEFORE
    the clone's first publish, pinning the source version it
    references. Source ``vacuum`` keeps every pinned snapshot alive —
    warning loudly via :class:`CloneRetentionWarning` when a pin holds
    space beyond the retention window — until the registration is
    dropped: explicitly via ``src.release_clone(token)`` (the token is
    in the clone's v1 record under ``clone_token`` and in
    ``src.registered_clones()``), or automatically once the clone's
    commit log is verifiably gone. ``vacuum(ignore_clones=True)`` is
    the explicit opt-back-in to the old collect-anyway behavior.
    Registration is one unconditional PUT (S3 ``PutObject``); no
    source COMMIT happens — cloning still never perturbs the source's
    version history.
    """
    src = open_wap_table(spark, src_path)
    if not isinstance(src, PartitionedWapTable):
        raise TypeError("clone_table supports partitioned WAP tables")
    v = version if version is not None else src.current_version()
    rec = src._commit_record(v)
    src_abs = src.fs.absolute_url()

    def absf(rel: str) -> str:
        # already-external pointers (a clone of a clone) pass through;
        # source-relative ones become fully-qualified source locations
        return rel if _is_external(rel) else src.fs.absolute_url(rel)

    dst = PartitionedWapTable(
        spark, dst_path, rec.get("partition_by", src.partition_by)
    )
    if dst.current_version() != 0:
        raise FileExistsError(f"WAP table already exists at {dst_path}")
    record = {
        "version": 1,
        "partitions": {k: absf(d) for k, d in rec.get("partitions", {}).items()},
        "partition_by": dst.partition_by,
        "touched": [],
        "row_count": rec.get("row_count"),
        "schema": rec["schema"],
        "operation": "clone",
        "committed_at": time.time(),
        "cloned_from": {"path": src_abs, "version": v},
    }
    if rec.get("files"):
        record["files"] = {
            k: [absf(f) for f in fl] for k, fl in rec["files"].items()
        }
    if rec.get("stats"):
        record["stats"] = dict(rec["stats"])
    for sticky in _STICKY_RECORD_KEYS:
        # a clone inherits the source's sticky metadata (constraints,
        # hidden-partitioning spec) — its v1 has no predecessor for
        # _publish's centralized carry to read
        if rec.get(sticky):
            record[sticky] = rec[sticky]
    if rec.get("file_stats"):
        record["file_stats"] = {absf(f): s for f, s in rec["file_stats"].items()}
    if rec.get("delete_vectors"):
        record["delete_vectors"] = {
            absf(f): absf(d) for f, d in rec["delete_vectors"].items()
        }
    # register on the SOURCE before the clone becomes readable: a
    # crash after this point leaves a dangling registration (auto-
    # collected once the missing clone log is verifiably absent and
    # past the age horizon), never an unprotected clone
    token = f"clone-{uuid.uuid4().hex[:12]}"
    record["clone_token"] = token
    src.fs.put_key(
        f"_clones/{token}.json",
        json.dumps(
            {
                "token": token,
                "dst_path": dst.fs.absolute_url(),
                "src_version": v,
                "created_at": time.time(),
            },
            sort_keys=True,
        ).encode(),
    )
    dst.fs.prepare_root()
    dst._publish(record)
    return dst


def _stat_ord(v) -> float | None:
    """Best-effort monotonic numeric view of a per-file stat value
    (stats are JSON: numbers pass through, DECIMAL strings parse,
    ISO date/timestamp strings map to epoch seconds). None for
    non-orderable values — the z-order overlap heuristic then skips
    that column rather than guessing."""
    import datetime as _dt

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            pass
        try:
            d = _dt.datetime.fromisoformat(v)
        except ValueError:
            return None
        epoch = _dt.datetime(1970, 1, 1, tzinfo=d.tzinfo)
        return (d - epoch).total_seconds()
    return None


def maintenance_plan(
    table: PartitionedWapTable,
    max_files_per_partition: int = 16,
    max_roots: int | None = None,
    keep_last: int = 2,
    max_dv_sidecars: int = 4,
    zorder_overlap_ratio: float = 1.5,
    zorder_min_files: int = 4,
    max_stats_staleness: int = 5,
) -> dict:
    """Metadata-only maintenance diagnosis — the nightly decision
    input that keeps the table's read/merge costs flat. Reads ONLY
    the commit record (no filesystem listing, no scan), so it is
    O(metadata) at any table size. Returns::

        {"summary": {...counts...},
         "actions": [{"action": "compact"|"vacuum",
                      "partitions": [...] | None,
                      "reason": "..."}, ...]}

    Triggers, each mapped to the operator that clears it:
    - live commit roots > ``max_roots`` (default: the table's
      ``max_read_roots``) → plan width: compact the multi-root
      partitions (``optimize_partitions``);
    - a partition backed by more than ``max_files_per_partition``
      files → small-files creep from streaming epochs / repeated
      file-granular merges: compact it;
    - more than ``max_dv_sidecars`` referenced sidecar dirs →
      consolidate to one with ``compact_vectors`` (zero data
      rewritten — the cheap cadence between deletes and the full
      compaction below);
    - any partition with masked (deletion-vectored) files → compact
      to apply the vectors and drop the mask from the read path;
    - table version beyond the ``keep_last`` retention window →
      superseded snapshots/sidecars may be reclaimable: ``vacuum``;
    - per-file [min, max] stats OVERLAP on 2+ stat'd columns of a
      multi-file partition (round-10 brief #4) → the layout is
      selective on at most the leading column: recommend a Z-ORDER
      rewrite on exactly those columns. The overlap measure per
      column is ``sum(file range widths) / global span`` — 1.0 for
      perfectly tiled files, ≈n_files when every file covers the
      whole span; a column past ``zorder_overlap_ratio`` is
      unclustered. The trigger scales with file count — a perfectly
      z-ordered 2-D layout measures ≈``sqrt(n_files)`` per column
      (each file a √-box of the space) while a random layout
      measures ≈``n_files`` — so the threshold is
      ``zorder_overlap_ratio × sqrt(n_files)``. Date/timestamp stats
      participate via their ISO strings (the reference's hottest
      predicates are date cutoffs), so a ``(event_date, user_key)``
      recommendation is the expected shape on an append-churned
      fact.
    - optimizer statistics (``collect_table_stats``) more than
      ``max_stats_staleness`` data commits behind the tip →
      ``analyze``: join_advice is planning from old sizes/NDV.
      Tables that never opted into statistics are not nagged.
    - partitions still referencing files written BEFORE the last
      column rename (round-12) → compact them: until the old
      physical names are rewritten away, plain-scan surfaces
      (permanent views, symlink manifests) refuse on those
      partitions and every read pays the chain-COALESCE. Detected
      metadata-only: live roots intersected with the roots live at
      the last rename commit (found by walking the log for the last
      ``prior_names`` change — the same O(versions) walk the
      statistics-staleness trigger does).

    The planner never executes anything — it composes with whatever
    scheduler runs maintenance; tests assert that APPLYING the plan
    empties the next diagnosis."""
    v = table.current_version()
    rec = table._commit_record(v) if v else {}
    pmap = table.partition_map(v)
    dvs: dict[str, str] = rec.get("delete_vectors", {})
    if max_roots is None:
        max_roots = table.max_read_roots

    roots_by_part: dict[str, set[str]] = {}
    files_by_part: dict[str, int] = {}
    for k, ptr in pmap.items():
        rels = ptr if isinstance(ptr, tuple) else (ptr,)
        roots_by_part[k] = {_root_of(r) for r in rels}
        files_by_part[k] = (
            len(ptr) if isinstance(ptr, tuple) else len(table.partition_files(k, v))
        )
    masked_by_part: dict[str, int] = {}
    for f in dvs:
        pk = _pkey_of_file(f)
        masked_by_part[pk] = masked_by_part.get(pk, 0) + 1

    live_roots = table.live_commit_roots(v)
    actions: list[dict] = []
    if len(live_roots) > max_roots:
        multi = sorted(k for k, r in roots_by_part.items() if len(r) > 1)
        actions.append(
            {
                "action": "compact",
                "partitions": multi or sorted(pmap),
                "reason": (
                    f"{len(live_roots)} live commit roots > max_roots="
                    f"{max_roots}: read plans one scan per root"
                ),
            }
        )
    wide = sorted(
        k for k, n in files_by_part.items() if n > max_files_per_partition
    )
    if wide:
        actions.append(
            {
                "action": "compact",
                "partitions": wide,
                "reason": (
                    f"partitions exceed {max_files_per_partition} files "
                    "(small-files creep raises open/footer cost per scan)"
                ),
            }
        )
    n_sidecars = len(set(dvs.values()))
    if n_sidecars > max_dv_sidecars:
        actions.append(
            {
                "action": "compact_vectors",
                "partitions": None,
                "reason": (
                    f"{n_sidecars} referenced DV sidecar dirs > "
                    f"max_dv_sidecars={max_dv_sidecars}: every read scans "
                    "and broadcasts their union — consolidate to one "
                    "(zero data rewritten) when full compaction is "
                    "deferred to a slower cadence"
                ),
            }
        )
    if masked_by_part:
        actions.append(
            {
                "action": "compact",
                "partitions": sorted(masked_by_part),
                "reason": (
                    "deletion vectors mask "
                    f"{sum(masked_by_part.values())} file(s): compaction "
                    "applies the mask and removes the per-read anti-join"
                ),
            }
        )
    # z-order advisor: per-partition, per-column overlap of the
    # recorded per-file [min, max] ranges — pure metadata arithmetic
    fstats: dict[str, dict] = rec.get("file_stats", {})
    by_part_stats: dict[str, list[dict]] = {}
    for f, cols_ in fstats.items():
        by_part_stats.setdefault(_pkey_of_file(f), []).append(cols_)
    zorder_votes: dict[tuple, list[str]] = {}
    for pk, stat_rows in sorted(by_part_stats.items()):
        if len(stat_rows) < zorder_min_files:
            continue
        threshold = zorder_overlap_ratio * math.sqrt(len(stat_rows))
        overlapping: list[tuple[str, float]] = []
        cols_present = set.intersection(*(set(s) for s in stat_rows))
        for c in sorted(cols_present):
            spans = [
                (_stat_ord(s[c][0]), _stat_ord(s[c][1])) for s in stat_rows
            ]
            if any(lo is None or hi is None for lo, hi in spans):
                continue
            glo = min(lo for lo, _ in spans)
            ghi = max(hi for _, hi in spans)
            if ghi <= glo:
                continue
            ratio = sum(hi - lo for lo, hi in spans) / (ghi - glo)
            if ratio > threshold:
                overlapping.append((c, ratio))
        if len(overlapping) >= 2:
            key = tuple(c for c, _ in overlapping)
            zorder_votes.setdefault(key, []).append(pk)
    for cols_key, parts in sorted(zorder_votes.items()):
        actions.append(
            {
                "action": "compact",
                "partitions": parts,
                "zorder": list(cols_key),
                "reason": (
                    f"per-file [min,max] ranges overlap on columns "
                    f"{list(cols_key)} across {len(parts)} partition(s): "
                    "the current layout skips files on at most the "
                    "leading column — rewrite with optimize_partitions("
                    "zorder=True, cluster_by="
                    f"{list(cols_key)}) to make every column selective"
                ),
            }
        )
    if v > keep_last:
        actions.append(
            {
                "action": "vacuum",
                "partitions": None,
                "reason": (
                    f"version {v} > keep_last={keep_last}: superseded "
                    "snapshot dirs/sidecars may be reclaimable"
                ),
            }
        )
    # stats-staleness advisor (round-11): a table that OPTED INTO
    # optimizer statistics (collect_table_stats ran at least once)
    # whose stats have fallen max_stats_staleness data commits behind
    # gets an "analyze" action — join_advice from stale stats says so
    # per call, but the maintenance cadence is where the refresh
    # belongs. Tables that never analyzed are not nagged.
    tstats = rec.get("table_stats")
    stats_staleness = None
    if tstats and "analyzed_version" in tstats:
        stats_staleness = 0
        for between in range(tstats["analyzed_version"] + 1, v + 1):
            op = table._commit_record(between).get("operation", "")
            if op not in ("analyze", "analyze_keys", "add_constraint",
                          "drop_constraint", "alter_schema"):
                stats_staleness += 1
        if stats_staleness > max_stats_staleness:
            actions.append(
                {
                    "action": "analyze",
                    "partitions": None,
                    "reason": (
                        f"optimizer statistics are {stats_staleness} data "
                        f"commits stale (> max_stats_staleness="
                        f"{max_stats_staleness}): join_advice is planning "
                        "from old sizes/NDV — rerun collect_table_stats"
                    ),
                }
            )
    if rec.get("prior_names"):
        rename_v = None
        prev_pn = None
        for vv in range(1, v + 1):
            pn = table._commit_record(vv).get("prior_names")
            if pn != prev_pn:
                rename_v, prev_pn = vv, pn
        old_roots: set[str] = set()
        if rename_v:
            for ptr in table.partition_map(rename_v).values():
                rels = ptr if isinstance(ptr, tuple) else (ptr,)
                old_roots.update(_root_of(r) for r in rels)
        residue = sorted(
            k for k, roots in roots_by_part.items() if roots & old_roots
        )
        if residue:
            actions.append(
                {
                    "action": "compact",
                    "partitions": residue,
                    "reason": (
                        f"{len(residue)} partition(s) still reference "
                        "files written before the last column rename — "
                        "plain-scan surfaces (permanent views, symlink "
                        "manifests) refuse on them and reads pay the "
                        "chain-COALESCE until they are rewritten"
                    ),
                }
            )
    summary = {
        "version": v,
        "partitions": len(pmap),
        "live_roots": len(live_roots),
        "masked_files": sum(masked_by_part.values()),
        "dv_sidecars": n_sidecars,
        "max_files_in_partition": max(files_by_part.values(), default=0),
    }
    if stats_staleness is not None:
        summary["stats_staleness"] = stats_staleness
    return {"summary": summary, "actions": actions}


def auto_optimize(
    table: PartitionedWapTable,
    max_files_per_partition: int = 16,
    max_roots: int | None = None,
    keep_last: int = 2,
    n_files: int = 1,
    cluster_by: Sequence[str] | None = None,
    stats_cols: Sequence[str] | None = None,
    vacuum_min_age_seconds: float = 3600.0,
    max_dv_sidecars: int = 4,
    data_rewrite: bool = True,
    zorder: bool = False,
) -> dict:
    """Opt-in maintenance EXECUTOR: run :func:`maintenance_plan` and
    apply what it diagnoses — compact every partition any trigger
    named (one commit covers plan width, small-files creep, and
    deletion-vector accumulation at once), then vacuum if the
    retention trigger fired. This is the one-call cadence SCALE.md's
    DV section promises: on a DV-churned table it rewrites the masked
    partitions clean, drops their vectors from the commit record, and
    with them the masked-read broadcast.

    Thresholds mirror the planner's; compaction params mirror
    :func:`optimize_partitions`. ``data_rewrite=False`` is the CHEAP
    nightly cadence: only metadata/sidecar work runs (vector
    consolidation + vacuum) and data files are never rewritten —
    reserve the full compaction for the slower cadence. Returns
    ``{"plan": <before>, "applied": [...], "after": <re-diagnosis>}``.
    Postcondition, precisely: after a ``data_rewrite=True`` run,
    ``after`` has no ``compact`` or ``compact_vectors`` actions —
    UNLESS the caller pinned ``cluster_by`` while the planner advised
    a different Z-ORDER layout. Advice is adopted only when
    ``cluster_by`` is None (see below); a pinned lexicographic layout
    does not clear multi-column [min,max] overlap, so the z-order
    trigger legitimately re-fires in ``after``. That unadopted advice
    is surfaced as the top-level ``"unadopted_zorder"`` key (the
    advised column list) so a scheduler can alert on it instead of
    re-diffing plans. A ``data_rewrite=False`` run clears only
    ``compact_vectors`` (the masked-partition ``compact`` advice
    deliberately remains until the rewrite cadence runs). The
    ``vacuum`` action is NOT a convergence signal — its trigger
    (version beyond the retention window) is monotone in the version
    counter, so it reappears in every diagnosis of an active table;
    do NOT loop "until the plan is empty", schedule by cadence.
    ``analyze`` advice (stale optimizer statistics) is likewise
    surfaced, not auto-applied — the statistics cadence belongs to
    whoever owns ``collect_table_stats``'s column choices."""
    plan = maintenance_plan(
        table, max_files_per_partition, max_roots, keep_last, max_dv_sidecars
    )
    compact: set[str] = set()
    do_vacuum = False
    do_vectors = False
    advised_zorder: list[str] = []
    for a in plan["actions"]:
        if a["action"] == "compact" and a["partitions"]:
            compact.update(a["partitions"])
            if a.get("zorder") and not advised_zorder:
                advised_zorder = list(a["zorder"])
        elif a["action"] == "compact_vectors":
            do_vectors = True
        elif a["action"] == "vacuum":
            do_vacuum = True
    unadopted_zorder: list[str] = []
    if cluster_by is None and advised_zorder:
        # adopt the planner's z-order advice when the caller didn't
        # pin a layout — the rewrite is happening anyway, clustering
        # it costs only the range exchange it already pays
        cluster_by = advised_zorder
        zorder = True
        if stats_cols is None:
            stats_cols = advised_zorder
    elif advised_zorder and not (zorder and list(cluster_by) == advised_zorder):
        # caller pinned a different layout: honor it, but the overlap
        # trigger will re-fire in the re-diagnosis — surface the
        # advice explicitly rather than leaving a silently-violated
        # empty-after postcondition
        unadopted_zorder = advised_zorder
    applied: list[dict] = []
    if not data_rewrite:
        compact = set()
    if do_vectors and not (compact and data_rewrite):
        # full compaction would clear the masks anyway — consolidate
        # only when data files are NOT being rewritten this run
        v, n = table.compact_vectors()
        applied.append({"action": "compact_vectors", "rows": n, "version": v})
    if compact:
        # spec-evolved tables (round-12): partitions still under an
        # OLD era cannot compact in place — their rows re-derive under
        # the current spec. Route them through the migration rewrite
        # (which compacts as a side effect) and optimize the rest.
        old_era = (
            set(table._live_old_era_keys())
            if hasattr(table, "_live_old_era_keys")
            else set()
        )
        migrate = sorted(compact & old_era)
        if migrate:
            v = table.rewrite_era_partitions(
                partitions=migrate, stats_cols=stats_cols
            )
            applied.append(
                {"action": "rewrite-era", "partitions": migrate, "version": v}
            )
            compact -= set(migrate)
            # the migration TARGETS are freshly-written current-era
            # partitions (often multi-file); fold them into this
            # run's compaction so the empty-after postcondition holds
            # in one pass instead of deferring to the next cadence
            compact |= set(
                table._commit_record(v).get("touched", [])
            ) & set(table.partition_map())
        if compact:
            v = optimize_partitions(
                table,
                partitions=sorted(compact),
                n_files=n_files,
                cluster_by=cluster_by,
                stats_cols=stats_cols,
                zorder=zorder,
            )
            applied.append(
                {
                    "action": "compact",
                    "partitions": sorted(compact),
                    "version": v,
                }
            )
    if do_vacuum:
        removed = table.vacuum(
            keep_last=keep_last, min_age_seconds=vacuum_min_age_seconds
        )
        applied.append({"action": "vacuum", "removed": sorted(removed)})
    after = maintenance_plan(
        table, max_files_per_partition, max_roots, keep_last, max_dv_sidecars
    )
    out = {"plan": plan, "applied": applied, "after": after}
    if unadopted_zorder:
        out["unadopted_zorder"] = unadopted_zorder
    return out
