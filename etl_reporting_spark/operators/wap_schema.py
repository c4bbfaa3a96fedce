"""Metadata-only schema evolution for partitioned WAP tables — the
``alter_schema`` family (split out of wap.py in round 13 as a mixin;
pure move, zero behavior change). Mixed into
:class:`~etl_reporting_spark.operators.wap.PartitionedWapTable`; every
``self.`` reference resolves there (commit records, partition_by,
``_publish``), and the behavior contract lives in the method
docstrings, verbatim from wap.py.
"""

from __future__ import annotations

import re
import time
from typing import Sequence

from pyspark.sql import DataFrame


class SchemaEvolutionOps:
    """alter_schema + its dropped-name hazard bookkeeping, as a mixin
    over the partitioned table (see module docstring)."""

    _WIDENINGS: dict[str, tuple[str, ...]] = {
        "byte": ("short", "integer", "long"),
        "short": ("integer", "long"),
        "integer": ("long",),
        "float": ("double",),
    }

    def alter_schema(
        self,
        add: dict[str, str] | None = None,
        drop: Sequence[str] | None = None,
        widen: dict[str, str] | None = None,
        rename: dict[str, str] | None = None,
        base_version: int | None = None,
        record_extra: dict | None = None,
    ) -> int:
        """Metadata-only schema evolution (Delta ALTER TABLE): ADD
        COLUMN (existing data reads NULL for it — the read path
        already NULL-fills columns absent from older files), DROP
        COLUMN (projected away at read; the bytes stay until files
        are naturally rewritten), WIDEN (Iceberg's lossless type
        promotions — byte/short/int → long, float → double, and
        decimal precision growth at fixed scale; the per-root scans
        coerce to the union type and the final committed-schema cast
        does the rest, so no file is touched), and RENAME (round-12;
        closes the round-11 named refusal) — zero data moved, one
        commit.

        ``add`` maps column name → Spark DDL type string
        (``{"note": "string"}``); ``drop`` names existing non-key
        columns; ``rename`` maps old → new name. Partition columns
        cannot be dropped or renamed (the layout IS them — hive dirs
        and the hidden-partitioning spec embed the names).

        RENAME mechanics — name-chain column identity (the capability
        Iceberg gets from integer column ids, carried here as each
        logical column's NAME HISTORY, which is an id in all but
        integer form): the commit records ``prior_names[new] = [...
        old names ...]`` (sticky), and the read path resolves a
        column as COALESCE over its current name and its prior names
        — a file written before the rename serves the old physical
        name into the new logical column, NULL-free, with zero
        rewrite. Refused, each loudly: renaming onto an existing or
        historically-retired name (a retired name re-added as a NEW
        column would make old physical bytes ambiguous between the
        two ids — EXCEPT renaming a column back along its own chain,
        which is safe and un-retires it), renaming a partition /
        transform-source column, and renaming a column a CHECK
        constraint references (drop the constraint first; silent
        expression rewriting is how constraints stop meaning what
        their author wrote). Partition/file [min,max] stats are
        re-keyed to the new name (values unchanged — pruning keeps
        working across the rename).

        Dropped-name hygiene: because DROP is projection-only (no
        Delta-style column-id mapping), surviving pre-drop files still
        PHYSICALLY hold the old values — re-adding the same name would
        silently resurface them instead of reading NULL. Every drop is
        therefore recorded in its commit (``dropped``), and ADD
        refuses a historically-dropped name while ANY file live at
        drop time is still live now; once compaction/merges have
        rewritten those files (e.g. ``optimize_partitions``), the
        name is safe and the ADD goes through.

        The commit carries no ``touched`` set, so it CONFLICTS with
        any concurrent writer (and they with it) — a writer racing a
        schema change wrote with a stale schema; one side retries."""
        from pyspark.sql.types import (
            StructField,
            StructType,
            _parse_datatype_string,
        )

        base = base_version if base_version is not None else self.current_version()
        if base == 0:
            raise FileNotFoundError(f"no committed WAP table at {self.path}")
        base_rec = self._commit_record(base)
        schema = StructType.fromJson(base_rec["schema"])
        names = {f.name for f in schema.fields}
        add = dict(add or {})
        drop = list(drop or [])
        widen = dict(widen or {})
        rename = dict(rename or {})
        overlap = set(rename) & (set(drop) | set(widen) | set(add))
        if overlap:
            raise ValueError(
                f"columns {sorted(overlap)} appear in rename AND another "
                "alteration in one call — split into separate commits so "
                "each step's semantics are unambiguous"
            )
        prior_names: dict[str, list[str]] = {
            k: list(v) for k, v in base_rec.get("prior_names", {}).items()
        }
        retired = {n for chain in prior_names.values() for n in chain}
        for old, new in rename.items():
            if old not in names:
                raise ValueError(f"cannot rename unknown column: {old}")
            if new in names:
                raise ValueError(
                    f"cannot rename {old!r} to {new!r}: the name exists"
                )
            if old in self.partition_by or new in self.partition_by:
                raise ValueError(
                    f"cannot rename partition column {old!r} — hive paths "
                    "and the partition spec embed the name; repartition "
                    "via a full rewrite"
                )
            if any(
                t.get("source") == old
                for era in (
                    base_rec.get("partition_spec_history")
                    or [base_rec.get("partition_spec") or []]
                )
                for t in era
            ):
                raise ValueError(
                    f"cannot rename {old!r}: it is a partition-transform "
                    "source column (derived partition names and era "
                    "attribution embed it)"
                )
            if new in retired and new not in prior_names.get(old, []):
                raise ValueError(
                    f"cannot rename to {new!r}: the name was retired by an "
                    "earlier rename of a DIFFERENT column — live files "
                    "still hold physical bytes under it; pick a fresh name"
                )
            for cname, cexpr in (base_rec.get("constraints") or {}).items():
                if re.search(rf"\b{re.escape(old)}\b", cexpr):
                    raise ValueError(
                        f"cannot rename {old!r}: constraint {cname!r} "
                        f"({cexpr!r}) references it — drop_check_constraint "
                        "first (silently rewriting the expression is how a "
                        "constraint stops meaning what its author wrote)"
                    )
        for c in add:
            if c in retired:
                chain_owner = next(
                    cur for cur, chain in prior_names.items() if c in chain
                )
                raise ValueError(
                    f"cannot add column {c!r}: the name was retired by the "
                    f"rename chain of {chain_owner!r} — live files still "
                    "hold its physical bytes, and a new column under the "
                    "same name would read them as its own; pick a fresh "
                    "name"
                )
        widened: dict[str, object] = {}
        for c, tstr in widen.items():
            if c not in names:
                raise ValueError(f"cannot widen unknown column: {c}")
            if c in self.partition_by:
                raise ValueError(
                    f"cannot widen partition column {c!r} — existing hive "
                    "path values were formatted under the old type"
                )
            cur = next(f.dataType for f in schema.fields if f.name == c)
            new_t = _parse_datatype_string(tstr)
            cur_name, new_name = cur.typeName(), new_t.typeName()
            ok = new_name in self._WIDENINGS.get(cur_name, ())
            if cur_name == "decimal" and new_name == "decimal":
                # precision may grow; scale is pinned (changing scale
                # rescales stored values — not a metadata operation)
                ok = (
                    new_t.scale == cur.scale
                    and new_t.precision >= cur.precision
                )
            if not ok:
                raise ValueError(
                    f"cannot widen {c!r} from {cur.simpleString()} to "
                    f"{new_t.simpleString()} — permitted promotions are "
                    "byte/short/int→long, float→double, and decimal "
                    "precision growth at fixed scale (lossless only; a "
                    "lossy change is a rewrite, not an ALTER)"
                )
            widened[c] = new_t
        for c in add:
            if c in names:
                raise ValueError(f"column already exists: {c}")
            hazard = self._dropped_column_hazard(c, base)
            if hazard:
                raise ValueError(
                    f"column {c!r} was dropped at version {hazard[0]} and "
                    f"{hazard[1]} file(s) written before the drop are still "
                    "live — re-adding the name would resurface their old "
                    "physical values instead of reading NULL. Rewrite them "
                    "first (optimize_partitions) or pick a fresh name."
                )
        for c in drop:
            if c not in names:
                raise ValueError(f"cannot drop unknown column: {c}")
            if c in self.partition_by:
                raise ValueError(
                    f"cannot drop partition column {c!r} — the physical "
                    "layout is keyed on it; repartition via a full rewrite"
                )
        for old, new in rename.items():
            # the new current name leaves its own chain (an undo-rename
            # walks back along it); the old name joins it
            chain = [n for n in prior_names.pop(old, []) if n != new]
            prior_names[new] = chain + [old]
        fields = [
            StructField(
                rename.get(f.name, f.name),
                widened.get(f.name, f.dataType),
                f.nullable,
            )
            for f in schema.fields
            if f.name not in set(drop)
        ]
        new_schema = StructType(fields)
        for c, t in add.items():
            new_schema = new_schema.add(c, _parse_datatype_string(t))
        # a CHECK constraint referencing a dropped column would make
        # every future commit fail at enforcement; resolve each
        # expression against the POST-drop schema (plan-only, no job)
        # and refuse the drop naming the blocking constraint
        if drop:
            from pyspark.sql import functions as F

            post = self.spark.createDataFrame([], new_schema)
            for cname, cexpr in base_rec.get("constraints", {}).items():
                try:
                    post.filter(F.expr(cexpr)).schema
                except Exception:
                    raise ValueError(
                        f"cannot drop {sorted(drop)}: constraint {cname!r} "
                        f"({cexpr!r}) references a dropped column — "
                        "drop_check_constraint first"
                    ) from None

        record = {
            k: v
            for k, v in base_rec.items()
            if k
            in (
                "partitions",
                "files",
                "file_stats",
                "delete_vectors",
                "partition_by",
                "row_count",
            )
        }
        # stats survive only for surviving columns, re-keyed through the
        # rename (the recorded [min,max] describe the same physical
        # values — pruning keeps working across a rename)
        stats = {
            pk: {
                rename.get(c, c): b
                for c, b in cols.items()
                if c not in set(drop)
            }
            for pk, cols in base_rec.get("stats", {}).items()
        }
        stats = {pk: cols for pk, cols in stats.items() if cols}
        if stats:
            record["stats"] = stats
        if rename and record.get("file_stats"):
            record["file_stats"] = {
                f: {rename.get(c, c): b for c, b in cols.items()}
                for f, cols in record["file_stats"].items()
            }
        record.update(
            {
                "version": base + 1,
                "schema": new_schema.jsonValue(),
                "operation": "alter_schema",
                "committed_at": time.time(),
                # the call's own arguments, verbatim — what lets
                # publish_branch RE-EXECUTE a branch-side ALTER against
                # main's diverged tip (re-validating and re-keying stats
                # against the data actually there) instead of refusing
                # (operators/branches.py). Purely additive metadata.
                "alter_args": {
                    "add": add,
                    "drop": list(drop),
                    "widen": widen,
                    "rename": rename,
                },
            }
        )
        if drop:
            record["dropped"] = sorted(drop)
        if prior_names:
            record["prior_names"] = {
                k: v for k, v in sorted(prior_names.items())
            }
        if rename and base_rec.get("table_stats"):
            # ANALYZE statistics re-key like the pruning stats — the
            # values describe the same bytes under the new name
            ts = dict(base_rec["table_stats"])
            if isinstance(ts.get("columns"), dict):
                ts["columns"] = {
                    rename.get(c, c): v for c, v in ts["columns"].items()
                }
            if isinstance(ts.get("keys"), dict):
                ts["keys"] = {
                    rename.get(c, c): v for c, v in ts["keys"].items()
                }
            record["table_stats"] = ts
        # provenance keys from the caller (publish_branch marks its
        # metadata replays so a crashed publish re-runs idempotently)
        record.update(record_extra or {})
        self._publish(record)
        return base + 1

    def _live_files(self, version: int) -> set[str]:
        """File-level pointer set of a snapshot (dir pointers expanded
        by listing). A dir already vacuumed lists as empty — its files
        are physically gone, so they cannot resurface anything."""
        files: set[str] = set()
        for pk in self.partition_map(version):
            try:
                files.update(self.partition_files(pk, version=version))
            except OSError:
                continue
        return files

    def _dropped_column_hazard(
        self, name: str, base: int
    ) -> tuple[int, int] | None:
        """If ``name`` was historically dropped AND any file live at
        the drop commit is still live at ``base``, return
        (drop_version, surviving_file_count) — the resurfacing hazard
        ``alter_schema`` refuses on. None = safe. Scans the commit log
        (metadata-only; alter is rare) for ``dropped`` markers; the
        file-survival check is what lets a name come back once normal
        compaction has rewritten the pre-drop bytes."""
        lname = name.lower()
        drop_versions = [
            v
            for v in range(1, base + 1)
            if lname
            in {d.lower() for d in self._commit_record(v).get("dropped", [])}
        ]
        if not drop_versions:
            return None
        v_drop = max(drop_versions)
        surviving = self._live_files(v_drop) & self._live_files(base)
        if surviving:
            return (v_drop, len(surviving))
        return None
