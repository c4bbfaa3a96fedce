"""Permanent-view SQL, DESCRIBE surface, and WAP view registration —
split out of wap.py in round 13 (pure move, zero behavior change;
wap.py re-exports these at its bottom, so existing
``from etl_reporting_spark.operators.wap import register_wap_view``
paths keep working, and the imports below from wap resolve because
wap imports THIS module only after all its definitions).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from etl_reporting_spark.operators.table_storage import (
    is_external as _is_external,
)
from etl_reporting_spark.operators.wap import (
    PartitionedWapTable,
    WapTable,
    _read_branch_registrations,
    _root_of,
    open_wap_table,
)


def _permanent_view_sql(table: WapTable, version: int | None) -> str:
    """The snapshot's defining SQL for a CATALOG view, when it is
    SQL-expressible: a plain-parquet scan of one location plus CASTs
    restoring the committed schema (hive partition-type inference
    must not drift the view's types from ``table.read()``'s).

    Expressible = a full-snapshot table's single data dir, or a
    partitioned snapshot whose pointers are all dir-granular, carry
    no deletion vectors, live under ONE commit root, and cover that
    root's every leaf (the post-``optimize_partitions`` state —
    otherwise a root scan would resurrect superseded leaves).
    Anything else raises with the localize-first guidance the clone
    layer already uses."""
    from pyspark.sql.types import StructType

    v = version if version is not None else table.current_version()
    rec = table._commit_record(v)
    schema = StructType.fromJson(rec["schema"])
    if "data_dir" in rec:
        location = table.fs.resolve(rec["data_dir"])
    else:
        if rec.get("delete_vectors"):
            raise ValueError(
                f"cannot pin {table.path} v{v} as a permanent view: the "
                "snapshot carries deletion vectors (not expressible as a "
                "plain parquet scan) — compact first "
                "(optimize_partitions applies the vectors)"
            )
        ptrs = list(rec["partitions"].values())
        if any(not isinstance(p, str) for p in ptrs):
            raise ValueError(
                f"cannot pin {table.path} v{v} as a permanent view: the "
                "snapshot references file-granular partition subsets — "
                "compact first (optimize_partitions)"
            )
        if any(_is_external(p) for p in ptrs):
            raise ValueError(
                f"cannot pin {table.path} v{v} as a permanent view: the "
                "snapshot holds clone-external pointers — localize first "
                "(optimize_partitions)"
            )
        roots = {_root_of(p) for p in ptrs}
        if len(roots) != 1:
            raise ValueError(
                f"cannot pin {table.path} v{v} as a permanent view: the "
                f"snapshot spans {len(roots)} commit roots — compact to "
                "one (optimize_partitions) so a single-location scan is "
                "exact"
            )
        root = next(iter(roots))
        referenced = {p.split("/", 1)[1] for p in ptrs if "/" in p}
        on_disk = set(table.fs.leaf_partition_dirs(root))
        if referenced != on_disk:
            raise ValueError(
                f"cannot pin {table.path} v{v} as a permanent view: commit "
                f"root {root} holds leaves outside this snapshot "
                f"({sorted(on_disk - referenced)[:3]}…) — a root scan "
                "would resurrect them; compact this version to a fresh "
                "root first"
            )
        location = table.fs.resolve(root)
    # renamed columns: the view is a PLAIN scan with no coalesce-over-
    # prior-names resolution, so every chained column must exist
    # PHYSICALLY under its current name at this location (true once
    # the rename-era files were rewritten — optimize_partitions). One
    # footer read; partition columns come from paths, not footers.
    chained = set(rec.get("prior_names") or {})
    part_cols = set(rec.get("partition_by") or [])
    need = sorted(
        f.name
        for f in schema.fields
        if f.name in chained and f.name not in part_cols
    )
    if need:
        physical = set(table.spark.read.parquet(location).schema.names)
        stale = [c for c in need if c not in physical]
        if stale:
            raise ValueError(
                f"cannot pin {table.path} v{v} as a permanent view: "
                f"column(s) {stale} were renamed and the files at this "
                "snapshot still carry the OLD physical names — a plain "
                "scan would read them as NULL. Rewrite first "
                "(optimize_partitions) and pin that version."
            )
    # hidden-partitioned tables: the view presents the LOGICAL surface
    # (derived partition columns projected away), matching read().
    # Late import — transforms.py imports this module; Transform owns
    # the derived-name convention, so it is computed in one place.
    hidden: set[str] = set()
    if rec.get("partition_spec"):
        from etl_reporting_spark.operators.transforms import Transform

        hidden = {
            Transform.from_json(d).target
            for d in rec["partition_spec"]
            if d.get("kind") != "identity"
        }
    cols = ", ".join(
        f"CAST(`{f.name}` AS {f.dataType.simpleString()}) AS `{f.name}`"
        for f in schema.fields
        if f.name not in hidden
    )
    return f"SELECT {cols} FROM parquet.`{location}`"


def describe_table(table: WapTable, version: int | None = None) -> dict:
    """One-stop table metadata — the DESCRIBE EXTENDED analogue for a
    WAP table, assembled from the commit record alone (no filesystem
    walk beyond what the record already names, no scan):

    schema (name → type), partitioning (raw ``partition_by`` or the
    hidden-partitioning transform spec when present), CHECK
    constraints, snapshot shape (version / operation / row_count /
    partition count / live commit roots / DV-masked file count),
    optimizer-statistics presence + staleness, and registered clones.
    The reference exposes the same surface as catalog DESCRIBE/SHOW
    statements (connector/snowpark_connector.py:511-566 view and
    table introspection); here it is one metadata read."""
    from pyspark.sql.types import StructType

    v = version if version is not None else table.current_version()
    if v == 0:
        raise FileNotFoundError(f"no committed WAP table at {table.path}")
    rec = table._commit_record(v)
    schema = StructType.fromJson(rec["schema"])
    out: dict = {
        "path": table.path,
        "version": v,
        "operation": rec.get("operation"),
        "row_count": rec.get("row_count"),
        "schema": {f.name: f.dataType.simpleString() for f in schema.fields},
        "constraints": dict(rec.get("constraints", {})),
    }
    if rec.get("partition_spec"):
        out["partitioning"] = {
            "kind": "hidden",
            "spec": list(rec["partition_spec"]),
        }
        hist = rec.get("partition_spec_history")
        if hist and len(hist) > 1:
            # round-12 spec evolution: surface the era count and each
            # era's layout so DESCRIBE explains why old-layout
            # partition keys appear in the map
            out["partitioning"]["eras"] = len(hist)
            out["partitioning"]["spec_history"] = [
                [dict(t) for t in era] for era in hist
            ]
    elif "partitions" in rec:
        out["partitioning"] = {
            "kind": "explicit",
            "partition_by": list(rec.get("partition_by", [])),
        }
    else:
        out["partitioning"] = {"kind": "none"}
    if isinstance(table, PartitionedWapTable):
        out["partitions"] = len(table.partition_map(v))
        out["live_commit_roots"] = len(table.live_commit_roots(v))
    out["dv_masked_files"] = len(rec.get("delete_vectors", {}))
    if rec.get("prior_names"):
        # round-12 RENAME: each current name's chain of prior physical
        # names (files written pre-rename resolve through it)
        out["renamed_columns"] = {
            k: list(v) for k, v in sorted(rec["prior_names"].items())
        }
    tstats = rec.get("table_stats")
    if tstats and "analyzed_version" in tstats:
        staleness = 0
        for between in range(tstats["analyzed_version"] + 1, v + 1):
            op = table._commit_record(between).get("operation", "")
            if op not in ("analyze", "analyze_keys", "add_constraint",
                          "drop_constraint", "alter_schema"):
                staleness += 1
        out["statistics"] = {
            "analyzed_version": tstats["analyzed_version"],
            "columns": sorted(tstats.get("columns", {})),
            "keys": sorted(tstats.get("keys", {})),
            "staleness": staleness,
        }
    clones = table.registered_clones()
    if clones:
        out["clones"] = [
            {"path": c.get("dst_path"), "pins_version": c.get("src_version")}
            for c in clones
        ]
    branches = [
        {"name": b.get("name"), "fork_version": b.get("fork_version")}
        for b in _read_branch_registrations(table)
    ]
    if branches:
        out["branches"] = branches
    return out


def register_wap_view(
    spark: SparkSession,
    path: str,
    name: str,
    version: int | None = None,
    dml: bool = False,
    permanent: bool = False,
    durable: bool = False,
    registry_path: str | None = None,
) -> WapTable:
    """Expose a WAP table's committed snapshot to SQL as a temp view —
    the bridge between the transactional layer and the templated-SQL
    report pipeline (reports query ``name`` like any table; the view
    pins the snapshot resolved NOW, so a mid-report commit cannot
    shear the report across versions — re-register to pick up a newer
    version). Works for both layouts via :func:`open_wap_table`.

    ``dml=True`` additionally registers ``name`` as a target for SQL
    DML text (``MERGE INTO name …`` / ``DELETE FROM name …`` /
    ``UPDATE name …`` via :func:`operators.sql_dml.execute_dml`) —
    the mutation side of the SQL surface, routed onto the merge
    ladder. The reference's upsert surface is built as MERGE SQL text
    (reference connector/snowpark_connector.py:919-1004), so this is
    what a SQL-first pipeline ports onto.

    Round-11 persistence (the reference's views are permanent CATALOG
    objects, connector/snowpark_connector.py:511-566):

    - ``permanent=True`` stores the pinned snapshot as a catalog view
      (``CREATE OR REPLACE VIEW``) instead of a temp view, surviving
      session restart. Requires the snapshot to be expressible as one
      plain-parquet scan — see :func:`_permanent_view_sql`; compact
      first when it is not. The view pins the VERSION resolved now
      (its SQL names this snapshot's physical location), the same
      shear-protection contract as the temp-view form — and that
      location must stay alive: vacuum retention (or a clone-style
      manual pin) has to cover any permanently-pinned version.
    - ``durable=True`` (with ``dml=True``) persists the DML-target
      registration to the JSON registry, so a fresh process can run
      ``execute_dml`` against ``name`` without re-registering (see
      :func:`operators.sql_dml.register_dml_target`)."""
    table = open_wap_table(spark, path)
    if permanent:
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise ValueError(f"invalid permanent view name: {name!r}")
        spark.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            + _permanent_view_sql(table, version)
        )
    else:
        table.read(version=version).createOrReplaceTempView(name)
    if dml:
        from etl_reporting_spark.operators.sql_dml import register_dml_target

        register_dml_target(
            name, table, durable=durable, registry_path=registry_path
        )
    return table
