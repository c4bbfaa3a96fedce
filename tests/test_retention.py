"""purge_rows (mask → rewrite → erase → VERIFY) and snapshot manifest
export. Both storage backends.

The verification step is the contract under test: a purge must PROVE
the bytes are gone from surviving physical files (raw scan, deletion
vectors not applied), not assume it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.operators.retention import (
    PurgeVerificationError,
    export_snapshot_manifest,
    purge_rows,
)
from etl_reporting_spark.operators.wap import (
    CloneRetentionWarning,
    clone_table,
    create_partitioned_wap_table,
    create_wap_table,
    optimize_partitions,
)

pytestmark = pytest.mark.usefixtures("wap_storage_backend")


def _users(spark, n=300):
    return spark.range(1, n + 1).select(
        F.col("id").cast("int").alias("uid"),
        (F.col("id") % 3).cast("int").alias("region"),
        F.concat(F.lit("user_"), F.col("id")).alias("email"),
        (F.col("id") * 1.5).alias("spend"),
    )


def test_purge_masks_rewrites_and_verifies(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    report = purge_rows(t, "uid % 10 = 3")
    assert report.rows_purged == 30
    assert report.verified
    assert not report.history_erased  # not asked for
    assert t.read().filter("uid % 10 = 3").count() == 0
    assert t.read().count() == 270
    # surviving physical files of the rewrite hold no masked bytes:
    # the report's residual scan proved it (residual_rows == 0), and
    # the current snapshot carries no deletion vectors at all
    rec = t._commit_record(t.current_version())
    assert not rec.get("delete_vectors")


def test_purge_without_erase_history_keeps_time_travel(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    report = purge_rows(t, "uid <= 10")
    # pre-delete snapshot still resolves — history not yet erased
    old = t.read(version=report.delete_version - 1)
    assert old.filter("uid <= 10").count() == 10


def test_purge_erase_history_removes_old_files(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    report = purge_rows(t, "uid <= 10", erase_history=True)
    assert report.history_erased
    assert report.files_removed  # pre-delete files physically gone
    assert report.verified
    # the purged data is unreachable through ANY surviving snapshot:
    # old versions' data dirs were vacuumed
    with pytest.raises(Exception):
        t.read(version=1).filter("uid <= 10").count()


def test_purge_no_match_is_a_cheap_noop(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    v = t.current_version()
    report = purge_rows(t, "uid = -1")
    assert report.rows_purged == 0
    assert report.delete_version is None
    assert t.current_version() == v  # nothing committed


def test_purge_respects_live_clones(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "src"), _users(spark), ["region"]
    )
    clone_table(spark, str(tmp_path / "src"), str(tmp_path / "clone"))
    with pytest.warns(CloneRetentionWarning):
        report = purge_rows(
            t, "uid <= 10", erase_history=True, min_age_seconds=0.0
        )
    # current readers still see the purge; history files the clone
    # pins were retained (loudly), so erasure is not yet total
    assert t.read().filter("uid <= 10").count() == 0


def test_purge_on_unpartitioned_table_refuses(spark, tmp_path):
    t = create_wap_table(spark, str(tmp_path / "t"), _users(spark))
    with pytest.raises(TypeError, match="partitioned"):
        purge_rows(t, "uid <= 10")


# ------------------------------------------------------------ manifest
def test_manifest_lists_every_live_file_and_no_others(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    key, files = export_snapshot_manifest(t)
    assert files
    # the manifest IS the snapshot: reading exactly those files
    # reproduces table.read()
    back = spark.read.option("basePath", t.fs.absolute_url()).parquet(*files)
    assert back.count() == t.read().count() == 300
    stored = t.fs.read_key(key).decode().strip().split("\n")
    assert stored == files


def test_manifest_refuses_dv_masked_snapshots(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    t.delete_rows("uid <= 5")
    with pytest.raises(ValueError, match="resurrect"):
        export_snapshot_manifest(t)
    # compaction clears the masks; the rewritten version exports
    v = optimize_partitions(t)
    key, files = export_snapshot_manifest(t, version=v)
    back = spark.read.option("basePath", t.fs.absolute_url()).parquet(*files)
    assert back.count() == 295


def test_manifest_pins_a_version(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    key1, files1 = export_snapshot_manifest(t, version=1)
    # a later full rewrite does not disturb the exported v1 manifest
    t.commit_partitions(_users(spark, n=100), operation="overwrite")
    assert t.fs.read_key(key1).decode().strip().split("\n") == files1


def test_manifest_unpartitioned_table(spark, tmp_path):
    t = create_wap_table(spark, str(tmp_path / "t"), _users(spark))
    key, files = export_snapshot_manifest(t)
    back = spark.read.parquet(*files)
    assert back.count() == 300


def test_manifest_is_consumable_by_duckdb(
    spark, tmp_path, wap_storage_backend
):
    """The interop claim, proven against a REAL external engine:
    DuckDB reads the manifest's file list directly (no commit
    protocol) and reproduces the snapshot's aggregate exactly.
    localfs only — the blob backend's objects are reachable through
    the storage seam, not as plain files an external engine opens."""
    if wap_storage_backend != "localfs":
        pytest.skip("external engines read plain files, not the blob seam")
    import duckdb

    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _users(spark), ["region"]
    )
    _, files = export_snapshot_manifest(t)
    con = duckdb.connect()
    n, total = con.execute(
        "SELECT COUNT(*), SUM(spend) FROM read_parquet(?)", [files]
    ).fetchone()
    sp = t.read().agg(
        F.count("*").alias("n"), F.sum("spend").alias("s")
    ).first()
    assert n == sp["n"] == 300
    assert abs(total - sp["s"]) < 1e-6
    # hive partition values survive too (region comes from the path)
    by_region = dict(
        con.execute(
            "SELECT region, COUNT(*) FROM read_parquet(?, "
            "hive_partitioning = true) GROUP BY region", [files]
        ).fetchall()
    )
    sp_by = {
        int(r["region"]): r["n"]
        for r in t.read().groupBy("region").agg(F.count("*").alias("n")).collect()
    }
    assert {int(k): v for k, v in by_region.items()} == sp_by


def test_purge_on_hidden_partitioned_table(spark, tmp_path):
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    rows = [
        (i, dt.date(2026, 1 + (i % 3), 2), f"user_{i}") for i in range(1, 31)
    ]
    t = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(rows, "uid int, ds date, email string"),
        ["months(ds)"],
    )
    report = purge_rows(t, "uid % 5 = 0", erase_history=True)
    assert report.rows_purged == 6 and report.verified
    assert t.read().filter("uid % 5 = 0").count() == 0
    # layout intact: spec survived, pruning still works
    assert t.prune("ds", eq=dt.date(2026, 2, 2)) == ["_p_ds_months=2026-02"]


def test_purge_on_spec_evolved_table(spark, tmp_path):
    """Round-12: a compliance purge whose predicate hits OLD-era rows
    must still physically erase them — the rewrite step migrates the
    touched old-era partitions (rewrite_era_partitions) and verifies
    against the migration TARGETS, not the vanished old keys."""
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    rows = [
        (i, dt.date(2026, 1, 1 + i), f"u{i % 3}", float(i))
        for i in range(1, 9)
    ]
    t = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "evo"),
        spark.createDataFrame(rows, "id int, ds date, user string, amt double"),
        ["days(ds)"],
    )
    t.evolve_partition_spec(["months(ds)"])
    t.append_rows(
        spark.createDataFrame(
            [(100, dt.date(2026, 2, 2), "u0", 100.0)],
            "id int, ds date, user string, amt double",
        )
    )
    report = purge_rows(t, "user = 'u1'", min_age_seconds=0.0)
    assert report.rows_purged > 0 and report.residual_rows == 0
    assert t.read().filter("user = 'u1'").count() == 0
    # the touched old-era partitions migrated; untouched ones remain
    left = t.read().count()
    assert left == 9 - report.rows_purged
