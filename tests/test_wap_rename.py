"""RENAME COLUMN via name-chain column identity (round-12; closes the
round-11 named refusal "RENAME needs column-id tracking").

The capability Iceberg gets from integer column ids is carried here as
each logical column's NAME HISTORY (``prior_names`` in the commit
record, sticky): the read path resolves a renamed column as COALESCE
over its current name and its prior names, so files written before the
rename serve their old physical name into the new logical column —
zero rewrite, one metadata commit. The reference's configs remap
identifiers freely (reference models/custom_models.py:72-99), so a
ported script's rename must work, not die.

Runs under both storage backends.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.operators.wap import (
    create_partitioned_wap_table,
    open_wap_table,
)

pytestmark = pytest.mark.usefixtures("wap_storage_backend")


def _rows(spark, n=12, amt_name="amt"):
    return spark.createDataFrame(
        [(i, f"seg{i % 3}", float(i)) for i in range(1, n + 1)],
        f"id int, seg string, {amt_name} double",
    )


def _table(spark, tmp_path):
    return create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _rows(spark), ["seg"], stats_cols=["id"]
    )


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    roots = set(t.live_commit_roots())
    v = t.alter_schema(rename={"amt": "amount"})
    assert v == 2
    assert set(t.live_commit_roots()) == roots  # zero data moved
    df = t.read()
    assert df.columns == ["id", "seg", "amount"]
    # pre-rename physical bytes resolve through the chain, not NULL
    assert df.filter("id = 5").first()["amount"] == 5.0
    assert df.filter("amount IS NULL").count() == 0


def test_mixed_era_files_resolve_per_row(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_schema(rename={"amt": "amount"})
    t.append_rows(
        spark.createDataFrame(
            [(99, "seg0", 99.5)], "id int, seg string, amount double"
        )
    )
    rows = {r["id"]: r["amount"] for r in t.read().collect()}
    assert rows[5] == 5.0 and rows[99] == 99.5 and len(rows) == 13
    # time travel shows each snapshot under ITS OWN names
    assert t.read(version=1).columns == ["id", "seg", "amt"]
    assert t.read(version=2).columns == ["id", "seg", "amount"]


def test_rename_survives_reopen_and_dml(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_schema(rename={"amt": "amount"})
    re = open_wap_table(spark, t.path)
    assert re.read().columns == ["id", "seg", "amount"]
    # DV upsert against the renamed schema: matched old-file rows
    # retract, the new version lands — across the physical rename seam
    src = spark.createDataFrame(
        [(5, "seg2", 555.0)], "id int, seg string, amount double"
    )
    _, updated, inserted = re.upsert_rows_dv(src, keys=["id"])
    assert (updated, inserted) == (1, 0)
    got = re.read().filter("id = 5").collect()
    assert len(got) == 1 and got[0]["amount"] == 555.0
    re.delete_rows("amount > 500")
    assert re.read().filter("id = 5").count() == 0


def test_chained_renames_and_undo(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_schema(rename={"amt": "amount"})
    t.alter_schema(rename={"amount": "balance"})
    assert t.read().filter("id = 7").first()["balance"] == 7.0
    rec = t._commit_record(t.current_version())
    assert rec["prior_names"]["balance"] == ["amt", "amount"]
    # undo walks BACK along the column's own chain (allowed)
    t.alter_schema(rename={"balance": "amt"})
    assert t.read().filter("id = 7").first()["amt"] == 7.0


def test_rename_refusals(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="partition column"):
        t.alter_schema(rename={"seg": "segment"})
    with pytest.raises(ValueError, match="unknown column"):
        t.alter_schema(rename={"nope": "x"})
    with pytest.raises(ValueError, match="name exists"):
        t.alter_schema(rename={"amt": "id"})
    t.add_check_constraint("amt_pos", "amt >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.alter_schema(rename={"amt": "amount"})
    t.drop_check_constraint("amt_pos")
    t.alter_schema(rename={"amt": "amount"})
    # a retired name cannot come back as a DIFFERENT column while
    # pre-rename files still hold its physical bytes
    with pytest.raises(ValueError, match="retired"):
        t.alter_schema(add={"amt": "string"})
    with pytest.raises(ValueError, match="separate commits"):
        t.alter_schema(rename={"amount": "bal"}, widen={"amount": "double"})


def test_rename_of_transform_source_refused(spark, tmp_path):
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    df = spark.createDataFrame(
        [(i, dt.date(2026, 1 + (i % 3), 1), float(i)) for i in range(1, 10)],
        "id int, ds date, amt double",
    )
    t = create_hidden_partitioned_wap_table(
        spark, str(tmp_path / "h"), df, ["months(ds)"]
    )
    with pytest.raises(ValueError, match="transform"):
        t.alter_schema(rename={"ds": "event_date"})
    # non-source columns still rename fine on hidden tables
    t.alter_schema(rename={"amt": "amount"})
    assert t.read().filter("id = 3").first()["amount"] == 3.0


def test_rename_rekeys_pruning_stats(spark, tmp_path):
    # amt correlates with the partition (seg0: 1-10, seg1: 11-21,
    # seg2: 22-30) so the recorded [min,max] actually skip
    df = spark.createDataFrame(
        [(i, f"seg{i // 11}", float(i)) for i in range(1, 31)],
        "id int, seg string, amt double",
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), df, ["seg"], stats_cols=["amt"]
    )
    before = t.prune_partitions("amt", lo=25.0)
    assert before == ["seg=seg2"]
    t.alter_schema(rename={"amt": "amount"})
    after = t.prune_partitions("amount", lo=25.0)
    assert after == before  # still prunes, re-keyed through the rename


def test_rename_blocks_plain_scan_surfaces_until_rewrite(spark, tmp_path):
    """A permanent view / symlink manifest is a PLAIN scan with no
    chain resolution — both must refuse while live files carry old
    physical names, and unlock after the rewrite."""
    from etl_reporting_spark.operators.retention import (
        export_snapshot_manifest,
    )
    from etl_reporting_spark.operators.wap import (
        optimize_partitions,
        register_wap_view,
    )

    t = _table(spark, tmp_path)
    t.alter_schema(rename={"amt": "amount"})
    with pytest.raises(ValueError, match="renamed"):
        export_snapshot_manifest(t)
    with pytest.raises(ValueError, match="renamed"):
        register_wap_view(spark, t.path, "renamed_view_gate", permanent=True)
    v = optimize_partitions(t)
    _, files = export_snapshot_manifest(t, version=v)
    got = (
        spark.read.option("basePath", t.fs.absolute_url())
        .parquet(*files)
        .agg(F.sum("amount").alias("s"))
        .first()["s"]
    )
    assert got == sum(range(1, 13))
    register_wap_view(spark, t.path, "renamed_view_gate", permanent=True)
    assert (
        spark.sql("SELECT SUM(amount) s FROM renamed_view_gate").first()["s"]
        == got
    )
    spark.sql("DROP VIEW renamed_view_gate")


def test_rename_as_statement_text(spark, tmp_path):
    from etl_reporting_spark.operators.sql_dml import (
        SqlDmlError,
        execute_ddl,
    )
    from etl_reporting_spark.operators.wap import register_wap_view

    t = _table(spark, tmp_path)
    register_wap_view(spark, t.path, "rename_txt_gate", dml=True)
    out = execute_ddl(
        spark, "ALTER TABLE rename_txt_gate RENAME COLUMN amt TO amount"
    )
    assert out["operation"] == "rename_column"
    # the registered view re-pins: the script's next SELECT sees it
    assert (
        spark.sql(
            "SELECT amount FROM rename_txt_gate WHERE id = 5"
        ).first()["amount"]
        == 5.0
    )
    with pytest.raises(SqlDmlError, match="unsupported ALTER"):
        execute_ddl(spark, "ALTER TABLE rename_txt_gate RENAME TO other")


def test_change_feed_across_rename_is_quiet(spark, tmp_path):
    """A pure rename changes no logical rows: the CDF between the
    pre- and post-rename snapshots must be EMPTY (the old side
    resolves through the name chain), and changes after the rename
    report under the NEW name only."""
    from etl_reporting_spark.operators.wap import table_changes

    t = _table(spark, tmp_path)                      # v1
    t.alter_schema(rename={"amt": "amount"})          # v2
    quiet = table_changes(t, ["id"], from_version=1, to_version=2)
    assert quiet.count() == 0
    src = spark.createDataFrame(
        [(5, "seg2", 555.0), (99, "seg0", 9.0)],
        "id int, seg string, amount double",
    )
    t.upsert_rows_dv(src, keys=["id"])                # v3
    ch = table_changes(t, ["id"], from_version=2, to_version=3)
    assert "amount" in ch.columns and "amt" not in ch.columns
    by_type = {
        (r["id"], r["_change_type"]): r["amount"] for r in ch.collect()
    }
    assert by_type[(99, "insert")] == 9.0
    assert by_type[(5, "update_preimage")] == 5.0
    assert by_type[(5, "update_postimage")] == 555.0
    # and ACROSS the rename boundary: same logical changes, new names
    spanning = table_changes(t, ["id"], from_version=1, to_version=3)
    assert sorted(
        (r["id"], r["_change_type"]) for r in spanning.collect()
    ) == [(5, "update_postimage"), (5, "update_preimage"), (99, "insert")]


def test_maintenance_plan_flags_rename_residue(spark, tmp_path):
    """Round-12: the planner advises compacting partitions that still
    reference pre-rename files (metadata-only: live roots vs the
    roots live at the last rename commit); applying the advice clears
    it AND unlocks the plain-scan surfaces."""
    from etl_reporting_spark.operators.wap import (
        auto_optimize,
        maintenance_plan,
        register_wap_view,
    )

    t = _table(spark, tmp_path)
    t.alter_schema(rename={"amt": "amount"})
    plan = maintenance_plan(t)
    residue = [
        a
        for a in plan["actions"]
        if a["action"] == "compact" and "rename" in a["reason"]
    ]
    assert residue and set(residue[0]["partitions"]) == set(
        t.partition_map()
    )
    out = auto_optimize(t, keep_last=50)
    after = [
        a
        for a in out["after"]["actions"]
        if a["action"] == "compact" and "rename" in a["reason"]
    ]
    assert after == []  # advice cleared by the rewrite
    register_wap_view(spark, t.path, "rename_residue_view", permanent=True)
    assert (
        spark.sql(
            "SELECT SUM(amount) s FROM rename_residue_view"
        ).first()["s"]
        == sum(range(1, 13))
    )
    spark.sql("DROP VIEW rename_residue_view")
