"""Write-audit-publish commits: the executed ACID MERGE path
(round-4 verdict #4).

What must hold:
- a reader NEVER sees partial state — simulated writer crash at every
  protocol step leaves the previous snapshot intact and readable;
- two writers racing from the same base version produce exactly one
  winner; the loser gets ConcurrentWriteError and succeeds on retry
  from the new snapshot;
- a failed audit publishes nothing and leaves no visible garbage;
- merge_upsert(backend="wap") commits the same rows the join backend
  computes, with the same metrics.
"""

from __future__ import annotations

import json
import os

import pytest

from etl_reporting_spark.operators.merge import merge_upsert
from etl_reporting_spark.operators.wap import (
    AuditError,
    ConcurrentWriteError,
    WapTable,
    create_wap_table,
)


@pytest.fixture()
def target_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, amount double",
    )


@pytest.fixture()
def source_df(spark):
    # updates id 1, inserts id 4; id 3 is target-only (delete branch)
    return spark.createDataFrame(
        [(1, "a2", 11.0), (2, "b", 20.0), (4, "d", 40.0)],
        "id long, name string, amount double",
    )


def _table(spark, tmp_path, target_df) -> WapTable:
    return create_wap_table(spark, str(tmp_path / "t"), target_df)


def test_create_read_version_history(spark, tmp_path, target_df):
    t = _table(spark, tmp_path, target_df)
    assert t.current_version() == 1
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    v2 = t.commit(target_df.filter("id != 2"), operation="overwrite")
    assert v2 == 2
    assert sorted(r["id"] for r in t.read().collect()) == [1, 3]
    # time travel
    assert sorted(r["id"] for r in t.read(version=1).collect()) == [1, 2, 3]
    assert [h["operation"] for h in t.history()] == ["create", "overwrite"]


def test_wap_merge_matches_join_backend(spark, tmp_path, target_df, source_df):
    t = _table(spark, tmp_path, target_df)
    res = merge_upsert(
        target_df,
        source_df,
        ["id"],
        delete_not_matched_by_source=True,
        backend="join",
    )
    expected_rows = sorted(map(tuple, res.df.collect()))

    wres = merge_upsert(
        None,  # ignored: the table handle is authoritative
        source_df,
        ["id"],
        delete_not_matched_by_source=True,
        backend="wap",
        spark=spark,
        target_table=t.path,
    )
    assert wres.version == 2
    assert (wres.rows_updated, wres.rows_inserted, wres.rows_deleted) == (
        res.rows_updated,
        res.rows_inserted,
        res.rows_deleted,
    )
    committed = sorted(map(tuple, t.read().collect()))
    assert committed == expected_rows
    res.unpersist()


def test_crash_before_publish_is_invisible(spark, tmp_path, target_df, source_df, monkeypatch):
    """Kill the writer after WRITE and AUDIT but before PUBLISH: the
    data dir exists on disk, yet readers still resolve version 1."""
    t = _table(spark, tmp_path, target_df)

    boom = RuntimeError("writer crashed before publish")

    def crash(record):
        raise boom

    monkeypatch.setattr(t, "_publish", crash)
    with pytest.raises(RuntimeError, match="crashed before publish"):
        t.commit(source_df, operation="merge")
    monkeypatch.undo()

    assert t.current_version() == 1
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    # the orphan snapshot dir from the crashed writer is on disk...
    orphans = [d for d in os.listdir(t.path) if d.startswith("v00002")]
    assert orphans
    # ...and a retry (new writer) publishes fine despite it
    assert t.commit(source_df, operation="merge") == 2
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 4]
    # vacuum clears the orphan
    removed = t.vacuum(keep_last=2)
    assert any(d in removed for d in orphans)


def test_torn_tmp_record_is_invisible(spark, tmp_path, target_df):
    """A half-written temp commit record (writer died mid-json) is
    never resolved by readers."""
    t = _table(spark, tmp_path, target_df)
    with open(os.path.join(t.path, "_wap", ".tmp-dead.json"), "w") as fh:
        fh.write('{"version": 99, "data_dir": "nope')  # torn JSON
    assert t.current_version() == 1
    assert t.read().count() == 3


def test_concurrent_writers_one_winner(spark, tmp_path, target_df, source_df):
    t = _table(spark, tmp_path, target_df)
    base = t.current_version()
    # both writers prepare from the same base version; A publishes first
    assert t.commit(source_df, base_version=base, operation="merge A") == 2
    with pytest.raises(ConcurrentWriteError):
        t.commit(target_df, base_version=base, operation="merge B")
    # loser's snapshot dir was cleaned up; the log has exactly A
    assert [h["operation"] for h in t.history()] == ["create", "merge A"]
    # retry from the NEW base succeeds
    assert t.commit(target_df, operation="merge B retry") == 3


def test_failed_audit_publishes_nothing(spark, tmp_path, target_df):
    t = _table(spark, tmp_path, target_df)
    with pytest.raises(AuditError, match="expected 99"):
        t.commit(target_df, expected_rows=99)

    def no_nulls(df):
        raise AuditError("names must not be null")

    with pytest.raises(AuditError, match="names"):
        t.commit(target_df, audits=[no_nulls])
    assert t.current_version() == 1
    # aborted snapshots were deleted, not orphaned
    assert [d for d in os.listdir(t.path) if d.startswith("v00002")] == []


def test_commit_record_is_complete_json(spark, tmp_path, target_df):
    """Published records are fully-formed (written+fsynced before
    link), carry the schema, and row_count matches the data."""
    t = _table(spark, tmp_path, target_df)
    rec = json.load(open(os.path.join(t.path, "_wap", "commit-00001.json")))
    assert rec["row_count"] == 3
    names = [f["name"] for f in rec["schema"]["fields"]]
    assert names == ["id", "name", "amount"]
