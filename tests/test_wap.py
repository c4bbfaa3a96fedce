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

# every test in this module runs twice: once on the POSIX data
# plane (LocalFSStorage) and once on object-store semantics
# (BlobStorage + conditional-PUT commit log) — see conftest
pytestmark = pytest.mark.usefixtures("wap_storage_backend")

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
    # a YOUNG orphan is protected by the retention horizon (it could
    # be a concurrent writer mid-commit) ...
    assert t.vacuum(keep_last=2) == []
    # ... and cleared once the horizon is waived (single-writer admin)
    removed = t.vacuum(keep_last=2, min_age_seconds=0)
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


# --------------------------------------------------- streaming WAP sink

def test_streaming_wap_upsert_e2e(spark, tmp_path):
    """File stream → per-epoch transactional MERGE into a WAP table.
    maxFilesPerTrigger=1 forces multiple epochs; every published
    snapshot is a fully-applied micro-batch, the final state equals
    the batch-computed expectation, and a replayed epoch is a no-op."""
    from etl_reporting_spark.streaming.cdc_stream import (
        read_event_stream,
        streaming_wap_upsert,
    )

    src = tmp_path / "landing"
    src.mkdir()
    # epoch files: id 1 updated twice across batches; id 3 arrives late
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "id long, name string, seq long"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, "a2", 2), (3, "c", 1)], "id long, name string, seq long"
    ).coalesce(1).write.parquet(str(src / "f2"))

    table_path = str(tmp_path / "serving")
    create_wap_table(
        spark,
        table_path,
        spark.createDataFrame([(0, "seed", 0)], "id long, name string, seq long"),
    )

    stream = read_event_stream(
        spark, str(src / "*"), "id long, name string, seq long",
        max_files_per_trigger=1,
    )
    q = streaming_wap_upsert(
        stream, table_path, ["id"], str(tmp_path / "ckpt"), order_cols=["seq"]
    )
    q.awaitTermination(120)

    t = WapTable(spark, table_path)
    state = {r["id"]: (r["name"], r["seq"]) for r in t.read().collect()}
    assert state == {0: ("seed", 0), 1: ("a2", 2), 2: ("b", 1), 3: ("c", 1)}
    # one commit per epoch (+ the create), each tagged with its epoch id
    records = t.history()
    assert [r["operation"] for r in records[:1]] == ["create"]
    epochs = [r["epoch_id"] for r in records[1:]]
    assert epochs == sorted(epochs) and len(epochs) >= 1
    version_after = t.current_version()

    # replayed epoch (crash between publish and checkpoint advance):
    # re-running the same upsert with an already-committed epoch id
    # must publish nothing
    from etl_reporting_spark.operators.merge import merge_upsert_wap  # noqa: F401
    from etl_reporting_spark.streaming import cdc_stream as cs

    replay = spark.createDataFrame(
        [(1, "a999", 99)], "id long, name string, seq long"
    )
    # build the same closure the sink uses and call it directly
    last_epoch = max(epochs)
    captured = []

    def fake_foreach(stream, ckpt, upsert):
        captured.append(upsert)
        class _Q:
            def awaitTermination(self, *_): return True
        return _Q()

    orig = cs.foreach_batch_upsert
    cs.foreach_batch_upsert = fake_foreach
    try:
        streaming_wap_upsert(stream, table_path, ["id"], "unused")
    finally:
        cs.foreach_batch_upsert = orig
    captured[0](replay, last_epoch)  # replay of an applied epoch
    assert t.current_version() == version_after
    assert {r["id"]: r["name"] for r in t.read().collect()}[1] == "a2"
    captured[0](replay, last_epoch + 1)  # genuinely new epoch applies
    assert t.current_version() == version_after + 1
    assert {r["id"]: r["name"] for r in t.read().collect()}[1] == "a999"


def test_register_wap_view_pins_snapshot(spark, tmp_path, target_df, source_df):
    """SQL reports read the committed snapshot through a temp view;
    a commit AFTER registration doesn't shear the running report —
    re-registering picks up the new version."""
    from etl_reporting_spark.operators.wap import register_wap_view

    t = _table(spark, tmp_path, target_df)
    register_wap_view(spark, t.path, "serving_v")
    assert spark.sql("SELECT COUNT(*) AS n FROM serving_v").collect()[0]["n"] == 3
    t.commit(source_df, operation="merge")
    # the view still resolves the version pinned at registration
    assert spark.sql("SELECT COUNT(*) AS n FROM serving_v").collect()[0]["n"] == 3
    register_wap_view(spark, t.path, "serving_v")
    ids = {r["id"] for r in spark.sql("SELECT id FROM serving_v").collect()}
    assert ids == {1, 2, 4}
    spark.catalog.dropTempView("serving_v")


def test_threaded_writers_race_exactly_one_winner(spark, tmp_path, target_df):
    """Two real threads race the SAME version's publish; the os.link
    CAS admits exactly one. (The earlier sequential test pins the
    protocol; this one pins it under actual concurrency.)"""
    import threading

    t = _table(spark, tmp_path, target_df)
    base = t.current_version()
    results: dict[str, object] = {}
    barrier = threading.Barrier(2)

    def writer(tag: str, df) -> None:
        try:
            barrier.wait(timeout=30)
            results[tag] = t.commit(df, base_version=base, operation=f"merge {tag}")
        except ConcurrentWriteError as e:
            results[tag] = e

    th_a = threading.Thread(target=writer, args=("A", target_df.filter("id != 1")))
    th_b = threading.Thread(target=writer, args=("B", target_df.filter("id != 2")))
    th_a.start(); th_b.start()
    th_a.join(120); th_b.join(120)

    wins = [tag for tag, r in results.items() if r == 2]
    losses = [tag for tag, r in results.items() if isinstance(r, ConcurrentWriteError)]
    assert len(wins) == 1 and len(losses) == 1, results
    assert t.current_version() == 2
    # the committed state is exactly the winner's, never a blend
    ids = sorted(r["id"] for r in t.read().collect())
    assert ids == ([2, 3] if wins[0] == "A" else [1, 3])


def test_wap_merge_bootstraps_fresh_table(spark, tmp_path, source_df):
    """MERGE into a path with no table: every source row inserts and
    the first commit creates the log (streaming on a fresh serving
    path needs no separate create step)."""
    path = str(tmp_path / "fresh")
    res = merge_upsert(
        None, source_df, ["id"], backend="wap", spark=spark, target_table=path
    )
    assert res.version == 1
    assert (res.rows_inserted, res.rows_updated, res.rows_deleted) == (3, 0, 0)
    t = WapTable(spark, path)
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 4]
    assert [h["operation"] for h in t.history()] == ["merge"]


def test_vacuum_clears_stale_tmp_records(spark, tmp_path, target_df):
    """Round-5 advice: a writer hard-killed between writing
    .tmp-*.json and linking it leaves a temp record the
    finally-unlink never removes; vacuum clears those past the
    retention horizon, but protects young ones (a live writer may be
    about to link)."""
    t = _table(spark, tmp_path, target_df)
    # the temp-debris lifecycle is specific to the POSIX commit store;
    # pin it so the blob-backend param still exercises this path
    from etl_reporting_spark.operators.wap import LocalFSCommitStore

    t.store = LocalFSCommitStore(os.path.join(t.path, "_wap"))
    wap = os.path.join(t.path, "_wap")
    stale = os.path.join(wap, ".tmp-deadbeef.json")
    with open(stale, "w") as fh:
        fh.write('{"version": 2, "data_dir": "v00002-dead"}')
    # young: protected by the default horizon
    assert t.vacuum(keep_last=2) == []
    assert os.path.exists(stale)
    # horizon waived: cleared, and reported with its _wap/ prefix
    removed = t.vacuum(keep_last=2, min_age_seconds=0)
    assert os.path.join("_wap", ".tmp-deadbeef.json") in removed
    assert not os.path.exists(stale)
    # published commit records are never touched
    assert t.current_version() == 1 and t.read().count() == 3
