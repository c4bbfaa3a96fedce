"""Deletion vectors (round-7, beyond the round brief): row-level
DELETE with ZERO data files rewritten — the Delta refinement one step
past file-granular commits.

What must hold:
- delete_rows masks rows via (file, parquet row index) sidecars; the
  data files on disk are byte-identical before/after (asserted);
- every read path applies the vectors: snapshot, time travel,
  read_files, the change feed, and the merge target (no resurrection);
- vectors are CUMULATIVE across delete commits and DROP when their
  file is rewritten (file-granular merge) or its partition replaced
  (compaction applies the mask permanently);
- conflicts: a DV commit touches the files it masks — concurrent
  writers to disjoint files both land (rebase), a rewrite of a masked
  file vs a new DV on it gets one winner;
- vacuum keeps referenced sidecar roots and removes stale ones.
"""

from __future__ import annotations

import os
import threading

import pytest

# every test in this module runs twice: once on the POSIX data
# plane (LocalFSStorage) and once on object-store semantics
# (BlobStorage + conditional-PUT commit log) — see conftest
pytestmark = pytest.mark.usefixtures("wap_storage_backend")
from pyspark.sql import functions as F

from etl_reporting_spark.operators.merge import merge_partition_files
from etl_reporting_spark.operators.wap import (
    ConcurrentWriteError,
    PartitionedWapTable,
    create_partitioned_wap_table,
    optimize_partitions,
    table_changes,
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


def _mtimes(table):
    out = {}
    for k in table.partition_map(1):
        for f in table.partition_files(k, version=1):
            p = os.path.join(table.path, f)
            out[f] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def test_delete_masks_without_rewriting_any_file(spark, dtable):
    before = _mtimes(dtable)
    v, n = dtable.delete_rows("id % 10 = 3 AND ds = '2026-01-01'")
    assert (v, n) == (2, 10)
    assert _mtimes(dtable) == before  # zero bytes of data touched
    assert dtable.partition_files(DAY1) == dtable.partition_files(DAY1, version=1)
    out = dtable.read()
    assert out.count() == 110
    assert out.filter("id = 3").count() == 0
    # time travel still sees the full v1
    assert dtable.read(version=1).count() == 120
    # pruned reads mask too
    assert dtable.read(partitions=[DAY1]).count() == 90
    assert dtable.read_files(dtable.partition_files(DAY1)).count() == 90


def test_deletes_accumulate_and_noop_publishes_nothing(spark, dtable):
    dtable.delete_rows("id = 3")
    v2, n2 = dtable.delete_rows(F.col("id") == 7)
    assert (v2, n2) == (3, 1)
    assert dtable.read().count() == 118
    v3, n3 = dtable.delete_rows("id = 99999")
    assert (v3, n3) == (3, 0)  # no-op: no commit published
    assert dtable.current_version() == 3


def test_change_feed_emits_exactly_the_deleted_rows(spark, dtable):
    v, _ = dtable.delete_rows("id % 10 = 3 AND ds = '2026-01-01'")
    ch = table_changes(dtable, keys=["id"], from_version=1, to_version=v)
    got = sorted((r["_change_type"], r["id"]) for r in ch.collect())
    assert got == [("delete", i) for i in range(3, 101, 10)]
    # and the diff planned only the masked files, not the partition
    planned = {
        os.path.relpath(p.replace("file:", ""), dtable.path)
        for p in ch.inputFiles()
        if "_dv" not in p
    }
    masked = set(dtable._commit_record(v)["delete_vectors"])
    assert planned == masked  # CDC plans exactly the masked files
    # a NARROW delete masks one file, and its diff plans one file
    v2, _ = dtable.delete_rows("id = 50")
    ch2 = table_changes(dtable, keys=["id"], from_version=v, to_version=v2)
    planned2 = {
        os.path.relpath(p.replace("file:", ""), dtable.path)
        for p in ch2.inputFiles()
        if "_dv" not in p
    }
    assert len(planned2) == 1
    assert sorted((r["_change_type"], r["id"]) for r in ch2.collect()) == [
        ("delete", 50)
    ]


def test_merge_after_delete_does_not_resurrect(spark, dtable):
    dtable.delete_rows("id = 3")
    src = spark.createDataFrame(
        [(5, "2026-01-01", 500.0)], "id long, ds string, amount double"
    )
    merge_partition_files(
        spark, dtable.path, DAY1, src, keys=["id"], stats_col="id"
    )
    out = dtable.read()
    assert out.filter("id = 3").count() == 0
    assert out.filter("id = 5").collect()[0]["amount"] == 500.0
    # the rewritten file's vector entry dropped; others kept if any
    rec = dtable._commit_record(dtable.current_version())
    for f in rec.get("delete_vectors", {}):
        assert f in set(dtable.partition_files(DAY1)) | set(
            dtable.partition_files(DAY2)
        )


def test_compaction_applies_vectors_permanently(spark, dtable):
    dtable.delete_rows("id % 10 = 3")
    v = optimize_partitions(dtable)
    rec = dtable._commit_record(v)
    assert "delete_vectors" not in rec or not rec["delete_vectors"]
    assert dtable.read().count() == 108
    # and the old masked version is still time-travelable
    assert dtable.read(version=1).count() == 120


def test_disjoint_dv_writers_both_land(spark, dtable):
    """Two deletes masking DIFFERENT files of the same partition
    rebase past each other."""
    lo = dtable.files_intersecting(DAY1, "id", 5, 5)
    hi = dtable.files_intersecting(DAY1, "id", 95, 95)
    assert set(lo).isdisjoint(hi)

    def run(key):
        dtable.delete_rows(f"id = {key}")

    ts = [threading.Thread(target=run, args=(k,)) for k in (5, 95)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert dtable.current_version() == 3
    out = dtable.read()
    assert out.filter("id in (5, 95)").count() == 0
    assert out.count() == 118


def test_dv_conflicts_with_rewrite_of_masked_file(spark, dtable):
    """One winner when a DV and a file rewrite race on the same file."""
    target = dtable.files_intersecting(DAY1, "id", 5, 5)
    sub = dtable.read_files(target)
    results = []

    def rewrite():
        try:
            dtable.commit_partition_files(
                sub.withColumn("amount", F.col("amount") + 1),
                DAY1,
                replace_files=target,
                base_version=1,
            )
            results.append("rewrite")
        except ConcurrentWriteError:
            results.append("conflict")

    def delete():
        try:
            dtable.delete_rows("id = 5", base_version=1)
            results.append("delete")
        except ConcurrentWriteError:
            results.append("conflict")

    ts = [threading.Thread(target=rewrite), threading.Thread(target=delete)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) in (["conflict", "delete"], ["conflict", "rewrite"])
    assert dtable.current_version() == 2


def test_vacuum_keeps_live_sidecars_and_removes_stale(spark, dtable):
    v, _ = dtable.delete_rows("id = 3")
    dv_root_1 = next(
        iter(dtable._commit_record(v)["delete_vectors"].values())
    ).split("/", 1)[0]
    # a second delete re-points id=3's file to a NEW cumulative sidecar
    v2, _ = dtable.delete_rows("id = 13")
    dv_root_2 = next(
        iter(dtable._commit_record(v2)["delete_vectors"].values())
    ).split("/", 1)[0]
    assert dv_root_1 != dv_root_2
    removed = dtable.vacuum(keep_last=1, min_age_seconds=0.0)
    assert dv_root_1 in removed  # stale sidecar root gone
    assert os.path.isdir(os.path.join(dtable.path, dv_root_2))  # live kept
    assert dtable.read().count() == 118  # mask intact post-vacuum


def test_delete_scoped_to_partitions_prunes_silently(spark, dtable):
    """The pruned-DML contract: rows outside the named partitions are
    kept even when they match the predicate."""
    v, n = dtable.delete_rows("id > 90", partitions=[DAY1])
    assert n == 10  # ids 91..100 live in day 1; 101..120 untouched
    out = dtable.read()
    assert out.filter("id > 100").count() == 20
    assert out.filter("id BETWEEN 91 AND 100").count() == 0


def test_maintenance_plan_diagnoses_and_clears(spark, tmp_path):
    """The planner is metadata-only, fires on width/small-files/DV
    triggers, and APPLYING it empties the next diagnosis (minus the
    retention reminder, which is version-driven)."""
    from etl_reporting_spark.operators.wap import maintenance_plan

    df = spark.createDataFrame(
        [(1, "2026-01-01", 1.0)], "id long, ds string, amount double"
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "m"), df, ["ds"])
    t.max_read_roots = 3
    for i in range(2, 7):  # 5 more single-day commits -> 6 roots
        day = spark.createDataFrame(
            [(i, f"2026-01-{i:02d}", float(i))], "id long, ds string, amount double"
        )
        t.commit_partitions(day)
    t.delete_rows("id = 2")
    plan = maintenance_plan(t, max_files_per_partition=16)
    kinds = {a["reason"].split(":")[0] for a in plan["actions"]}
    assert plan["summary"]["live_roots"] > 3
    assert plan["summary"]["masked_files"] == 1
    assert any(a["action"] == "compact" and "live commit roots" in a["reason"]
               for a in plan["actions"])
    assert any("deletion vectors" in a["reason"] for a in plan["actions"])
    assert any(a["action"] == "vacuum" for a in plan["actions"])

    optimize_partitions(t)
    t.vacuum(keep_last=1, min_age_seconds=0.0)
    after = maintenance_plan(t, max_files_per_partition=16, keep_last=99)
    assert after["actions"] == []
    assert after["summary"]["live_roots"] == 1
    assert after["summary"]["masked_files"] == 0
    assert t.read().count() == 5  # content preserved (id=2 deleted)


def test_upsert_dv_masks_and_appends_atomically(spark, dtable):
    """Minimal-write MERGE: matched old rows are vectored, new
    versions appended — existing files byte-identical, one commit,
    CDC shows retract+insert together."""
    before = _mtimes(dtable)
    src = spark.createDataFrame(
        [(5, "2026-01-01", 555.0), (777, "2026-01-01", 7.0)],
        "id long, ds string, amount double",
    )
    v, upd, ins = dtable.upsert_rows_dv(src, keys=["id"], stats_cols=["id"])
    assert (upd, ins) == (1, 1)
    alive = {
        f: m for f, m in _mtimes(dtable).items() if f in before
    }
    assert alive == before  # zero existing bytes touched
    out = dtable.read()
    assert out.count() == 121
    assert out.filter("id = 5").collect()[0]["amount"] == 555.0
    assert dtable.read(version=1).filter("id = 5").collect()[0]["amount"] == 5.0
    ch = table_changes(dtable, keys=["id"], from_version=1, to_version=v)
    assert sorted((r["_change_type"], r["id"]) for r in ch.collect()) == [
        ("insert", 777),
        ("update_postimage", 5),
        ("update_preimage", 5),
    ]
    # per-file stats cover the appended file: point lookup stays O(1)
    assert len(dtable.files_intersecting(DAY1, "id", 777, 777)) == 1


def test_upsert_dv_repeated_updates_keep_one_visible_version(spark, dtable):
    src = lambda a: spark.createDataFrame(  # noqa: E731
        [(5, "2026-01-01", a)], "id long, ds string, amount double"
    )
    dtable.upsert_rows_dv(src(100.0), keys=["id"])
    dtable.upsert_rows_dv(src(200.0), keys=["id"])
    v, upd, ins = dtable.upsert_rows_dv(src(300.0), keys=["id"])
    assert (upd, ins) == (1, 0)
    vis = dtable.read().filter("id = 5").collect()
    assert len(vis) == 1 and vis[0]["amount"] == 300.0
    assert dtable.read().count() == 120


def test_upsert_dv_conflicts_with_rewrite_of_matched_file(spark, dtable):
    target = dtable.files_intersecting(DAY1, "id", 5, 5)
    sub = dtable.read_files(target)
    results = []

    def rewrite():
        try:
            dtable.commit_partition_files(
                sub.withColumn("amount", F.col("amount") + 1),
                DAY1, replace_files=target, base_version=1,
            )
            results.append("rewrite")
        except ConcurrentWriteError:
            results.append("conflict")

    def upsert():
        try:
            dtable.upsert_rows_dv(
                spark.createDataFrame(
                    [(5, "2026-01-01", 9.0)], "id long, ds string, amount double"
                ),
                keys=["id"], base_version=1,
            )
            results.append("upsert")
        except ConcurrentWriteError:
            results.append("conflict")

    ts = [threading.Thread(target=rewrite), threading.Thread(target=upsert)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert "conflict" in results and len(results) == 2
    assert dtable.current_version() == 2


def test_streaming_upsert_dv_e2e(spark, tmp_path):
    """Minimal-write streaming CDC: per-epoch atomic DV+append
    commits, latest-per-key state, zero pre-existing files rewritten
    across the whole run, epoch ids recorded for replay idempotence."""
    from etl_reporting_spark.streaming.cdc_stream import (
        read_event_stream,
        streaming_upsert_dv,
    )

    src = tmp_path / "landing"
    src.mkdir()
    spark.createDataFrame(
        [(1, "2026-01-01", 1, 10.0), (2, "2026-01-02", 1, 20.0)],
        "id long, ds string, seq long, v double",
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, "2026-01-01", 2, 11.0), (3, "2026-01-01", 1, 30.0)],
        "id long, ds string, seq long, v double",
    ).coalesce(1).write.parquet(str(src / "f2"))

    path = str(tmp_path / "serving")
    t = create_partitioned_wap_table(
        spark, path,
        spark.createDataFrame(
            [(0, "2025-12-31", 0, 0.0)], "id long, ds string, seq long, v double"
        ),
        ["ds"],
    )
    seed_files = {
        f: os.path.getmtime(os.path.join(path, f))
        for k in t.partition_map()
        for f in t.partition_files(k)
    }
    stream = read_event_stream(
        spark, str(src / "*"), "id long, ds string, seq long, v double",
        max_files_per_trigger=1,
    )
    q = streaming_upsert_dv(
        stream, path, ["id"], ["ds"], str(tmp_path / "ckpt"),
        order_cols=["seq"],
    )
    q.awaitTermination(120)

    state = {r["id"]: (r["seq"], r["v"]) for r in t.read().collect()}
    assert state == {0: (0, 0.0), 1: (2, 11.0), 2: (1, 20.0), 3: (1, 30.0)}
    # the seed's files were never rewritten — epochs only appended
    # files and masked rows
    for f, m in seed_files.items():
        assert os.path.getmtime(os.path.join(path, f)) == m
    for rec in t.history()[1:]:
        assert rec["epoch_id"] is not None
        assert rec["operation"] == "merge"


def test_delete_by_key_set(spark, dtable):
    """GDPR-shaped erasure: every row whose key is in a key DataFrame
    is vectored in one commit; the key set joins, never an IN-list."""
    subjects = spark.createDataFrame(
        [(3,), (7,), (105,), (99999,)], "id long"
    )
    v, n = dtable.delete_rows(keys_df=subjects, keys=["id"])
    assert n == 3  # 99999 never existed
    out = dtable.read()
    assert out.filter("id in (3, 7, 105)").count() == 0
    assert out.count() == 117
    with pytest.raises(ValueError, match="exactly one"):
        dtable.delete_rows("id = 1", keys_df=subjects, keys=["id"])
    with pytest.raises(ValueError, match="requires keys"):
        dtable.delete_rows(keys_df=subjects)


def test_shallow_clone_zero_copy_and_cow(spark, tmp_path, dtable):
    """Zero-copy clone: metadata-only creation, source DVs keep
    masking (the row key anchors at the d-* root, not the table
    path), copy-on-write mutations never touch the source, and
    row-granular ops demand localization first."""
    from etl_reporting_spark.operators.wap import clone_table

    dtable.delete_rows("id = 7")
    src_bytes = {
        f: os.path.getmtime(os.path.join(dtable.path, f))
        for k in dtable.partition_map()
        for f in dtable.partition_files(k)
    }
    dev = clone_table(spark, dtable.path, str(tmp_path / "dev"))
    clone_size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(dev.path)
        for f in fs
    )
    assert clone_size < 64 * 1024  # one JSON record, no data
    assert dev.read().count() == 119
    assert dev.read().filter("id = 7").count() == 0  # DV carried

    # CoW: replace a partition in the clone; the source is untouched
    day = spark.createDataFrame(
        [(999, "2026-01-02", 9.0)], "id long, ds string, amount double"
    )
    dev.commit_partitions(day)
    assert dev.read(partitions=[DAY2]).count() == 1
    assert dtable.read().count() == 119
    for f, m in src_bytes.items():
        assert os.path.getmtime(os.path.join(dtable.path, f)) == m

    # row-granular mutation of shared files refuses with guidance,
    # and localizing via compaction unlocks it
    with pytest.raises(ValueError, match="localize first"):
        dev.delete_rows("id = 5")
    optimize_partitions(dev, partitions=[DAY1])
    v, n = dev.delete_rows("id = 5")
    assert n == 1
    assert dtable.read().filter("id = 5").count() == 1  # source intact


def test_clone_time_travel_pins_the_cloned_version(spark, tmp_path, dtable):
    from etl_reporting_spark.operators.wap import clone_table

    v1_count = dtable.read(version=1).count()
    dtable.delete_rows("id % 2 = 0")
    dev = clone_table(spark, dtable.path, str(tmp_path / "v1"), version=1)
    assert dev.read().count() == v1_count  # pinned to the OLD version
    rec = dev._commit_record(1)
    assert rec["cloned_from"]["version"] == 1


@pytest.mark.parametrize("seed", [7, 41])
def test_model_random_operation_interleavings(spark, tmp_path, seed):
    """Model-based check of the whole mutation surface: a seeded
    random sequence of DV upserts, predicate/key-set deletes,
    file-granular merges, compactions and vacuums is mirrored into a
    plain python dict model; after EVERY operation the table's
    visible state must equal the model exactly. Any cross-operator
    interaction bug (mask lost by a rewrite, stale pointer, stats
    skip gone wrong, vacuum eating live data) surfaces as a diff."""
    import random

    rng = random.Random(seed)
    days = ["2026-01-01", "2026-01-02", "2026-01-03"]
    ds_of = lambda i: days[i % 3]  # noqa: E731 — partition-stable key
    model = {i: float(i) for i in range(1, 61)}
    df = spark.createDataFrame(
        [(i, ds_of(i), v) for i, v in model.items()],
        "id long, ds string, amount double",
    ).repartitionByRange(3, "id")
    t = create_partitioned_wap_table(
        spark, str(tmp_path / f"m{seed}"), df, ["ds"], stats_cols=["id"]
    )

    def check(tag):
        got = {r["id"]: r["amount"] for r in t.read().collect()}
        assert got == model, f"after {tag}: {sorted(set(got) ^ set(model))[:6]}"

    next_id = 100
    for step in range(12):
        # step 5 always clones, so EVERY (seed, backend) param
        # exercises the external-pointer/CoW path at least once;
        # random draws can add more
        op = "clone_check" if step == 5 else rng.choice(
            ["upsert", "delete_pred", "delete_keys", "fmerge",
             "optimize", "vacuum", "compact_vectors", "clone_check"])
        if op == "upsert":
            n_upd = rng.randint(0, 3)
            upd = rng.sample(sorted(model), min(n_upd, len(model)))
            ins = [next_id + j for j in range(rng.randint(0, 2))]
            next_id += 5
            rows = [(i, ds_of(i), float(1000 * step + i)) for i in upd + ins]
            if not rows:
                continue
            src = spark.createDataFrame(rows, "id long, ds string, amount double")
            t.upsert_rows_dv(src, keys=["id"], stats_cols=["id"])
            for i, _, v in rows:
                model[i] = v
        elif op == "delete_pred":
            m = rng.randint(2, 9)
            t.delete_rows(f"id % {m} = 1")
            model = {i: v for i, v in model.items() if i % m != 1}
        elif op == "delete_keys":
            victims = rng.sample(sorted(model), min(3, len(model)))
            kdf = spark.createDataFrame([(i,) for i in victims], "id long")
            t.delete_rows(keys_df=kdf, keys=["id"])
            for i in victims:
                model.pop(i, None)
        elif op == "fmerge" and model:
            i = rng.choice(sorted(model))
            src = spark.createDataFrame(
                [(i, ds_of(i), float(-i))], "id long, ds string, amount double"
            )
            from etl_reporting_spark.operators.merge import (
                merge_partition_files as mpf,
            )
            mpf(spark, t.path, f"ds={ds_of(i)}", src, keys=["id"], stats_col="id")
            model[i] = float(-i)
        elif op == "optimize":
            optimize_partitions(t, n_files=2, cluster_by=["id"])
        elif op == "vacuum":
            t.vacuum(keep_last=2, min_age_seconds=0.0)
        elif op == "compact_vectors":
            # round-8: sidecar consolidation is metadata/sidecar-only
            # — the model is untouched by construction, so any drift
            # it ever causes (e.g. a mask row lost to a key-form
            # mismatch) is exactly what check() catches
            t.compact_vectors()
        elif op == "clone_check":
            # round-9: shallow clone at a random mid-history point —
            # the storage seam's hardest paths in one op: the clone's
            # EXTERNAL pointers (reads + dir listings resolve into
            # the source's storage), DV inheritance through absolute
            # keys, copy-on-write localization via optimize, and
            # mutation isolation (the clone's delete must not touch
            # the source). Runs under BOTH storage backends via the
            # module's wap_storage_backend parameterization.
            from etl_reporting_spark.operators.wap import clone_table

            c = clone_table(spark, t.path, str(tmp_path / f"c{step}"))
            got_c = {r["id"]: r["amount"] for r in c.read().collect()}
            assert got_c == model, f"clone@{step} shared-pointer read"
            optimize_partitions(c, n_files=1)  # localize (CoW)
            got_c = {r["id"]: r["amount"] for r in c.read().collect()}
            assert got_c == model, f"clone@{step} post-localize read"
            if model:
                victim = rng.choice(sorted(model))
                c.delete_rows(keys_df=spark.createDataFrame(
                    [(victim,)], "id long"), keys=["id"])
                got_c = {r["id"]: r["amount"] for r in c.read().collect()}
                assert victim not in got_c and len(got_c) == len(model) - 1
            # the SOURCE must be byte-identically unaffected — that is
            # what check() below asserts for this step
        check(f"step {step}: {op}")
    # final deep check: CDC replay over the RETAINED window (vacuum
    # keep_last=2 legitimately collects older versions — time travel
    # past the horizon is supposed to fail, so replay from current-1)
    from etl_reporting_spark.operators.wap import table_changes

    cur = t.current_version()
    if cur > 1:
        base_v = cur - 1
        replayed = {r["id"]: r["amount"] for r in t.read(version=base_v).collect()}
        for r in table_changes(t, keys=["id"], from_version=base_v).collect():
            if r["_change_type"] in ("insert", "update_postimage"):
                replayed[r["id"]] = r["amount"]
            elif r["_change_type"] == "delete":
                replayed.pop(r["id"], None)
        assert replayed == model


def test_dv_read_plans_broadcast_anti_join_no_shuffle(spark, dtable):
    """The mask must stay on the scan: a DV read plans a broadcast
    anti hash join against the sidecar and ZERO shuffle exchanges —
    a lost broadcast here would re-shuffle the whole fact per read."""
    dtable.delete_rows("id = 5")
    df = dtable.read()
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan


# -------------------------------------------------- DV UPDATE (round-12)
def _upd_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"seg{i % 3}", float(i)) for i in range(1, 13)],
        "id int, seg string, amt double",
    )
    return create_partitioned_wap_table(
        spark, str(tmp_path / "u"), df, ["seg"], stats_cols=["id"]
    )


def test_update_dv_masks_and_appends_without_rewrite(spark, tmp_path):
    t = _upd_table(spark, tmp_path)
    files_before = {
        pk: t.partition_files(pk) for pk in t.partition_map()
    }
    v, n = t.update_rows_dv("id IN (5, 8)", {"amt": "amt + 100"})
    assert n == 2
    got = {r["id"]: r["amt"] for r in t.read().collect()}
    assert got[5] == 105.0 and got[8] == 108.0 and len(got) == 12
    # every pre-update file survives untouched (mask + append only)
    for pk, files in files_before.items():
        assert set(files) <= set(t.partition_files(pk, version=v))
    # time travel: the old snapshot still shows the old values
    old = {r["id"]: r["amt"] for r in t.read(version=1).collect()}
    assert old[5] == 5.0 and old[8] == 8.0


def test_update_dv_rhs_sees_pre_update_row(spark, tmp_path):
    """Standard UPDATE semantics: every RHS evaluates over the OLD
    row, even when one assigned column references another."""
    t = _upd_table(spark, tmp_path)
    _, n = t.update_rows_dv(
        "id = 7", {"amt": "id * 10.0", "id": "id + 1000"}
    )
    assert n == 1
    row = t.read().filter("id = 1007").first()
    assert row["amt"] == 70.0  # id*10 of the PRE-update id
    assert t.read().filter("id = 7").count() == 0


def test_update_dv_moves_rows_across_partitions(spark, tmp_path):
    t = _upd_table(spark, tmp_path)
    v, n = t.update_rows_dv("id = 4", {"seg": "'seg0'"})
    assert n == 1
    got = t.read().filter("id = 4").collect()
    assert len(got) == 1 and got[0]["seg"] == "seg0"
    # the retract masked a file in the OLD partition; the append
    # landed in the NEW one — both are in the commit's touched set
    rec = t._commit_record(v)
    assert "seg=seg1" in rec["touched"] and "seg=seg0" in rec["touched"]


def test_update_dv_composes_with_deletes_and_cdf(spark, tmp_path):
    t = _upd_table(spark, tmp_path)                      # v1
    t.delete_rows("id = 2")                               # v2
    v3, _ = t.update_rows_dv("id = 5", {"amt": "500.0"})  # v3 same files
    # cumulative vectors: the delete survives the update's re-mask
    got = {r["id"]: r["amt"] for r in t.read().collect()}
    assert 2 not in got and got[5] == 500.0 and len(got) == 11
    # the change feed reads the update as retract+insert on the key
    ch = table_changes(t, ["id"], from_version=2, to_version=v3)
    types = {
        (r["id"], r["_change_type"]): r["amt"] for r in ch.collect()
    }
    assert types[(5, "update_preimage")] == 5.0
    assert types[(5, "update_postimage")] == 500.0
    assert len(types) == 2


def test_update_dv_constraint_gate(spark, tmp_path):
    t = _upd_table(spark, tmp_path)
    t.add_check_constraint("amt_pos", "amt >= 0")
    before = t.current_version()
    with pytest.raises(Exception, match="amt_pos"):
        t.update_rows_dv("id = 3", {"amt": "-1.0"})
    assert t.current_version() == before  # nothing published
    assert t.read().filter("id = 3").first()["amt"] == 3.0


def test_update_dv_noop_and_unknown_column(spark, tmp_path):
    t = _upd_table(spark, tmp_path)
    assert t.update_rows_dv("id = 999", {"amt": "0.0"}) == (1, 0)
    with pytest.raises(ValueError, match="unknown column"):
        t.update_rows_dv("id = 1", {"nope": "1"})


def test_update_dv_concurrent_disjoint_rebases(spark, tmp_path):
    """An update racing a disjoint-file writer rebases; racing a
    rewrite of the SAME masked file conflicts."""
    t = _upd_table(spark, tmp_path)
    base = t.current_version()
    # a disjoint commit lands first (new partition, new files)
    t.append_rows(
        spark.createDataFrame(
            [(99, "segX", 9.0)], "id int, seg string, amt double"
        )
    )
    v, n = t.update_rows_dv("id = 5", {"amt": "1.0"}, base_version=base)
    assert n == 1 and v == t.current_version()
    assert t.read().filter("id = 5").first()["amt"] == 1.0
    assert t.read().filter("id = 99").count() == 1
