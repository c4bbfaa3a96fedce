"""Join IVM (operators/incremental.py): increment == recompute under
append-only deltas; gate ivm_join_maintenance carries the full-
recompute oracle."""

from __future__ import annotations

import pytest

from etl_reporting_spark.operators.incremental import (
    ivm_agg_delta,
    ivm_agg_refresh,
    ivm_join_refresh,
    join_insert_delta,
)


def _frames(spark):
    a_old = spark.createDataFrame(
        [(1, "a1"), (2, "a2")], "k long, av string"
    )
    delta_a = spark.createDataFrame(
        [(2, "a2x"), (3, "a3")], "k long, av string"
    )
    b_old = spark.createDataFrame(
        [(1, "b1"), (3, "b3")], "k long, bv string"
    )
    delta_b = spark.createDataFrame(
        [(2, "b2"), (3, "b3x")], "k long, bv string"
    )
    return a_old, delta_a, b_old, delta_b


def test_refresh_equals_full_recompute(spark):
    a_old, da, b_old, db = _frames(spark)
    full = (
        a_old.unionByName(da)
        .join(b_old.unionByName(db), "k")
        .collect()
    )
    old_join = a_old.join(b_old, "k")
    refreshed = ivm_join_refresh(old_join, a_old, da, b_old, db, "k").collect()
    assert sorted(map(tuple, refreshed)) == sorted(map(tuple, full))


def test_empty_deltas_are_noops(spark):
    a_old, _, b_old, _ = _frames(spark)
    empty_a = a_old.limit(0)
    empty_b = b_old.limit(0)
    old_join = a_old.join(b_old, "k")
    assert join_insert_delta(a_old, empty_a, b_old, empty_b, "k").count() == 0
    refreshed = ivm_join_refresh(
        old_join, a_old, empty_a, b_old, empty_b, "k"
    ).collect()
    assert sorted(map(tuple, refreshed)) == sorted(map(tuple, old_join.collect()))


def test_delta_work_covers_all_three_terms(spark):
    """Drop any one term and the result is wrong — pin each term's
    contribution: ΔA⋈B (3,a3 × 3,b3), A⋈ΔB (2,a2 × 2,b2), ΔA⋈ΔB
    (2,a2x × 2,b2 and 3,a3 × 3,b3x)."""
    a_old, da, b_old, db = _frames(spark)
    delta = join_insert_delta(a_old, da, b_old, db, "k")
    rows = sorted(map(tuple, delta.collect()))
    assert (3, "a3", "b3") in rows          # ΔA ⋈ B_old
    assert (2, "a2", "b2") in rows          # A_old ⋈ ΔB
    assert (2, "a2x", "b2") in rows         # ΔA ⋈ ΔB
    assert (3, "a3", "b3x") in rows         # ΔA ⋈ ΔB
    assert len(rows) == 4


def test_outer_join_refused_with_guidance(spark):
    a_old, da, b_old, db = _frames(spark)
    with pytest.raises(ValueError, match="retraction"):
        join_insert_delta(a_old, da, b_old, db, "k", how="left")


class TestAggRetraction:
    """Signed-counting aggregate IVM: the retraction half
    (ivm_agg_retraction gate carries the from-scratch oracle)."""

    def test_retraction_equals_recompute(self, spark):
        from pyspark.sql import functions as F

        rows = spark.createDataFrame(
            [("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 7.0)],
            "g string, v double",
        )
        state = ivm_agg_delta(
            rows.withColumn("__w", F.lit(1)), ["g"], ["v"]
        )
        # retract (a, 20), insert (a, 99) — i.e. update; insert (c, 1)
        delta = spark.createDataFrame(
            [("a", 20.0, -1), ("a", 99.0, 1), ("c", 1.0, 1)],
            "g string, v double, __w int",
        )
        out = {
            r["g"]: (r["__cnt"], r["sum_v"])
            for r in ivm_agg_refresh(state, delta, ["g"], ["v"]).collect()
        }
        assert out == {"a": (2, 109.0), "b": (2, 12.0), "c": (1, 1.0)}

    def test_fully_retracted_group_disappears(self, spark):
        from pyspark.sql import functions as F

        rows = spark.createDataFrame([("a", 3.0)], "g string, v double")
        state = ivm_agg_delta(rows.withColumn("__w", F.lit(1)), ["g"], ["v"])
        delta = spark.createDataFrame(
            [("a", 3.0, -1)], "g string, v double, __w int"
        )
        assert ivm_agg_refresh(state, delta, ["g"], ["v"]).count() == 0


def test_streaming_ivm_agg_e2e(spark, tmp_path):
    """Streaming materialized aggregate: signed deltas arrive over a
    file stream in multiple epochs; the WAP-committed state must equal
    the batch recompute over the effective final set, every commit is
    epoch-tagged, and a replayed epoch is a no-op."""
    from etl_reporting_spark.operators.wap import WapTable
    from etl_reporting_spark.streaming.cdc_stream import (
        read_event_stream,
        streaming_ivm_agg,
    )

    src = tmp_path / "landing"
    src.mkdir()
    schema = "g string, v double, __w int"
    # epoch 1: inserts
    spark.createDataFrame(
        [("a", 10.0, 1), ("a", 20.0, 1), ("b", 5.0, 1)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    # epoch 2: update (a,20)->(a,99); fully retract b; insert c
    spark.createDataFrame(
        [("a", 20.0, -1), ("a", 99.0, 1), ("b", 5.0, -1), ("c", 1.0, 1)],
        schema,
    ).coalesce(1).write.parquet(str(src / "f2"))

    path = str(tmp_path / "state")
    q = streaming_ivm_agg(
        read_event_stream(spark, str(src / "*"), schema, max_files_per_trigger=1),
        path, ["g"], ["v"], str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    t = WapTable(spark, path)
    state = {r["g"]: (r["__cnt"], r["sum_v"]) for r in t.read().collect()}
    assert state == {"a": (2, 109.0), "c": (1, 1.0)}  # b fully retracted
    records = t.history()
    assert records[0]["operation"] == "ivm-init"
    assert all(r["operation"] == "ivm-refresh" for r in records[1:])
    epochs = [r["epoch_id"] for r in records]
    assert epochs == sorted(epochs)
    version_after = t.current_version()

    # replay: drive the closure directly with an already-applied epoch
    from etl_reporting_spark.streaming import cdc_stream as cs

    captured = []

    def fake_foreach(stream, ckpt, refresh):
        captured.append(refresh)
        class _Q:
            def awaitTermination(self, *_):
                return True
        return _Q()

    orig = cs.foreach_batch_upsert
    cs.foreach_batch_upsert = fake_foreach
    try:
        streaming_ivm_agg(
            read_event_stream(spark, str(src / "*"), schema),
            path, ["g"], ["v"], "unused",
        )
    finally:
        cs.foreach_batch_upsert = orig
    replay = spark.createDataFrame([("a", 1000.0, 1)], schema)
    captured[0](replay, max(epochs))       # replayed epoch: no-op
    assert t.current_version() == version_after
    captured[0](replay, max(epochs) + 1)   # new epoch applies
    assert t.read().filter("g = 'a'").collect()[0]["sum_v"] == 1109.0


# ------------------------------------------------ round-7: bucketed state

def _exchanges_above_scan(plan: str) -> int:
    """Count Exchange nodes in an executed-plan string (AQE prints
    final plans; shuffle reuse still prints the node)."""
    import re
    return len(re.findall(r"\bExchange hashpartitioning", plan))


def test_bucketed_agg_state_merge_is_exchange_free_on_state(spark):
    """Verdict #7: standing IVM state written bucketed on the group
    keys merges with a delta through ivm_agg_refresh_bucketed with
    ZERO post-read shuffles on the state side — the only hash
    exchange in the plan belongs to the delta's partial aggregate.
    The non-bucketed twin shows the extra state exchange, proving the
    assertion is a live tripwire, not vacuously true."""
    from etl_reporting_spark.operators.incremental import (
        ivm_agg_delta,
        ivm_agg_refresh,
        ivm_agg_refresh_bucketed,
    )
    from etl_reporting_spark.operators.skew import write_bucketed

    base = spark.createDataFrame(
        [(f"g{i % 7}", float(i), 1) for i in range(200)],
        "g string, v double, __w int",
    )
    state = ivm_agg_delta(base, ["g"], ["v"])
    spark.sql("DROP TABLE IF EXISTS ivm_state_b")
    write_bucketed(state, "ivm_state_b", ["g"], num_buckets=4)
    state_b = spark.table("ivm_state_b")

    delta = spark.createDataFrame(
        [("g1", 5.0, 1), ("g2", 3.0, -1), ("g9", 7.0, 1)],
        "g string, v double, __w int",
    )
    merged = ivm_agg_refresh_bucketed(state_b, delta, ["g"], ["v"])
    merged.count()
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # exactly one hash exchange: the delta partial agg + its join
    # alignment to the 4-bucket layout; the 200-group state side scans
    # straight into the merge join
    n_bucketed = _exchanges_above_scan(plan)

    unbucketed = ivm_agg_refresh_bucketed(state, delta, ["g"], ["v"])
    unbucketed.count()
    plan_u = unbucketed._jdf.queryExecution().executedPlan().toString()
    assert _exchanges_above_scan(plan_u) > n_bucketed  # tripwire works
    assert n_bucketed <= 2  # delta partials (+ alignment); state: none
    assert "bucketed: true" in plan.lower() or "Bucketed: true" in plan

    # and the result equals the union-form refresh
    expect = {
        (r["g"], r["__cnt"], r["sum_v"])
        for r in ivm_agg_refresh(state, delta, ["g"], ["v"]).collect()
    }
    got = {(r["g"], r["__cnt"], r["sum_v"]) for r in merged.collect()}
    assert got == expect
    spark.sql("DROP TABLE ivm_state_b")


def test_bucketed_join_state_probe_is_exchange_free_on_state(spark):
    """The join twin: standing sides written bucketed on the join key
    are probed by broadcast delta terms with zero state-side
    exchanges — the ivm_join_refresh delta terms cost |delta| work."""
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.incremental import join_insert_delta
    from etl_reporting_spark.operators.skew import write_bucketed

    a = spark.createDataFrame(
        [(i % 50, f"a{i}") for i in range(300)], "k int, av string"
    )
    b = spark.createDataFrame(
        [(i, f"b{i}") for i in range(50)], "k int, bv string"
    )
    for name, df in (("ivm_a_b", a), ("ivm_b_b", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed(df, name, ["k"], num_buckets=4)
    a_b, b_b = spark.table("ivm_a_b"), spark.table("ivm_b_b")
    da = spark.createDataFrame([(1, "anew")], "k int, av string")
    db = spark.createDataFrame([(2, "bnew")], "k int, bv string")
    delta = join_insert_delta(
        a_b, F.broadcast(da), b_b, F.broadcast(db), on="k"
    )
    delta.count()
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert _exchanges_above_scan(plan) == 0  # broadcast probes only
    got = {(r["k"], r["av"], r["bv"]) for r in delta.collect()}
    full = a.unionByName(da).join(b.unionByName(db), "k")
    old = a.join(b, "k")
    expect = {
        (r["k"], r["av"], r["bv"]) for r in full.collect()
    } - {(r["k"], r["av"], r["bv"]) for r in old.collect()}
    assert expect <= got  # delta covers exactly the gained rows
    spark.sql("DROP TABLE ivm_a_b")
    spark.sql("DROP TABLE ivm_b_b")


def test_materialized_view_maintained_off_the_change_feed(spark, tmp_path):
    """End-to-end composition: a WAP fact absorbs an upsert, a
    deletion-vector DELETE, and a DV-merge; after each commit,
    maintain_aggregate_view refreshes a standing per-day SUM from the
    CHANGE FEED only, and the state must equal a from-scratch
    recompute of the same source version every time. The cursor rides
    the view's commit record, so a repeated refresh is a no-op."""
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.incremental import maintain_aggregate_view
    from etl_reporting_spark.operators.wap import (
        WapTable,
        create_partitioned_wap_table,
    )

    rows = [(i, f"2026-01-0{1 + i % 2}", float(i)) for i in range(1, 21)]
    fact = create_partitioned_wap_table(
        spark,
        str(tmp_path / "fact"),
        spark.createDataFrame(rows, "id long, ds string, amount double")
        .repartitionByRange(2, "id"),
        ["ds"],
        stats_cols=["id"],
    )
    view_path = str(tmp_path / "view")

    def check():
        v = maintain_aggregate_view(
            fact, view_path, keys=["id"], group_cols=["ds"], sum_cols=["amount"]
        )
        got = {
            r["ds"]: (r["__cnt"], r["sum_amount"])
            for r in WapTable(spark, view_path).read().collect()
        }
        truth = {
            r["ds"]: (r["n"], r["s"])
            for r in fact.read()
            .groupBy("ds")
            .agg(F.count("*").alias("n"), F.sum("amount").alias("s"))
            .collect()
        }
        assert got == truth
        return v

    assert check() is not None           # bootstrap from the snapshot
    assert maintain_aggregate_view(      # source unmoved -> no-op
        fact, view_path, ["id"], ["ds"], ["amount"]
    ) is None

    fact.upsert_rows_dv(
        spark.createDataFrame(
            [(5, "2026-01-02", 500.0), (99, "2026-01-01", 9.0)],
            "id long, ds string, amount double",
        ),
        keys=["id"],
    )
    assert check() is not None           # update + insert via the feed

    fact.delete_rows("id % 7 = 0")
    assert check() is not None           # DV deletes via the feed

    from etl_reporting_spark.operators.merge import merge_partition_files
    merge_partition_files(
        spark, fact.path, "ds=2026-01-01",
        spark.createDataFrame(
            [(1, "2026-01-01", 1000.0)], "id long, ds string, amount double"
        ),
        keys=["id"], stats_col="id",
    )
    assert check() is not None           # file-granular rewrite via the feed


def test_stream_maintain_aggregate_view_micro_batches(spark, tmp_path):
    """Round-9: the change feed as an AvailableNow-style incremental
    stream. Four source commits drained at max_versions_per_batch=1
    must produce one view commit per micro-batch (bootstrap + three
    CDF ranges), the final streamed state must equal BOTH a
    from-scratch recompute and a one-shot maintain_aggregate_view of
    the same source (rebuild equivalence), and re-driving the stream
    replays nothing (the cursor rides the view's own commit —
    exactly-once without external checkpoints)."""
    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.incremental import (
        maintain_aggregate_view,
    )
    from etl_reporting_spark.operators.wap import (
        WapTable,
        create_partitioned_wap_table,
    )
    from etl_reporting_spark.streaming.cdc_stream import (
        stream_maintain_aggregate_view,
    )

    rows = [(i, f"2026-02-0{1 + i % 3}", float(i)) for i in range(1, 31)]
    fact = create_partitioned_wap_table(
        spark,
        str(tmp_path / "fact"),
        spark.createDataFrame(rows, "id long, ds string, amount double"),
        ["ds"],
    )
    fact.delete_rows("id % 4 = 0")                       # v2: DV delete
    fact.upsert_rows_dv(                                 # v3: DV merge
        spark.createDataFrame(
            [(3, "2026-02-01", 300.0), (77, "2026-02-02", 7.0)],
            "id long, ds string, amount double",
        ),
        keys=["id"],
    )
    fact.delete_rows("id % 9 = 0")                       # v4: DV delete

    applied = stream_maintain_aggregate_view(
        fact, str(tmp_path / "view"), ["id"], ["ds"], ["amount"],
        max_versions_per_batch=1,
    )
    assert applied == [1, 2, 3, 4]  # one view commit per source version

    view = WapTable(spark, str(tmp_path / "view"))
    streamed = {
        r["ds"]: (r["__cnt"], r["sum_amount"])
        for r in view.read().collect()
    }
    truth = {
        r["ds"]: (r["n"], r["s"])
        for r in fact.read()
        .groupBy("ds")
        .agg(F.count("*").alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    assert streamed == truth

    # rebuild equivalence: a one-shot refresh over the whole range
    # lands on the identical state
    maintain_aggregate_view(
        fact, str(tmp_path / "view_oneshot"), ["id"], ["ds"], ["amount"]
    )
    oneshot = {
        r["ds"]: (r["__cnt"], r["sum_amount"])
        for r in WapTable(spark, str(tmp_path / "view_oneshot"))
        .read()
        .collect()
    }
    assert streamed == oneshot

    # exactly-once: re-driving an already-drained stream is a no-op
    assert stream_maintain_aggregate_view(
        fact, str(tmp_path / "view"), ["id"], ["ds"], ["amount"]
    ) == []
    assert view.current_version() == 4

    # crash-resume: wind a FRESH view halfway (2 versions per batch,
    # stop after one batch by bounding with to_version), then the
    # stream driver picks up from the committed cursor — never
    # re-folding versions 1-2
    half_path = str(tmp_path / "view_half")
    maintain_aggregate_view(
        fact, half_path, ["id"], ["ds"], ["amount"], to_version=2
    )
    resumed = stream_maintain_aggregate_view(
        fact, half_path, ["id"], ["ds"], ["amount"],
        max_versions_per_batch=1,
    )
    assert resumed == [2, 3]  # two remaining ranges -> two commits
    half = {
        r["ds"]: (r["__cnt"], r["sum_amount"])
        for r in WapTable(spark, half_path).read().collect()
    }
    assert half == truth


def test_stream_drain_snapshots_tip_once(spark, tmp_path):
    """AvailableNow contract (round-10 ADVICE fix): the end offset is
    snapshotted ONCE at invocation. A source that keeps committing
    while the stream drains must not extend THIS invocation — the
    drain terminates at the tip observed at start, and the late
    commits belong to the next invocation. (The old per-iteration
    re-read of current_version never terminated against a source
    outpacing the drain.)"""
    from etl_reporting_spark.operators import incremental
    from etl_reporting_spark.operators.wap import (
        WapTable,
        create_partitioned_wap_table,
    )
    from etl_reporting_spark.streaming.cdc_stream import (
        stream_maintain_aggregate_view,
    )

    rows = [(i, f"2026-03-0{1 + i % 2}", float(i)) for i in range(1, 11)]
    fact = create_partitioned_wap_table(
        spark,
        str(tmp_path / "fact"),
        spark.createDataFrame(rows, "id long, ds string, amount double"),
        ["ds"],
    )
    fact.delete_rows("id % 3 = 0")  # v2 — tip is 2 at invocation

    real = incremental.maintain_aggregate_view
    extra = {"done": False}

    def racing(*args, **kwargs):
        v = real(*args, **kwargs)
        if not extra["done"]:  # source outpaces the drain: commit v3
            extra["done"] = True
            fact.upsert_rows_dv(
                spark.createDataFrame(
                    [(99, "2026-03-01", 99.0)],
                    "id long, ds string, amount double",
                ),
                keys=["id"],
            )
        return v

    import unittest.mock as mock

    with mock.patch.object(incremental, "maintain_aggregate_view", racing):
        applied = stream_maintain_aggregate_view(
            fact, str(tmp_path / "view"), ["id"], ["ds"], ["amount"],
            max_versions_per_batch=1,
        )
    assert applied == [1, 2]  # drained to the SNAPSHOTTED tip, then stopped
    assert fact.current_version() == 3
    view = WapTable(spark, str(tmp_path / "view"))
    assert (view.latest_record() or {}).get("source_version") == 2

    # the racing commit is the NEXT invocation's batch
    assert stream_maintain_aggregate_view(
        fact, str(tmp_path / "view"), ["id"], ["ds"], ["amount"]
    ) == [3]
    assert (view.latest_record() or {}).get("source_version") == 3


def test_view_storage_threads_to_ivm_view(spark, tmp_path):
    """round-10 ADVICE fix: maintain_aggregate_view /
    stream_maintain_aggregate_view accept ``view_storage=`` and pass
    it to the view's WapTable — an object-store-backed IVM view no
    longer requires monkeypatching the module-global storage
    factory."""
    from etl_reporting_spark.operators.incremental import (
        maintain_aggregate_view,
    )
    from etl_reporting_spark.operators.table_storage import BlobStorage
    from etl_reporting_spark.operators.wap import (
        ObjectStoreCommitStore,
        WapTable,
        create_partitioned_wap_table,
    )
    from etl_reporting_spark.streaming.cdc_stream import (
        stream_maintain_aggregate_view,
    )

    rows = [(i, f"2026-04-0{1 + i % 2}", float(i)) for i in range(1, 11)]
    fact = create_partitioned_wap_table(
        spark,
        str(tmp_path / "fact"),
        spark.createDataFrame(rows, "id long, ds string, amount double"),
        ["ds"],
    )
    vs = BlobStorage(str(tmp_path / "view"))
    v = maintain_aggregate_view(
        fact, str(tmp_path / "view"), ["id"], ["ds"], ["amount"],
        view_storage=vs,
    )
    assert v == 1
    view = WapTable(spark, str(tmp_path / "view"), storage=vs)
    # the commit log went through the blob backend's conditional-PUT
    # store — proof the storage seam, not the global factory, was used
    assert isinstance(view.store, ObjectStoreCommitStore)
    assert view.current_version() == 1

    fact.delete_rows("id % 2 = 0")
    assert stream_maintain_aggregate_view(
        fact, str(tmp_path / "view"), ["id"], ["ds"], ["amount"],
        view_storage=vs,
    ) == [2]
    assert (view.latest_record() or {}).get("source_version") == 2
