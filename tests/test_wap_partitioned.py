"""Partition-scoped WAP commits + the CommitStore seam (round-6
verdict #3/#4).

What must hold:
- a commit into a date-partitioned fact rewrites ONLY the touched
  partition directories — untouched entries are inherited verbatim
  (asserted on disk, not just via read());
- concurrent writers to DISJOINT partition sets BOTH succeed (the
  loser rebases); overlapping sets get one winner and one
  ConcurrentWriteError;
- the crash/race behavior depends only on the CommitStore CAS
  contract: the suite parametrizes over the POSIX os.link store and
  an object-store-shaped in-memory CAS, and a failure-injecting
  wrapper proves both writer-death points (before the CAS →
  invisible; after the CAS → durable).
"""

from __future__ import annotations

import json
import os
import threading

import pytest

# every test in this module runs twice: once on the POSIX data
# plane (LocalFSStorage) and once on object-store semantics
# (BlobStorage + conditional-PUT commit log) — see conftest
pytestmark = pytest.mark.usefixtures("wap_storage_backend")

from pyspark.sql import functions as F

from etl_reporting_spark.operators.merge import merge_upsert
from etl_reporting_spark.operators.wap import (
    AuditError,
    ConcurrentWriteError,
    FlakyCommitStore,
    InMemoryCommitStore,
    InMemoryObjectStore,
    LocalFSCommitStore,
    ObjectStoreCommitStore,
    PartitionedWapTable,
    create_partitioned_wap_table,
    hive_partition_key,
)


@pytest.fixture()
def fact_df(spark):
    # three days of a fact table, id unique within the table
    rows = [
        (i, f"2026-01-{1 + i % 3:02d}", float(i * 10)) for i in range(1, 13)
    ]
    return spark.createDataFrame(rows, "id long, ds string, amount double")


def _ptable(spark, tmp_path, df, name="fact") -> PartitionedWapTable:
    return create_partitioned_wap_table(spark, str(tmp_path / name), df, ["ds"])


def _data_roots(path) -> list[str]:
    return sorted(d for d in os.listdir(path) if d.startswith("d-"))


# ------------------------------------------------------------ behavior

def test_commit_rewrites_only_touched_partitions(spark, tmp_path, fact_df):
    t = _ptable(spark, tmp_path, fact_df)
    m1 = t.partition_map()
    assert set(m1) == {"ds=2026-01-01", "ds=2026-01-02", "ds=2026-01-03"}
    roots_before = _data_roots(t.path)

    # upsert one day: update id 4 (lives in ds=2026-01-02), insert id 100
    delta = spark.createDataFrame(
        [(4, "2026-01-02", 999.0), (100, "2026-01-02", 1.0)],
        "id long, ds string, amount double",
    )
    res = merge_upsert(
        None, delta, ["id"], backend="wap", spark=spark,
        target_table=t.path, partition_by=["ds"],
    )
    assert res.version == 2
    assert (res.rows_updated, res.rows_inserted) == (1, 1)

    m2 = t.partition_map()
    # untouched entries inherited VERBATIM — same dir strings, no rewrite
    assert m2["ds=2026-01-01"] == m1["ds=2026-01-01"]
    assert m2["ds=2026-01-03"] == m1["ds=2026-01-03"]
    assert m2["ds=2026-01-02"] != m1["ds=2026-01-02"]
    # exactly one new data root, containing ONLY the touched day
    new_roots = sorted(set(_data_roots(t.path)) - set(roots_before))
    assert len(new_roots) == 1
    leaves = [
        d for d in os.listdir(os.path.join(t.path, new_roots[0])) if "=" in d
    ]
    assert leaves == ["ds=2026-01-02"]
    # the record declares its touched set
    assert t.latest_record()["touched"] == ["ds=2026-01-02"]
    # content: day 2 merged, other days untouched
    out = {r["id"]: r["amount"] for r in t.read().collect()}
    assert out[4] == 999.0 and out[100] == 1.0
    assert out[3] == 30.0 and len(out) == 13


def test_partitioned_merge_matches_join_backend_content(
    spark, tmp_path, fact_df
):
    """End state of scoped merges == one big unpartitioned merge."""
    t = _ptable(spark, tmp_path, fact_df)
    delta = spark.createDataFrame(
        [(1, "2026-01-01", -1.0), (5, "2026-01-02", -5.0), (200, "2026-01-03", 7.0)],
        "id long, ds string, amount double",
    )
    expected = sorted(
        map(tuple, merge_upsert(fact_df, delta, ["id"]).df.collect())
    )
    merge_upsert(
        None, delta, ["id"], backend="wap", spark=spark,
        target_table=t.path, partition_by=["ds"],
    )
    assert sorted(map(tuple, t.read().collect())) == expected


def test_read_prunes_at_metadata_layer(spark, tmp_path, fact_df):
    t = _ptable(spark, tmp_path, fact_df)
    day2 = t.read(partitions=["ds=2026-01-02"])
    assert sorted(r["id"] for r in day2.collect()) == [1, 4, 7, 10]
    # the pruned read PLANS only the one partition dir
    files = day2.inputFiles()
    assert files and all("ds=2026-01-02" in f for f in files)
    with pytest.raises(KeyError, match="unknown partitions"):
        t.read(partitions=["ds=1999-01-01"])


def test_empty_post_merge_partition_drops_its_entry(spark, tmp_path, fact_df):
    """Deleting every row of a day removes the map entry (an empty
    partition writes no dir, so `replace` must carry the drop)."""
    t = _ptable(spark, tmp_path, fact_df)
    empty = spark.createDataFrame([], "id long, ds string, amount double")
    v = t.commit_partitions(
        empty, replace=["ds=2026-01-03"], operation="purge day"
    )
    assert v == 2
    assert "ds=2026-01-03" not in t.partition_map()
    assert sorted({r["ds"] for r in t.read().collect()}) == [
        "2026-01-01", "2026-01-02",
    ]
    # time travel still sees the purged day
    assert "ds=2026-01-03" in t.partition_map(version=1)


def test_update_moving_rows_across_partitions_is_refused(
    spark, tmp_path, fact_df
):
    t = _ptable(spark, tmp_path, fact_df)
    stray = spark.createDataFrame(
        [(1, "2026-01-05", 0.0)], "id long, ds string, amount double"
    )
    with pytest.raises(AuditError, match="outside the declared replace set"):
        t.commit_partitions(stray, replace=["ds=2026-01-01"])
    # nothing published, no data roots leaked
    assert t.current_version() == 1
    assert len(_data_roots(t.path)) == 1


def test_disjoint_threaded_writers_both_land(spark, tmp_path, fact_df):
    """The fact-scale concurrency contract: two real threads commit
    from the SAME base into different days; the version CAS makes one
    rebase, and BOTH changes are in the final snapshot."""
    t = _ptable(spark, tmp_path, fact_df)
    results: dict[str, object] = {}
    barrier = threading.Barrier(2)

    def writer(tag: str, day: str, ids) -> None:
        delta = spark.createDataFrame(
            [(i, day, float(1000 + i)) for i in ids],
            "id long, ds string, amount double",
        )
        try:
            barrier.wait(timeout=60)
            results[tag] = merge_upsert(
                None, delta, ["id"], backend="wap", spark=spark,
                target_table=t.path, partition_by=["ds"],
            ).version
        except Exception as e:  # pragma: no cover - failure diagnostics
            results[tag] = e

    th_a = threading.Thread(target=writer, args=("A", "2026-01-01", [3, 50]))
    th_b = threading.Thread(target=writer, args=("B", "2026-01-02", [1, 60]))
    th_a.start(); th_b.start()
    th_a.join(180); th_b.join(180)

    assert sorted(results.values()) == [2, 3], results
    out = {r["id"]: r["amount"] for r in t.read().collect()}
    assert out[3] == 1003.0 and out[50] == 1050.0  # A landed
    assert out[1] == 1001.0 and out[60] == 1060.0  # B landed
    assert len(out) == 14
    touched = [rec["touched"] for rec in t.history()[1:]]
    assert sorted(map(tuple, touched)) == [
        ("ds=2026-01-01",), ("ds=2026-01-02",),
    ]


def test_overlapping_writers_one_winner(spark, tmp_path, fact_df):
    t = _ptable(spark, tmp_path, fact_df)
    base = t.current_version()
    day = spark.createDataFrame(
        [(2, "2026-01-02", 1.0)], "id long, ds string, amount double"
    )
    assert t.commit_partitions(day, base_version=base, operation="A") == 2
    roots_after_a = _data_roots(t.path)
    with pytest.raises(ConcurrentWriteError, match="ds=2026-01-02"):
        t.commit_partitions(
            day.withColumn("amount", F.lit(2.0)),
            base_version=base,
            operation="B",
        )
    # loser cleaned its data root; winner's state intact
    assert _data_roots(t.path) == roots_after_a
    assert t.current_version() == 2
    assert {r["amount"] for r in t.read(partitions=["ds=2026-01-02"]).collect()} == {1.0}


def test_partition_level_vacuum(spark, tmp_path, fact_df):
    t = _ptable(spark, tmp_path, fact_df)
    # capture the create commit's root NOW — uuid-named roots have no
    # stable sort order once the second commit's root appears
    create_root = _data_roots(t.path)[0]
    day = spark.createDataFrame(
        [(2, "2026-01-02", 1.0)], "id long, ds string, amount double"
    )
    t.commit_partitions(day, operation="rewrite day2")
    # young superseded leaf is protected by the horizon
    assert t.vacuum(keep_last=1) == []
    removed = t.vacuum(keep_last=1, min_age_seconds=0)
    # ONLY the superseded day-2 leaf of the create root goes; the
    # still-referenced day-1/day-3 leaves in the SAME root survive
    assert [r for r in removed if not r.startswith("_wap")] == [
        f"{create_root}/ds=2026-01-02"
    ]
    live = t.read()
    assert live.count() == 9
    assert sorted({r["ds"] for r in live.collect()}) == [
        "2026-01-01", "2026-01-02", "2026-01-03",
    ]


def test_hive_partition_key_matches_spark_writer(spark, tmp_path):
    """The metadata-layer key must equal the dir name Spark writes —
    including percent-escaping and the null sentinel."""
    df = spark.createDataFrame(
        [(1, "EU/WEST", 1.0), (2, "plain", 2.0), (3, None, 3.0)],
        "id long, region string, v double",
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "esc"), df, ["region"]
    )
    expected = {
        hive_partition_key(["region"], [r])
        for r in ("EU/WEST", "plain", None)
    }
    assert set(t.partition_map()) == expected
    assert "region=EU%2FWEST" in expected
    assert "region=__HIVE_DEFAULT_PARTITION__" in expected
    # and reads resolve through those keys
    assert t.read(partitions=["region=EU%2FWEST"]).count() == 1


def test_multi_column_partitioning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2026-01-01", "EU", 1.0), (2, "2026-01-01", "US", 2.0),
         (3, "2026-01-02", "EU", 3.0)],
        "id long, ds string, region string, v double",
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "mc"), df, ["ds", "region"]
    )
    assert set(t.partition_map()) == {
        "ds=2026-01-01/region=EU", "ds=2026-01-01/region=US",
        "ds=2026-01-02/region=EU",
    }
    delta = spark.createDataFrame(
        [(2, "2026-01-01", "US", 99.0)],
        "id long, ds string, region string, v double",
    )
    merge_upsert(
        None, delta, ["id"], backend="wap", spark=spark,
        target_table=t.path, partition_by=["ds", "region"],
    )
    assert t.latest_record()["touched"] == ["ds=2026-01-01/region=US"]
    out = {r["id"]: r["v"] for r in t.read().collect()}
    assert out == {1: 1.0, 2: 99.0, 3: 3.0}


# ----------------------------------------------------- CommitStore seam

def _store_factories(tmp_path):
    return {
        "localfs": lambda: LocalFSCommitStore(str(tmp_path / "log")),
        "inmemory": lambda: InMemoryCommitStore(),
        "objectstore": lambda: ObjectStoreCommitStore(
            InMemoryObjectStore(), "tables/fact/_log"
        ),
    }


@pytest.mark.parametrize("kind", ["localfs", "inmemory", "objectstore"])
def test_store_cas_contract(tmp_path, kind):
    """Publish is create-if-absent; the payload round-trips complete."""
    from etl_reporting_spark.operators.wap import CommitConflict

    store = _store_factories(tmp_path)[kind]()
    assert store.max_version() == 0 and store.read(1) is None
    store.publish(1, b'{"version": 1}')
    assert store.max_version() == 1
    assert json.loads(store.read(1)) == {"version": 1}
    with pytest.raises(CommitConflict):
        store.publish(1, b'{"version": "usurper"}')
    assert json.loads(store.read(1)) == {"version": 1}  # first write wins


@pytest.mark.parametrize("kind", ["localfs", "inmemory", "objectstore"])
def test_store_threaded_cas_exactly_one_winner(tmp_path, kind):
    from etl_reporting_spark.operators.wap import CommitConflict

    store = _store_factories(tmp_path)[kind]()
    outcomes: dict[str, bool] = {}
    barrier = threading.Barrier(4)

    def attempt(tag: str) -> None:
        try:
            barrier.wait(timeout=30)
            store.publish(7, tag.encode())
            outcomes[tag] = True
        except CommitConflict:
            outcomes[tag] = False

    threads = [
        threading.Thread(target=attempt, args=(f"w{i}",)) for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(60)
    assert sum(outcomes.values()) == 1
    assert store.read(7).decode() in outcomes


@pytest.mark.parametrize("kind", ["localfs", "inmemory", "objectstore"])
def test_partitioned_table_over_either_store(spark, tmp_path, fact_df, kind):
    """The protocol depends only on the store contract: the same
    disjoint-rebase + overlap-conflict behavior holds over the POSIX
    link store and the object-store-shaped CAS."""
    store = _store_factories(tmp_path)[kind]()
    path = str(tmp_path / f"t_{kind}")
    t = create_partitioned_wap_table(spark, path, fact_df, ["ds"], store=store)
    base = t.current_version()
    d1 = spark.createDataFrame(
        [(600, "2026-01-01", -1.0)], "id long, ds string, amount double"
    )
    d2 = spark.createDataFrame(
        [(700, "2026-01-02", -2.0)], "id long, ds string, amount double"
    )
    # disjoint from the same base: second rebases automatically
    assert t.commit_partitions(d1, base_version=base) == 2
    assert t.commit_partitions(d2, base_version=base) == 3
    # overlapping from a stale base: conflict
    with pytest.raises(ConcurrentWriteError):
        t.commit_partitions(d1, base_version=base)
    out = {r["id"]: r["amount"] for r in t.read().collect()}
    assert out[600] == -1.0 and out[700] == -2.0


def test_crash_before_cas_is_invisible(spark, tmp_path, fact_df):
    store = FlakyCommitStore(
        LocalFSCommitStore(str(tmp_path / "t" / "_wap")), crash_before=2
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), fact_df, ["ds"], store=store
    )
    day = spark.createDataFrame(
        [(2, "2026-01-02", 1.0)], "id long, ds string, amount double"
    )
    with pytest.raises(RuntimeError, match="before publish"):
        t.commit_partitions(day)
    # record never installed → readers still on v1, day-2 unchanged
    assert t.current_version() == 1
    assert {r["amount"] for r in t.read(partitions=["ds=2026-01-02"]).collect()} == {
        10.0, 40.0, 70.0, 100.0,
    }


def test_crash_after_cas_is_durable(spark, tmp_path, fact_df):
    """Writer dies AFTER the CAS: the commit is published and a
    recovering reader sees it — the record, not the writer process,
    is the source of truth."""
    store = FlakyCommitStore(
        LocalFSCommitStore(str(tmp_path / "t" / "_wap")), crash_after=2
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), fact_df, ["ds"], store=store
    )
    day = spark.createDataFrame(
        [(500, "2026-01-02", 777.0)], "id long, ds string, amount double"
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.commit_partitions(day, replace=["ds=2026-01-02"])
    # fresh handle (new "process"), plain store: the commit IS there
    t2 = PartitionedWapTable(spark, t.path, ["ds"])
    assert t2.current_version() == 2
    out = {r["id"]: r["amount"] for r in t2.read().collect()}
    assert out[500] == 777.0 and len(out) == 9  # day-2 replaced by 1 row


# ------------------------------------------- change feed + compaction

def test_table_changes_partitioned_prunes_to_churned_days(
    spark, tmp_path, fact_df
):
    """Diff-derived CDF: between two versions of a partitioned table,
    only partitions whose dir pointer changed are read at all —
    inherited days contribute zero input files to the diff plan."""
    from etl_reporting_spark.operators.wap import table_changes

    t = _ptable(spark, tmp_path, fact_df)
    delta = spark.createDataFrame(
        # update id 4, insert id 100, and day-2's other rows survive
        [(4, "2026-01-02", 999.0), (100, "2026-01-02", 1.0),
         (1, "2026-01-02", 10.0), (7, "2026-01-02", 70.0),
         (10, "2026-01-02", 100.0)],
        "id long, ds string, amount double",
    )
    merge_upsert(
        None, delta, ["id"], backend="wap", spark=spark,
        target_table=t.path, partition_by=["ds"],
    )
    ch = table_changes(t, ["id"], from_version=1, to_version=2)
    rows = {(r["id"], r["_change_type"]): r["amount"] for r in ch.collect()}
    assert rows == {
        (100, "insert"): 1.0,
        (4, "update_preimage"): 40.0,
        (4, "update_postimage"): 999.0,
    }
    # metadata pruning: the diff's scans touch ONLY day-2 files
    files = ch.inputFiles()
    assert files and all("ds=2026-01-02" in f for f in files)


def test_table_changes_full_snapshot_table(spark, tmp_path):
    from etl_reporting_spark.operators.wap import create_wap_table, table_changes

    a = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    b = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, v string"
    )
    t = create_wap_table(spark, str(tmp_path / "t"), a)
    t.commit(b, operation="overwrite")
    ch = {(r["id"], r["_change_type"]): r["v"]
          for r in table_changes(t, ["id"], 1, 2).collect()}
    assert ch == {
        (3, "delete"): "c",
        (4, "insert"): "d",
        (2, "update_preimage"): "b",
        (2, "update_postimage"): "B",
    }


def test_optimize_compacts_without_changing_content(spark, tmp_path, fact_df):
    from etl_reporting_spark.operators.wap import optimize_partitions

    # hash-repartition by id: file layout is a pure function of the
    # values (day-2 ids 1/4/7/10 hash to >1 of the 4 buckets), immune
    # to input slicing and AQE
    t = _ptable(spark, tmp_path, fact_df.repartition(4, "id"))
    before = sorted(map(tuple, t.read().collect()))
    n_files_before = len(t.read(partitions=["ds=2026-01-02"]).inputFiles())
    assert n_files_before > 1
    v = optimize_partitions(t, ["ds=2026-01-02"], n_files=1)
    assert v == 2
    assert t.latest_record()["operation"] == "optimize"
    assert len(t.read(partitions=["ds=2026-01-02"]).inputFiles()) == 1
    # logical content identical; untouched days inherited
    assert sorted(map(tuple, t.read().collect())) == before
    assert t.partition_map()["ds=2026-01-01"] == t.partition_map(1)["ds=2026-01-01"]
    # and the CDF between the two versions is EMPTY — compaction is
    # a physical rewrite, not a logical change
    from etl_reporting_spark.operators.wap import table_changes

    assert table_changes(t, ["id"], 1, 2).count() == 0


def test_streaming_wap_upsert_partitioned(spark, tmp_path):
    """The fact-scale streaming sink: per-epoch commits touch only
    the partitions the micro-batch lands in."""
    from etl_reporting_spark.operators.wap import create_partitioned_wap_table
    from etl_reporting_spark.streaming.cdc_stream import (
        read_event_stream,
        streaming_wap_upsert,
    )

    src = tmp_path / "landing"
    src.mkdir()
    spark.createDataFrame(
        [(1, "2026-01-01", 1), (2, "2026-01-02", 1)],
        "id long, ds string, seq long",
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, "2026-01-01", 2), (3, "2026-01-01", 1)],
        "id long, ds string, seq long",
    ).coalesce(1).write.parquet(str(src / "f2"))

    path = str(tmp_path / "serving")
    t = create_partitioned_wap_table(
        spark, path,
        spark.createDataFrame(
            [(0, "2025-12-31", 0)], "id long, ds string, seq long"
        ),
        ["ds"],
    )
    stream = read_event_stream(
        spark, str(src / "*"), "id long, ds string, seq long",
        max_files_per_trigger=1,
    )
    q = streaming_wap_upsert(
        stream, path, ["id"], str(tmp_path / "ckpt"),
        order_cols=["seq"], partition_by=["ds"],
    )
    q.awaitTermination(120)

    state = {r["id"]: (r["ds"], r["seq"]) for r in t.read().collect()}
    assert state == {
        0: ("2025-12-31", 0), 1: ("2026-01-01", 2),
        2: ("2026-01-02", 1), 3: ("2026-01-01", 1),
    }
    # every epoch commit declares a touched set scoped to its batch's
    # days — never the seed partition
    for rec in t.history()[1:]:
        assert rec["operation"] == "merge"
        assert "ds=2025-12-31" not in rec["touched"]
        assert rec["epoch_id"] is not None


def test_schema_evolution_add_column(spark, tmp_path, fact_df):
    """Delta ADD COLUMN semantics without a backfill rewrite: a
    commit may carry a new column; partitions inherited from before
    it existed read as NULL for it, and the resolved version's schema
    governs the read."""
    t = _ptable(spark, tmp_path, fact_df)
    evolved = spark.createDataFrame(
        [(4, "2026-01-02", 999.0, "audited")],
        "id long, ds string, amount double, note string",
    )
    v = t.commit_partitions(evolved, replace=["ds=2026-01-02"])
    assert v == 2
    out = t.read()
    assert out.columns == ["id", "ds", "amount", "note"]
    rows = {r["id"]: r["note"] for r in out.collect()}
    assert rows[4] == "audited"
    # inherited day-1/day-3 rows: NULL note, nothing rewritten
    assert rows[3] is None and rows[2] is None
    assert t.partition_map()["ds=2026-01-01"] == t.partition_map(1)["ds=2026-01-01"]
    # time travel to v1 shows the OLD schema
    assert t.read(version=1).columns == ["id", "ds", "amount"]


# -------------------------------------------------------- data skipping

def test_stats_based_partition_pruning(spark, tmp_path):
    """Delta/Iceberg data skipping at partition granularity: commit
    records carry per-partition [min, max] of named columns; range
    predicates prune at the METADATA layer even on columns the table
    is NOT partitioned by."""
    from etl_reporting_spark.operators.wap import create_partitioned_wap_table

    df = spark.createDataFrame(
        [(1, "EU", "2026-01-05", 10.0), (2, "EU", "2026-01-20", 20.0),
         (3, "US", "2026-02-01", 30.0), (4, "US", "2026-02-10", 40.0),
         (5, "AP", "2026-03-01", 50.0)],
        "id long, region string, od string, amount double",
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), df, ["region"], stats_cols=["od", "amount"]
    )
    rec = t.latest_record()
    assert rec["stats"]["region=EU"]["od"] == ["2026-01-05", "2026-01-20"]
    assert rec["stats"]["region=US"]["amount"] == [30.0, 40.0]
    # range predicate on od — partitioned by REGION, pruned by DATE
    assert t.prune_partitions("od", lo="2026-02-05") == [
        "region=AP", "region=US",
    ]
    assert t.prune_partitions("od", hi="2026-01-31") == ["region=EU"]
    assert t.prune_partitions("amount", lo=45.0) == ["region=AP"]
    # the pruned read is correct AND plans only the kept partitions
    out = t.read(partitions=t.prune_partitions("od", hi="2026-01-31"))
    assert sorted(r["id"] for r in out.collect()) == [1, 2]
    assert all("region=EU" in f for f in out.inputFiles())


def test_stats_inherit_and_replace_on_partial_commit(spark, tmp_path):
    from etl_reporting_spark.operators.wap import create_partitioned_wap_table

    df = spark.createDataFrame(
        [(1, "EU", 10.0), (2, "US", 99.0)], "id long, region string, v double"
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), df, ["region"], stats_cols=["v"]
    )
    day = spark.createDataFrame([(1, "EU", 77.0)], "id long, region string, v double")
    t.commit_partitions(day, replace=["region=EU"], stats_cols=["v"])
    rec = t.latest_record()
    assert rec["stats"]["region=EU"]["v"] == [77.0, 77.0]   # replaced
    assert rec["stats"]["region=US"]["v"] == [99.0, 99.0]   # inherited
    # a commit WITHOUT stats_cols drops the touched partition's stats
    t.commit_partitions(day.select("id", "region", (day.v * 2).alias("v")),
                        replace=["region=EU"])
    rec = t.latest_record()
    assert "region=EU" not in rec["stats"]
    # unknown stats are conservative: the partition is always kept
    assert "region=EU" in t.prune_partitions("v", lo=1000.0)
    assert t.prune_partitions("v", lo=1000.0) == ["region=EU"]


def test_select_partitions_by_parsed_values(spark, tmp_path, fact_df):
    t = _ptable(spark, tmp_path, fact_df)
    assert t.select_partitions(lambda p: p["ds"] >= "2026-01-02") == [
        "ds=2026-01-02", "ds=2026-01-03",
    ]
    # escaped values parse back to the raw string
    df = spark.createDataFrame(
        [(1, "EU/WEST", 1.0), (2, None, 2.0)], "id long, region string, v double"
    )
    from etl_reporting_spark.operators.wap import create_partitioned_wap_table

    t2 = create_partitioned_wap_table(spark, str(tmp_path / "esc2"), df, ["region"])
    assert t2.select_partitions(lambda p: p["region"] == "EU/WEST") == [
        "region=EU%2FWEST"
    ]
    assert t2.select_partitions(lambda p: p["region"] is None) == [
        "region=__HIVE_DEFAULT_PARTITION__"
    ]


def test_read_plans_one_scan_per_root_not_per_partition(spark, tmp_path):
    """Scale shape: a snapshot whose partitions span R physical roots
    plans R parquet scans (basePath grouping), NOT one per partition —
    a years-deep fact with thousands of partitions but compacted
    roots keeps a small plan."""
    from etl_reporting_spark.operators.wap import create_partitioned_wap_table

    rows = [(i, f"2026-01-{1 + i % 10:02d}", float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, ds string, v double")
    t = create_partitioned_wap_table(spark, str(tmp_path / "t"), df, ["ds"])
    # three single-day commits -> 4 roots total, 10 partitions
    for day in ("2026-01-01", "2026-01-02", "2026-01-03"):
        one = spark.createDataFrame(
            [(1000, day, 0.0)], "id long, ds string, v double"
        )
        t.commit_partitions(one, replace=[f"ds={day}"])
    assert len(t.partition_map()) == 10
    assert len(_data_roots(t.path)) == 4
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans == 4, plan[:500]


def test_register_view_detects_partitioned_layout(spark, tmp_path, fact_df):
    """SQL reports can sit on a partitioned fact without knowing the
    layout: open_wap_table detects it from the commit record and the
    registered view pins the snapshot at registration time."""
    from etl_reporting_spark.operators.wap import (
        PartitionedWapTable,
        open_wap_table,
        register_wap_view,
    )

    t = _ptable(spark, tmp_path, fact_df)
    opened = open_wap_table(spark, t.path)
    assert isinstance(opened, PartitionedWapTable)
    assert opened.partition_by == ["ds"]

    register_wap_view(spark, t.path, "fact_v")
    total = spark.sql(
        "SELECT CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS s FROM fact_v"
    ).collect()[0]["s"]
    assert total == sum(float(i * 10) for i in range(1, 13))
    # a commit AFTER registration does not shear the view
    day = spark.createDataFrame(
        [(999, "2026-01-02", 1.0)], "id long, ds string, amount double"
    )
    t.commit_partitions(day, replace=["ds=2026-01-02"])
    assert spark.sql("SELECT COUNT(*) AS n FROM fact_v").collect()[0]["n"] == 12
    # re-register picks up the new snapshot
    register_wap_view(spark, t.path, "fact_v")
    assert spark.sql("SELECT COUNT(*) AS n FROM fact_v").collect()[0]["n"] == 9


def test_rebase_exhaustion_cleans_orphan_root(spark, tmp_path, fact_df):
    """If the CAS keeps conflicting past max_rebase (pathological
    contention), the writer gives up with ConcurrentWriteError and
    its already-written data root is removed — no disk leak."""
    from etl_reporting_spark.operators.wap import (
        CommitConflict,
        LocalFSCommitStore,
    )

    t = _ptable(spark, tmp_path, fact_df)

    class AlwaysConflict(LocalFSCommitStore):
        def publish(self, version, payload):
            raise CommitConflict(version)

    t.store = AlwaysConflict(os.path.join(t.path, "_wap"))
    roots_before = _data_roots(t.path)
    day = spark.createDataFrame(
        [(1, "2026-01-02", 0.0)], "id long, ds string, amount double"
    )
    with pytest.raises(ConcurrentWriteError):
        t.commit_partitions(day, max_rebase=2)
    assert _data_roots(t.path) == roots_before  # orphan cleaned
    # table unharmed under the real store
    t.store = LocalFSCommitStore(os.path.join(t.path, "_wap"))
    assert t.current_version() == 1 and t.read().count() == 12


# ------------------------------------------------- round-7 advice fixes

def test_partition_by_recorded_and_recovered_for_empty_table(spark, tmp_path):
    """An empty-frame create has no dir keys to guess partition_by
    from; the record now carries it explicitly, so open_wap_table +
    the next commit still write hive layout (the guessed-[] bug
    published commits that referenced no data)."""
    from etl_reporting_spark.operators.wap import open_wap_table

    empty = spark.createDataFrame([], "id long, ds string, amount double")
    t = create_partitioned_wap_table(spark, str(tmp_path / "e"), empty, ["ds"])
    reopened = open_wap_table(spark, t.path)
    assert isinstance(reopened, PartitionedWapTable)
    assert reopened.partition_by == ["ds"]
    day = spark.createDataFrame(
        [(1, "2026-01-01", 1.0)], "id long, ds string, amount double"
    )
    v = reopened.commit_partitions(day)
    assert reopened.partition_map(v) != {}  # commit references its data
    assert reopened.read(version=v).count() == 1


def test_open_legacy_record_without_partition_by_raises_when_empty(
    spark, tmp_path, fact_df
):
    """A pre-round-7 record (no partition_by) with an empty partition
    map must refuse to guess instead of returning partition_by=[]."""
    from etl_reporting_spark.operators.wap import open_wap_table

    t = _ptable(spark, tmp_path, fact_df)
    slot = os.path.join(t.path, "_wap", "commit-00001.json")
    rec = json.loads(open(slot).read())
    del rec["partition_by"]
    rec["partitions"] = {}
    rec["touched"] = []
    with open(slot, "w") as f:
        f.write(json.dumps(rec))
    with pytest.raises(ValueError, match="partition_by"):
        open_wap_table(spark, t.path)


def test_table_changes_from_version_zero_is_all_inserts(spark, tmp_path, fact_df):
    from etl_reporting_spark.operators.wap import table_changes

    t = _ptable(spark, tmp_path, fact_df)
    ch = table_changes(t, keys=["id"], from_version=0).collect()
    assert len(ch) == 12
    assert {r["_change_type"] for r in ch} == {"insert"}


def test_table_changes_across_added_column(spark, tmp_path, fact_df):
    """ADD COLUMN between from/to versions: the old side reads NULL
    for the new column instead of failing resolution, and rows whose
    only difference is the new column emit updates."""
    from etl_reporting_spark.operators.wap import table_changes

    t = _ptable(spark, tmp_path, fact_df)
    evolved = spark.createDataFrame(
        [(1, "2026-01-02", 10.0, "fixed")],
        "id long, ds string, amount double, note string",
    )
    v2 = t.commit_partitions(evolved)
    ch = table_changes(t, keys=["id"], from_version=1, to_version=v2)
    by_type = {
        (r["_change_type"], r["id"]): r for r in ch.collect()
    }
    pre = by_type[("update_preimage", 1)]
    post = by_type[("update_postimage", 1)]
    assert pre["note"] is None and post["note"] == "fixed"


def test_prune_partitions_incomparable_bound_keeps(spark, tmp_path):
    """An int bound against ISO-string date stats must KEEP the
    partition (conservative), not raise or compare lexically."""
    rows = [(1, "2026-01-01", "2026-01-05"), (2, "2026-01-02", "2026-02-01")]
    df = spark.createDataFrame(rows, "id long, ds string, order_date string")
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "s"), df, ["ds"], stats_cols=["order_date"]
    )
    # comparable bound: prunes to the overlapping day
    assert t.prune_partitions("order_date", lo="2026-01-31") == ["ds=2026-01-02"]
    # incomparable bound type: keeps everything
    assert t.prune_partitions("order_date", lo=20260131) == sorted(t.partition_map())


def test_merge_partition_stability_probe(spark, tmp_path, fact_df):
    """validate_partition_stability: a source row whose key already
    lives in an UNTOUCHED partition fails fast instead of silently
    inserting a duplicate next to the stale row."""
    from etl_reporting_spark.operators.merge import merge_upsert_wap

    t = _ptable(spark, tmp_path, fact_df)
    # id=1 lives in ds=2026-01-02 (1 % 3 == 1 -> day 2); source moves
    # it to day 3 without including ds in the keys
    moved = spark.createDataFrame(
        [(1, "2026-01-03", 99.0)], "id long, ds string, amount double"
    )
    with pytest.raises(ValueError, match="partition-stability"):
        merge_upsert_wap(
            spark, t.path, moved, keys=["id"], partition_by=["ds"],
            validate_partition_stability=True,
        )
    # same merge with a stable key set (partition col included) passes
    res = merge_upsert_wap(
        spark, t.path, moved, keys=["id", "ds"], partition_by=["ds"],
        validate_partition_stability=True,
    )
    assert res.rows_inserted == 1


def test_alter_schema_add_and_drop_metadata_only(spark, tmp_path, fact_df):
    """ADD/DROP COLUMN commits touch zero data: old rows read NULL
    for the added column, dropped columns project away, time travel
    keeps each version's schema, partition columns are protected."""
    t = _ptable(spark, tmp_path, fact_df)
    files_before = {
        f for k in t.partition_map() for f in t.partition_files(k)
    }
    v2 = t.alter_schema(add={"note": "string"})
    assert t.read(version=v2).schema.simpleString().endswith(
        "amount:double,note:string>"
    )
    assert t.read().filter("note IS NULL").count() == 12
    # writes after the evolution carry the column; old files untouched
    day = spark.createDataFrame(
        [(99, "2026-01-01", 9.0, "hi")],
        "id long, ds string, amount double, note string",
    )
    t.commit_partitions(day)  # replaces day 1 under the NEW schema
    out = {r["id"]: r["note"] for r in t.read().collect()}
    assert out[99] == "hi"
    assert all(out[i] is None for i in out if i != 99)  # old files NULL-fill
    untouched = {
        f
        for k in t.partition_map()
        for f in t.partition_files(k)
        if "ds=2026-01-01" not in f
    }
    assert untouched <= files_before  # other days' files untouched
    # drop projects away without rewrite; v1 time travel unaffected
    v4 = t.alter_schema(drop=["note"])
    assert "note" not in t.read(version=v4).columns
    assert "note" not in t.read().columns
    assert t.read(version=1).columns == ["id", "ds", "amount"]
    with pytest.raises(ValueError, match="partition column"):
        t.alter_schema(drop=["ds"])
    with pytest.raises(ValueError, match="already exists"):
        t.alter_schema(add={"amount": "double"})


def test_alter_schema_widen_types_metadata_only(spark, tmp_path):
    """WIDEN (Iceberg's lossless promotions): int→long and
    float→double in one metadata commit — zero files touched; old
    narrow files coerce in the per-root union and the committed-
    schema cast, new writes land wide, values byte-identical."""
    df = spark.createDataFrame(
        [(1, "2026-01-01", 1.5), (2, "2026-01-02", 2.5)],
        "id int, ds string, amount float",
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "w"), df, ["ds"])
    files_before = {
        f for k in t.partition_map() for f in t.partition_files(k)
    }
    v2 = t.alter_schema(widen={"id": "long", "amount": "double"})
    assert t.read(version=v2).schema.simpleString() == (
        "struct<id:bigint,ds:string,amount:double>"
    )
    files_after = {
        f for k in t.partition_map() for f in t.partition_files(k)
    }
    assert files_after == files_before  # nothing rewritten
    # a wide write joins narrow files in one read, values intact
    wide = spark.createDataFrame(
        [(2**40, "2026-01-03", 3.25)], "id long, ds string, amount double"
    )
    t.commit_partitions(wide)
    got = {r["id"]: r["amount"] for r in t.read().collect()}
    assert got == {1: 1.5, 2: 2.5, 2**40: 3.25}
    # time travel keeps the narrow schema
    assert t.read(version=1).schema["id"].dataType.typeName() == "integer"


def test_alter_schema_widen_refuses_lossy_and_protected(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2026-01-01", 1.5)], "id long, ds string, amount double"
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "w"), df, ["ds"])
    with pytest.raises(ValueError, match="permitted promotions"):
        t.alter_schema(widen={"id": "int"})  # narrowing
    with pytest.raises(ValueError, match="permitted promotions"):
        t.alter_schema(widen={"amount": "float"})  # narrowing
    with pytest.raises(ValueError, match="permitted promotions"):
        t.alter_schema(widen={"id": "string"})  # lossy re-type
    with pytest.raises(ValueError, match="partition column"):
        t.alter_schema(widen={"ds": "string"})
    with pytest.raises(ValueError, match="unknown column"):
        t.alter_schema(widen={"nope": "long"})


def test_alter_schema_widen_decimal_precision(spark, tmp_path):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, "2026-01-01", Decimal("12.34"))],
        "id long, ds string, bal decimal(10,2)",
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "w"), df, ["ds"])
    t.alter_schema(widen={"bal": "decimal(18,2)"})
    assert t.read().schema["bal"].dataType.simpleString() == "decimal(18,2)"
    assert t.read().first()["bal"] == Decimal("12.34")
    with pytest.raises(ValueError, match="permitted promotions"):
        t.alter_schema(widen={"bal": "decimal(18,4)"})  # scale change


def test_alter_schema_conflicts_with_concurrent_writer(spark, tmp_path, fact_df):
    """A schema change carries no touched set: a racing partition
    writer and the ALTER get one winner (the loser's base is stale)."""
    t = _ptable(spark, tmp_path, fact_df)
    day = spark.createDataFrame(
        [(50, "2026-01-01", 5.0)], "id long, ds string, amount double"
    )
    t.alter_schema(add={"note": "string"})  # lands first
    with pytest.raises(ConcurrentWriteError):
        t.commit_partitions(day, base_version=1, max_rebase=0)


def test_under_reporting_list_cannot_corrupt_a_commit(spark, tmp_path):
    """Round-10 brief #1: commit-time written-file discovery no
    longer trusts the seam's read-after-write LIST. A BlobStorage
    whose ``list_prefix`` under-reports fresh ``d-*`` roots (drops
    every other parquet key — a lagging object-store LIST) must still
    publish COMPLETE commit records: the Spark write manifest
    (``inputFiles()`` through the write path's own FileSystem client)
    fills in what the LIST missed. Exercises all three discovery
    sites: dir-granular commit, file-granular rewrite, DV upsert."""
    from etl_reporting_spark.operators.table_storage import BlobStorage
    from etl_reporting_spark.operators.wap import create_partitioned_wap_table

    class LaggingListBlobStorage(BlobStorage):
        def list_prefix(self, rel: str = ""):
            keys = super().list_prefix(rel)
            # lag ONLY on fresh commit roots (the discovery call);
            # the commit log under _wap/ goes through list_keys, and
            # reads go through record pointers + list_files_at
            if any(p.startswith("d-") for p in rel.split("/") if p):
                return [
                    k for i, k in enumerate(keys)
                    if not k.endswith(".parquet") or i % 2 == 0
                ]
            return keys

    fs = LaggingListBlobStorage(str(tmp_path / "fact"))
    rows = [(i, f"2026-05-0{1 + i % 3}", float(i)) for i in range(1, 31)]
    df = spark.createDataFrame(
        rows, "id long, ds string, amount double"
    ).repartition(4)  # several files per partition so the lag bites
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "fact"), df, ["ds"], storage=fs
    )
    assert t.read().count() == 30  # every written file made the record

    # file-granular rewrite (commit_partition_files) under the lag:
    # replace the whole ds=2026-05-01 file set with updated content
    new_rows = (
        [(3, "2026-05-01", 1000.0)]
        + [(i, "2026-05-01", float(i)) for i in range(6, 31, 3)]
        + [(99, "2026-05-01", 9.0)]
    )
    t.commit_partition_files(
        spark.createDataFrame(
            new_rows, "id long, ds string, amount double"
        ).repartition(3),
        "ds=2026-05-01",
        replace_files=t.partition_files("ds=2026-05-01"),
    )
    got = {r["id"]: r["amount"] for r in t.read().collect()}
    assert got[3] == 1000.0 and got[99] == 9.0 and len(got) == 31

    # DV upsert appends new files under a fresh root — same guarantee
    t.upsert_rows_dv(
        spark.createDataFrame(
            [(200 + i, f"2026-05-0{1 + i % 3}", 7.0) for i in range(8)],
            "id long, ds string, amount double",
        ).repartition(4),
        keys=["id"],
    )
    assert t.read().count() == 39

    # and the record itself is complete: re-open with an HONEST
    # storage handle and the same rows come back (nothing depended on
    # the lying LIST at read time either)
    honest = BlobStorage(str(tmp_path / "fact"))
    from etl_reporting_spark.operators.wap import open_wap_table

    t2 = open_wap_table(spark, str(tmp_path / "fact"), storage=honest)
    assert t2.read().count() == 39


def test_append_rows_adds_files_without_rewrites(spark, tmp_path, fact_df):
    """Pure append: old pointers survive byte-identical, the touched
    partitions become file-granular lists, nothing is masked."""
    t = _ptable(spark, tmp_path, fact_df)
    files_before = {
        k: set(t.partition_files(k)) for k in t.partition_map()
    }
    add = spark.createDataFrame(
        [(100, "2026-01-01", 1.0), (101, "2026-01-04", 2.0)],
        "id long, ds string, amount double",
    )
    v = t.append_rows(add)
    assert t.read(version=v).count() == 14
    got = {r["id"] for r in t.read().collect()}
    assert {100, 101} <= got
    # every pre-append file is still referenced, untouched
    for k, old in files_before.items():
        assert old <= set(t.partition_files(k))
    # the brand-new partition (2026-01-04) arrived as files too
    assert "ds=2026-01-04" in t.partition_map()
    rec = t._commit_record(v)
    assert rec["operation"] == "append"
    assert all(fl == [] for fl in rec["touched_files"].values())


def test_concurrent_appends_rebase_past_each_other(spark, tmp_path, fact_df):
    """Two appends to the SAME partition commute: the CAS loser
    rebases and both row sets land."""
    t = _ptable(spark, tmp_path, fact_df)
    base = t.current_version()
    a = spark.createDataFrame(
        [(200, "2026-01-01", 1.0)], "id long, ds string, amount double"
    )
    b = spark.createDataFrame(
        [(201, "2026-01-01", 2.0)], "id long, ds string, amount double"
    )
    t.append_rows(a, base_version=base)
    # second append from the SAME stale base: must rebase, not fail
    v = t.append_rows(b, base_version=base)
    got = {r["id"] for r in t.read(version=v).collect()}
    assert {200, 201} <= got and len(got) == 14


def test_append_conflicts_with_whole_partition_replace(
    spark, tmp_path, fact_df
):
    """A replace computed without the appended rows must not silently
    win: the stale-base append raises instead of rebasing."""
    from etl_reporting_spark.operators.wap import ConcurrentWriteError

    t = _ptable(spark, tmp_path, fact_df)
    base = t.current_version()
    replacement = spark.createDataFrame(
        [(1, "2026-01-01", 0.0)], "id long, ds string, amount double"
    )
    t.commit_partitions(replacement, base_version=base)  # replaces day 1
    late = spark.createDataFrame(
        [(300, "2026-01-01", 3.0)], "id long, ds string, amount double"
    )
    with pytest.raises(ConcurrentWriteError, match="replaced"):
        t.append_rows(late, base_version=base)


def test_append_enforces_constraints(spark, tmp_path, fact_df):
    from etl_reporting_spark.operators.wap import ConstraintViolation

    t = _ptable(spark, tmp_path, fact_df)
    t.add_check_constraint("amt_pos", "amount >= 0")
    bad = spark.createDataFrame(
        [(400, "2026-01-01", -1.0)], "id long, ds string, amount double"
    )
    v = t.current_version()
    with pytest.raises(ConstraintViolation):
        t.append_rows(bad)
    assert t.current_version() == v


def test_append_empty_batch_is_a_noop(spark, tmp_path, fact_df):
    t = _ptable(spark, tmp_path, fact_df)
    v = t.current_version()
    empty = spark.createDataFrame([], "id long, ds string, amount double")
    assert t.append_rows(empty) == v
    assert t.current_version() == v
    assert len(_data_roots(t.path)) == 1  # the probe root was cleaned
