"""File-granular commits inside a partition (round-7 verdict #4) and
the plan-width guard (#8).

What must hold:
- a narrow-key upsert into a multi-file partition rewrites a strict
  SUBSET of its files — asserted on disk, not just via read();
- file selection comes from recorded per-file [min, max] stats
  (commit-record metadata only; files without stats conservatively
  selected);
- concurrent writers replacing DISJOINT file sets of the SAME
  partition both land (file-level rebase); overlapping sets get one
  winner and one ConcurrentWriteError;
- vacuum removes exactly the dead files of a partially-referenced
  leaf and keeps the live ones;
- read() plans one scan per live commit root, warns past
  max_read_roots, and optimize_partitions collapses the width.
"""

from __future__ import annotations

import os
import threading
import warnings

import pytest

# every test in this module runs twice: once on the POSIX data
# plane (LocalFSStorage) and once on object-store semantics
# (BlobStorage + conditional-PUT commit log) — see conftest
pytestmark = pytest.mark.usefixtures("wap_storage_backend")
from pyspark.sql import functions as F

from etl_reporting_spark.operators.merge import merge_partition_files
from etl_reporting_spark.operators.wap import (
    AuditError,
    ConcurrentWriteError,
    PartitionedWapTable,
    create_partitioned_wap_table,
    optimize_partitions,
    table_changes,
)

DAY1, DAY2 = "ds=2026-01-01", "ds=2026-01-02"


@pytest.fixture()
def ftable(spark, tmp_path) -> PartitionedWapTable:
    """120 rows over two days; day-1 written as 4 range files over id
    (1..100), so per-file id stats give disjoint ranges."""
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


def test_narrow_upsert_rewrites_strict_file_subset(spark, ftable):
    before = ftable.partition_files(DAY1)
    assert len(before) >= 3
    sel = ftable.files_intersecting(DAY1, "id", 5, 5)
    assert len(sel) == 1  # per-file range stats pick one file

    src = spark.createDataFrame(
        [(5, "2026-01-01", 999.0), (1000, "2026-01-01", 1.0)],
        "id long, ds string, amount double",
    )
    res = merge_partition_files(
        spark, ftable.path, DAY1, src, keys=["id"], stats_col="id"
    )
    assert res.rows_updated == 1 and res.rows_inserted == 1
    after = ftable.partition_files(DAY1)
    # strict subset rewritten: the untouched files are THE SAME paths
    kept = set(before) & set(after)
    assert len(set(before) - set(after)) >= 1
    assert len(kept) == len(before) - len(
        ftable.files_intersecting(DAY1, "id", 5, 1000, version=1)
    )
    for f in kept:  # still on disk, byte-identical pointer
        assert os.path.exists(os.path.join(ftable.path, f))
    # day 2 untouched at the record level
    assert ftable.partition_map()[DAY2] == ftable.partition_map(1)[DAY2]
    # content correct
    out = ftable.read()
    assert out.count() == 121
    assert out.filter(F.col("id") == 5).collect()[0]["amount"] == 999.0


def test_stats_col_must_be_a_key(spark, ftable):
    src = spark.createDataFrame(
        [(5, "2026-01-01", 0.0)], "id long, ds string, amount double"
    )
    with pytest.raises(ValueError, match="merge keys"):
        merge_partition_files(
            spark, ftable.path, DAY1, src, keys=["id"], stats_col="amount"
        )


def test_write_outside_partition_is_an_audit_error(spark, ftable):
    stray = spark.createDataFrame(
        [(5, "2026-01-03", 0.0)], "id long, ds string, amount double"
    )
    files = ftable.partition_files(DAY1)[:1]
    roots_before = sorted(
        d for d in os.listdir(ftable.path) if d.startswith("d-")
    )
    with pytest.raises(AuditError, match="other partitions"):
        ftable.commit_partition_files(stray, DAY1, replace_files=files)
    assert (
        sorted(d for d in os.listdir(ftable.path) if d.startswith("d-"))
        == roots_before
    )  # orphan root cleaned


def test_disjoint_file_writers_both_land(spark, ftable):
    files = ftable.partition_files(DAY1)
    f_lo = ftable.files_intersecting(DAY1, "id", 5, 5)
    f_hi = ftable.files_intersecting(DAY1, "id", 95, 95)
    assert set(f_lo).isdisjoint(f_hi) and f_lo and f_hi

    def upsert(key, amount):
        src = spark.createDataFrame(
            [(key, "2026-01-01", amount)], "id long, ds string, amount double"
        )
        merge_partition_files(
            spark, ftable.path, DAY1, src, keys=["id"], stats_col="id"
        )

    errs = []
    ts = [
        threading.Thread(target=lambda: upsert(5, 555.0)),
        threading.Thread(target=lambda: upsert(95, 955.0)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert ftable.current_version() == 3  # both committed (one rebased)
    out = ftable.read()
    assert out.filter(F.col("id") == 5).collect()[0]["amount"] == 555.0
    assert out.filter(F.col("id") == 95).collect()[0]["amount"] == 955.0
    # only the two touched files changed across both commits
    assert len(set(files) & set(ftable.partition_files(DAY1))) == len(files) - 2


def test_overlapping_file_writers_one_winner(spark, ftable):
    target = ftable.files_intersecting(DAY1, "id", 5, 5)
    sub = ftable.read_files(target)

    def commit():
        ftable.commit_partition_files(
            sub.withColumn("amount", F.col("amount") + 1),
            DAY1,
            replace_files=target,
            base_version=1,
        )

    results = []

    def run():
        try:
            commit()
            results.append("ok")
        except ConcurrentWriteError:
            results.append("conflict")

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) == ["conflict", "ok"]
    assert ftable.current_version() == 2


def test_vacuum_partial_leaf_keeps_live_files(spark, ftable):
    before = ftable.partition_files(DAY1)
    src = spark.createDataFrame(
        [(5, "2026-01-01", 999.0)], "id long, ds string, amount double"
    )
    merge_partition_files(
        spark, ftable.path, DAY1, src, keys=["id"], stats_col="id"
    )
    dead = sorted(set(before) - set(ftable.partition_files(DAY1)))
    assert dead
    removed = ftable.vacuum(keep_last=1, min_age_seconds=0.0)
    assert set(dead) <= set(removed)
    for f in ftable.partition_files(DAY1):
        assert os.path.exists(os.path.join(ftable.path, f))
    assert ftable.read().count() == 120  # snapshot intact post-vacuum


def test_change_feed_tracks_file_granular_churn(spark, ftable):
    src = spark.createDataFrame(
        [(5, "2026-01-01", 999.0)], "id long, ds string, amount double"
    )
    res = merge_partition_files(
        spark, ftable.path, DAY1, src, keys=["id"], stats_col="id"
    )
    ch = table_changes(ftable, keys=["id"], from_version=1, to_version=res.version)
    got = sorted((r["_change_type"], r["id"]) for r in ch.collect())
    assert got == [("update_postimage", 5), ("update_preimage", 5)]


def test_plan_width_guard_and_compaction(spark, tmp_path):
    """Item #8: live_commit_roots grows with uncompacted commits,
    read() warns past max_read_roots, optimize_partitions collapses
    both the root count and the plan's scan count."""
    df = spark.createDataFrame(
        [(1, "2026-01-01", 1.0)], "id long, ds string, amount double"
    )
    t = create_partitioned_wap_table(spark, str(tmp_path / "w"), df, ["ds"])
    t.max_read_roots = 4
    for i in range(2, 8):
        day = spark.createDataFrame(
            [(i, f"2026-01-{i:02d}", float(i))], "id long, ds string, amount double"
        )
        t.commit_partitions(day)
    assert len(t.live_commit_roots()) == 7
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t.read().count()
    assert any("live commit roots" in str(x.message) for x in w)

    optimize_partitions(t)
    assert len(t.live_commit_roots()) == 1
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        df2 = t.read()
        n = df2.count()
    assert n == 7 and not any("live commit roots" in str(x.message) for x in w)
    # the executed plan scans through ONE source after compaction
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_change_feed_reads_only_churned_files(spark, ftable):
    """CDF ∝ FILE churn: after a one-file upsert into a 4-file
    partition, the diff's input files are exactly the replaced file
    (old side) + its replacements (new side) — retained files and the
    untouched partition are never planned."""
    src = spark.createDataFrame(
        [(5, "2026-01-01", 999.0)], "id long, ds string, amount double"
    )
    res = merge_partition_files(
        spark, ftable.path, DAY1, src, keys=["id"], stats_col="id"
    )
    before = set(ftable.partition_files(DAY1, version=1))
    after = set(ftable.partition_files(DAY1, version=res.version))
    churn = (before - after) | (after - before)
    ch = table_changes(ftable, keys=["id"], from_version=1, to_version=res.version)
    planned = {
        os.path.relpath(p.replace("file:", ""), ftable.path)
        for p in ch.inputFiles()
    }
    assert planned == churn
    assert len(planned) < len(before)  # strictly fewer than the partition


def test_clustered_compaction_restores_file_skipping(spark, tmp_path):
    """optimize_partitions(cluster_by=...): an append-churned
    partition whose files all span the full key range (every file
    selected for any key) is rewritten range-clustered, after which a
    point lookup selects ONE file again — the maintenance loop that
    keeps merge_partition_files cheap."""
    import random

    rng = random.Random(7)
    ids = list(range(1, 101))
    rng.shuffle(ids)
    rows = [(i, "2026-01-01", float(i)) for i in ids]
    # 4 files, ids interleaved -> every file spans ~the whole range
    df = spark.createDataFrame(
        rows, "id long, ds string, amount double"
    ).repartition(4)
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "c"), df, ["ds"], stats_cols=["id"]
    )
    churned = t.files_intersecting(DAY1, "id", 5, 5)
    assert len(churned) > 1  # interleaved layout: stats select many

    v = optimize_partitions(t, n_files=4, cluster_by=["id"])
    assert t.current_version() == v
    assert len(t.partition_files(DAY1)) >= 3  # still multiple files
    assert len(t.files_intersecting(DAY1, "id", 5, 5)) == 1  # tight ranges
    assert t.read().count() == 100  # content identical


def test_zorder_compaction_selective_on_every_clustered_column(spark, tmp_path):
    """Round-9 multi-column Z-ORDER: compact a 32x32 (x, y) grid into
    8 files twice — lexicographic cluster_by (the old path) and
    zorder=True — and compare file skipping via the recorded per-file
    stats. Lexicographic files are selective on the leading column
    only (a y-range hits EVERY file); Morton files are selective on
    BOTH axes. Content must be identical either way."""
    from etl_reporting_spark.operators.wap import (
        create_partitioned_wap_table,
        optimize_partitions,
    )

    rows = [(32 * yy + xx, "d1", xx, yy) for xx in range(32) for yy in range(32)]
    df = spark.createDataFrame(rows, "id long, ds string, x long, y long")

    def build(path, **kw):
        t = create_partitioned_wap_table(spark, path, df, ["ds"])
        optimize_partitions(
            t, n_files=8, cluster_by=["x", "y"], stats_cols=["x", "y"], **kw
        )
        return t

    lex = build(str(tmp_path / "lex"))
    zed = build(str(tmp_path / "zed"), zorder=True)
    for t in (lex, zed):
        assert t.read().count() == 1024
        assert sorted(
            (r["x"], r["y"]) for r in t.read().select("x", "y").collect()
        ) == sorted((xx, yy) for xx in range(32) for yy in range(32))

    def n_files_hit(t, col, lo, hi):
        return len(t.files_intersecting("ds=d1", col, lo=lo, hi=hi))

    total = len(lex.partition_files("ds=d1"))
    assert total == 8 and len(zed.partition_files("ds=d1")) == 8

    # leading column: both layouts skip
    assert n_files_hit(lex, "x", 0, 7) < total
    assert n_files_hit(zed, "x", 0, 7) < total
    # trailing column: lexicographic hits EVERY file; z-order skips —
    # the property that makes multi-dim point lookups O(few files)
    assert n_files_hit(lex, "y", 0, 7) == total
    assert n_files_hit(zed, "y", 0, 7) < total
    # and z-order still prunes hard on a narrow 2-D box
    both = set(
        zed.files_intersecting("ds=d1", "x", 0, 7)
    ) & set(zed.files_intersecting("ds=d1", "y", 0, 7))
    assert len(both) <= total // 2


def test_zorder_key_is_exact_and_bounded(spark):
    """zorder_key unit vectors: interleave of 2-bit levels matches the
    hand-computed Morton order, NULLs map to level 0, and the
    bit-budget guard trips."""
    import pytest as _pytest

    from etl_reporting_spark.operators.wap import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (None, 3)], "x int, y int"
    )
    out, key = zorder_key(df, ["x", "y"], bits=2)
    got = {
        (r["x"], r["y"]): r["z"]
        for r in out.select("x", "y", key.alias("z")).collect()
    }
    # bits of x land at even positions, y at odd: z = interleave(x, y)
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101          # x bits at 0 and 2
    assert got[(0, 3)] == 0b1010          # y bits at 1 and 3
    assert got[(3, 3)] == 0b1111
    assert got[(None, 3)] == 0b1010       # NULL -> level 0
    with _pytest.raises(ValueError):
        zorder_key(df, ["x"] * 4, bits=16)  # 64 bits > 62


def test_zorder_temporal_columns_skip_files(spark, tmp_path):
    """Round-10 brief #4: DATE (and TIMESTAMP) columns are first-class
    z-order keys — the reference's hottest predicates are date
    cutoffs. A (event_date, user_key) fact z-ordered into 8 files
    must skip files on a date range AND on a user range, where the
    lexicographic layout skips only its leading column; content
    identical either way."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_reporting_spark.operators.wap import (
        create_partitioned_wap_table,
        optimize_partitions,
    )

    rows = [
        (32 * d + u, "d1", dt.date(2026, 1, 1) + dt.timedelta(days=d), u)
        for d in range(32)
        for u in range(32)
    ]
    df = spark.createDataFrame(
        rows, "id long, ds string, event_date date, user_key long"
    )

    def build(path, **kw):
        t = create_partitioned_wap_table(spark, path, df, ["ds"])
        optimize_partitions(
            t, n_files=8, cluster_by=["event_date", "user_key"],
            stats_cols=["event_date", "user_key"], **kw
        )
        return t

    lex = build(str(tmp_path / "lex"))
    zed = build(str(tmp_path / "zed"), zorder=True)
    for t in (lex, zed):
        assert t.read().count() == 1024
    total = len(zed.partition_files("ds=d1"))
    assert total == 8

    def hit(t, col, lo, hi):
        return len(t.files_intersecting("ds=d1", col, lo=lo, hi=hi))

    d0, d1 = "2026-01-01", "2026-01-08"
    # leading (date) range: both layouts skip
    assert hit(lex, "event_date", d0, d1) < total
    assert hit(zed, "event_date", d0, d1) < total
    # trailing (user_key) range: lex hits EVERY file; z-order skips
    assert hit(lex, "user_key", 0, 7) == total
    assert hit(zed, "user_key", 0, 7) < total
    # narrow (date, user) box prunes hard
    both = set(zed.files_intersecting("ds=d1", "event_date", d0, d1)) & set(
        zed.files_intersecting("ds=d1", "user_key", 0, 7)
    )
    assert len(both) <= total // 2
    # and rows survive the round trip in date form
    assert (
        zed.read().filter(F.col("event_date") == dt.date(2026, 1, 3)).count()
        == 32
    )


def test_zorder_wide_span_is_overflow_safe(spark):
    """Round-10 ADVICE fix: the old `(v-lo)*65535 DIV span` wrapped
    signed-64 when span exceeded ~2^47, silently scrambling the key.
    Micros-since-epoch timestamps (span ~1.7e15 for modern data) and
    an explicit 2^55-span bigint column must now produce levels that
    are bounded and MONOTONIC in the input."""
    import datetime as dt

    from etl_reporting_spark.operators.skew import zorder_key

    # timestamp column spanning ~56 years of micros (≈1.7e15 > 2^47)
    ts = [
        dt.datetime(1970, 1, 5), dt.datetime(1999, 12, 31),
        dt.datetime(2010, 6, 15), dt.datetime(2026, 2, 1),
    ]
    big = [0, 1 << 40, 1 << 50, 1 << 55]  # span 2^55 >> 2^47
    rows = list(zip(range(4), ts, big))
    df = spark.createDataFrame(rows, "i long, t timestamp, b long")
    _, key = zorder_key(df, ["t", "b"], bits=16)
    got = [
        r["z"] for r in
        df.select("i", key.alias("z")).orderBy("i").collect()
    ]
    assert all(0 <= z < (1 << 32) for z in got)  # 2 cols x 16 bits
    # rows are ordered in BOTH columns simultaneously, so the Morton
    # key must be strictly increasing — the wrapped key scrambles it
    assert got == sorted(got) and len(set(got)) == 4

    # single wide column: levels spread across the full bit range,
    # not collapsed (top value maps near 2^16-1 after interleave)
    _, key1 = zorder_key(df, ["b"], bits=16)
    lv = [r["z"] for r in df.select("i", key1.alias("z")).orderBy("i").collect()]
    assert lv == sorted(lv) and lv[0] == 0 and lv[-1] >= (1 << 15)


def test_maintenance_plan_recommends_and_auto_optimize_applies_zorder(
    spark, tmp_path
):
    """Round-10 brief #4: per-file stats showing overlapping ranges
    on BOTH stat'd columns of a multi-file partition make
    maintenance_plan propose a z-order rewrite naming those columns;
    auto_optimize adopts the advice when the caller didn't pin a
    layout, and the re-diagnosis no longer proposes it."""
    import datetime as dt

    from etl_reporting_spark.operators.wap import (
        auto_optimize,
        create_partitioned_wap_table,
        maintenance_plan,
    )

    # hash-partitioned write: every one of the 8 files covers nearly
    # the full (event_date, user_key) range -> maximally overlapping
    rows = [
        (32 * d + u, "d1", dt.date(2026, 1, 1) + dt.timedelta(days=d), u)
        for d in range(32)
        for u in range(32)
    ]
    df = spark.createDataFrame(
        rows, "id long, ds string, event_date date, user_key long"
    ).repartition(8)
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "fact"), df, ["ds"],
        stats_cols=["event_date", "user_key"],
    )

    plan = maintenance_plan(t, max_files_per_partition=16)
    zrecs = [a for a in plan["actions"] if a.get("zorder")]
    assert zrecs, plan["actions"]
    assert zrecs[0]["zorder"] == ["event_date", "user_key"]
    assert zrecs[0]["partitions"] == ["ds=d1"]

    out = auto_optimize(t, max_files_per_partition=16, n_files=8)
    assert any(a["action"] == "compact" for a in out["applied"])
    # advice consumed: the z-ordered rewrite's own stats no longer
    # trip the overlap heuristic
    assert not [a for a in out["after"]["actions"] if a.get("zorder")]
    assert "unadopted_zorder" not in out
    assert t.read().count() == 1024
    # and the adopted layout actually skips on the trailing column
    assert len(
        t.files_intersecting("ds=d1", "user_key", lo=0, hi=7)
    ) < len(t.partition_files("ds=d1"))


def test_auto_optimize_surfaces_unadopted_zorder_advice(spark, tmp_path):
    """When the caller PINS cluster_by, the planner's z-order advice
    is not adopted — a lexicographic rewrite doesn't clear the
    multi-column overlap, so the trigger re-fires in ``after``. The
    scoped postcondition: the run reports the advice it could not
    take via the top-level ``unadopted_zorder`` key instead of
    pretending the plan converged."""
    import datetime as dt

    from etl_reporting_spark.operators.wap import (
        auto_optimize,
        create_partitioned_wap_table,
    )

    # salt is uncorrelated with both stat'd columns, so a rewrite
    # clustered on it leaves (event_date, user_key) fully overlapping
    rows = [
        (
            32 * d + u,
            "d1",
            dt.date(2026, 1, 1) + dt.timedelta(days=d),
            u,
            ((32 * d + u) * 2654435761) % (1 << 32),
        )
        for d in range(32)
        for u in range(32)
    ]
    df = spark.createDataFrame(
        rows, "id long, ds string, event_date date, user_key long, salt long"
    ).repartition(8)
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "fact"), df, ["ds"],
        stats_cols=["event_date", "user_key"],
    )
    out = auto_optimize(
        t, max_files_per_partition=16, n_files=8,
        cluster_by=["salt"],  # pinned: advice must NOT override
        stats_cols=["event_date", "user_key"],
    )
    assert out["unadopted_zorder"] == ["event_date", "user_key"]
    # the pinned layout ran...
    assert any(a["action"] == "compact" for a in out["applied"])
    assert t.read().count() == 1024
    # ...and the overlap trigger legitimately re-fires — the scoped
    # postcondition names this the one after-is-not-empty case
    assert [a for a in out["after"]["actions"] if a.get("zorder")]
