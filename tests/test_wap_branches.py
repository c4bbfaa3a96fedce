"""Named branches over the WAP commit log — pipeline-level
Write-Audit-Publish (stage a batch of mutations on a branch, validate
there, publish atomically), the pattern the reference runs as
stage-in-transient-then-MERGE (connector/snowpark_connector.py:607-688
``upsert``) and Iceberg spells as branch refs + fast-forward.

What must hold, on both storage backends:
- a branch handle is a full table (merge, DV delete, append,
  constraints all work) whose commits main readers NEVER see;
- publish replays the branch onto main REBASED: disjoint main
  progress since the fork is preserved verbatim; overlapping progress
  refuses with the partitions named;
- vacuum on main keeps every file a live branch references;
- drop releases the pins and the branch's roots age out normally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.operators.branches import (
    create_branch,
    drop_branch,
    open_branch,
    publish_branch,
    registered_branches,
)
from etl_reporting_spark.operators.wap import (
    ConcurrentWriteError,
    create_partitioned_wap_table,
)

pytestmark = pytest.mark.usefixtures("wap_storage_backend")


def _fact(spark):
    rows = [(i, f"d{i % 3}", float(i * 10)) for i in range(1, 13)]
    return spark.createDataFrame(rows, "id long, ds string, amount double")


@pytest.fixture()
def table(spark, tmp_path):
    return create_partitioned_wap_table(
        spark, str(tmp_path / "fact"), _fact(spark), ["ds"]
    )


def test_branch_commits_are_invisible_to_main(spark, table):
    br = create_branch(spark, table.path, "audit")
    assert registered_branches(table)[0]["name"] == "audit"
    delta = spark.createDataFrame(
        [(4, "d1", 999.0), (100, "d1", 1.0)], "id long, ds string, amount double"
    )
    br.upsert_rows_dv(delta, keys=["id"])
    br.delete_rows("id = 7")
    # the branch sees its own world...
    got = {r["id"]: r["amount"] for r in br.read().collect()}
    assert got[4] == 999.0 and got[100] == 1.0 and 7 not in got
    # ...main sees nothing
    main = {r["id"]: r["amount"] for r in table.read().collect()}
    assert main[4] == 40.0 and 100 not in main and 7 in main
    assert table.current_version() == 1
    # shared history below the fork resolves through the branch handle
    assert br.read(version=1).count() == 12


def test_publish_fast_forwards_disjoint_main_progress(spark, table):
    """Main advances in d0 while the branch mutates d1/d2: publish
    preserves BOTH (the rebase keeps main's d0 pointer verbatim)."""
    br = create_branch(spark, table.path, "wap")
    br.upsert_rows_dv(
        spark.createDataFrame(
            [(4, "d1", 999.0)], "id long, ds string, amount double"
        ),
        keys=["id"],
    )
    br.delete_rows("id = 5")  # d2
    # disjoint main progress AFTER the fork
    table.commit_partitions(
        spark.createDataFrame(
            [(300, "d0", 7.0)], "id long, ds string, amount double"
        ),
        operation="merge",
    )
    tip = publish_branch(spark, table.path, "wap")
    assert tip == table.current_version()
    got = {r["id"]: r["amount"] for r in table.read().collect()}
    assert got[4] == 999.0        # branch update landed
    assert 5 not in got           # branch DV delete landed
    assert got[300] == 7.0        # main's disjoint progress preserved
    # registration dropped; the replayed records carry provenance
    assert registered_branches(table) == []
    assert table.latest_record()["branch_published_from"] == "wap"


def test_publish_refuses_overlapping_main_progress(spark, table):
    br = create_branch(spark, table.path, "conflicted")
    br.upsert_rows_dv(
        spark.createDataFrame(
            [(4, "d1", 999.0)], "id long, ds string, amount double"
        ),
        keys=["id"],
    )
    # main touches the SAME partition after the fork
    table.commit_partitions(
        spark.createDataFrame(
            [(400, "d1", 8.0)], "id long, ds string, amount double"
        ),
        operation="merge",
    )
    with pytest.raises(ConcurrentWriteError, match="d1"):
        publish_branch(spark, table.path, "conflicted")
    # nothing half-published; the branch is still live for re-fork
    assert registered_branches(table)[0]["name"] == "conflicted"
    assert "branch_published_from" not in table.latest_record()


def test_publish_refuses_overwrite_when_main_progressed(spark, table):
    """A branch commit without a touched set whose operation is not a
    replayable metadata class (a full overwrite, a future op this
    version doesn't know) refuses when main made REAL post-fork
    progress — even in a disjoint partition, because the overwrite
    defines the whole table state and would clobber it (round-14:
    with an idle-or-advisory main it replays instead)."""
    br = create_branch(spark, table.path, "meta")
    rec = dict(br._commit_record(1))
    rec.update({"version": 2, "operation": "full_overwrite"})
    rec.pop("touched", None)
    br._publish(rec)
    # disjoint main data progress — still blocks an overwrite
    table.append_rows(
        spark.createDataFrame(
            [(500, "d0", 7.0)], "id long, ds string, amount double"
        )
    )
    with pytest.raises(ConcurrentWriteError, match="full-overwrite"):
        publish_branch(spark, table.path, "meta")
    # nothing half-published; the branch stays live
    assert registered_branches(table)[0]["name"] == "meta"


def test_publish_overwrite_on_idle_main_equals_main_direct(spark, table):
    """Round-14 (VERDICT r13 #2a): a full rebuild staged on a branch
    publishes onto an IDLE main deterministically — the other half of
    the reference's stage-then-publish upsert. Composed here as a touched
    rebuild commit followed by a synthetic no-touched overwrite (the
    shape an external/older writer produces), so the replay loop
    exercises both paths in order."""
    br = create_branch(spark, table.path, "rebuild")
    new = spark.createDataFrame(
        [(101, "d0", 5.0), (102, "d1", 6.0)],
        "id long, ds string, amount double",
    )
    br.commit_partitions(
        new, replace=sorted(table.partition_map()), operation="rebuild"
    )
    rec = dict(br._commit_record(2))
    rec.pop("touched", None)
    rec.update({"version": 3, "operation": "full_overwrite"})
    br._publish(rec)
    tip = publish_branch(spark, table.path, "rebuild")
    got = sorted(
        map(tuple, table.read(version=tip).select("id", "amount").collect())
    )
    assert got == [(101, 5.0), (102, 6.0)]
    final = table._commit_record(tip)
    assert final["operation"] == "full_overwrite"
    assert final["branch_published_from"] == "rebuild"
    assert final["branch_replayed_version"] == 3


def test_publish_overwrite_commutes_with_main_analyze(spark, table):
    """Advisory main-side stats refreshes don't block an overwrite
    publish, and main's NEWER table_stats survive it (sticky
    inheritance — the overwrite record must not revert them)."""
    from etl_reporting_spark.operators.stats import collect_table_stats

    br = create_branch(spark, table.path, "rebuild2")
    rec = dict(br._commit_record(1))
    rec.update({"version": 2, "operation": "full_overwrite"})
    rec.pop("touched", None)
    br._publish(rec)
    v_stats = collect_table_stats(table)
    main_stats = table._commit_record(v_stats)["table_stats"]
    tip = publish_branch(spark, table.path, "rebuild2")
    final = table._commit_record(tip)
    assert final["operation"] == "full_overwrite"
    assert final["table_stats"] == main_stats
    assert table.read(version=tip).count() == 12


def test_publish_replays_branch_constraint(spark, table):
    """Round-13: a constraint ADDED on the branch replays onto main at
    publish (re-validated against main's actual data), composing with
    branch data commits around it."""
    br = create_branch(spark, table.path, "gate13")
    br.add_check_constraint("amt_pos", "amount >= 0")
    br.append_rows(
        spark.createDataFrame(
            [(800, "d0", 8.0)], "id long, ds string, amount double"
        )
    )
    tip = publish_branch(spark, table.path, "gate13")
    assert table.check_constraints() == {"amt_pos": "amount >= 0"}
    assert table.read(version=tip).filter("id = 800").count() == 1
    # the replayed constraint GATES main writes from here on
    from etl_reporting_spark.operators.wap import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        table.append_rows(
            spark.createDataFrame(
                [(801, "d0", -1.0)], "id long, ds string, amount double"
            )
        )


def test_publish_replay_validates_constraint_against_main_data(
    spark, table
):
    """Main lands a violating row (disjoint partition) after the fork;
    the branch's add_constraint must REFUSE at publish — main's
    post-fork rows were never screened by the branch's gate."""
    from etl_reporting_spark.operators.wap import ConstraintViolation

    br = create_branch(spark, table.path, "strict")
    br.add_check_constraint("amt_small", "amount < 500")
    table.commit_partitions(
        spark.createDataFrame(
            [(900, "d0", 999.0)], "id long, ds string, amount double"
        ),
        operation="merge",
    )
    with pytest.raises(ConstraintViolation):
        publish_branch(spark, table.path, "strict")
    # nothing half-published and the branch is still live
    assert registered_branches(table)[0]["name"] == "strict"


def test_publish_replays_branch_constraint_drop(spark, table):
    table.add_check_constraint("amt_pos", "amount >= 0")
    br = create_branch(spark, table.path, "undrop")
    br.drop_check_constraint("amt_pos")
    publish_branch(spark, table.path, "undrop")
    assert table.check_constraints() == {}


def test_main_analyze_no_longer_bricks_publish(spark, table):
    """Round-13 (VERDICT #1b): a routine ANALYZE on main between fork
    and publish commutes — publish proceeds and main's NEWER stats
    survive the replay instead of reverting to the fork-era copy."""
    from etl_reporting_spark.operators.stats import collect_table_stats

    br = create_branch(spark, table.path, "anlz")
    br.upsert_rows_dv(
        spark.createDataFrame(
            [(4, "d1", 999.0)], "id long, ds string, amount double"
        ),
        keys=["id"],
    )
    v_stats = collect_table_stats(table)
    main_stats = table._commit_record(v_stats)["table_stats"]
    tip = publish_branch(spark, table.path, "anlz")
    assert table.read(version=tip).filter("id = 4").first()["amount"] == 999.0
    # main's analyze survived the data-commit replay (sticky inherit)
    assert table._commit_record(tip)["table_stats"] == main_stats


def test_branch_analyze_replays_as_advisory_stats(spark, table):
    from etl_reporting_spark.operators.stats import collect_table_stats

    br = create_branch(spark, table.path, "banlz")
    br.append_rows(
        spark.createDataFrame(
            [(850, "d2", 5.0)], "id long, ds string, amount double"
        )
    )
    collect_table_stats(br)
    tip = publish_branch(spark, table.path, "banlz")
    ts = table._commit_record(tip).get("table_stats")
    assert ts and ts["row_count"] == 13  # fork's 12 + the branch append


def test_vacuum_keeps_live_branch_files(spark, table):
    """Aggressive main vacuum must not collect the files a live
    branch's commits reference; after drop_branch they age out."""
    br = create_branch(spark, table.path, "pinned")
    br.commit_partitions(
        spark.createDataFrame(
            [(500, "d1", 5.0)], "id long, ds string, amount double"
        ),
        operation="merge",
    )
    # advance main so the vacuum window moves past the fork era
    for i in range(3):
        table.commit_partitions(
            spark.createDataFrame(
                [(600 + i, "d0", 6.0)], "id long, ds string, amount double"
            ),
            operation="merge",
        )
    table.vacuum(keep_last=1, min_age_seconds=0.0)
    # the branch still reads completely (its d1 rewrite + inherited d2)
    got = {r["id"] for r in br.read().collect()}
    assert 500 in got
    # after dropping, a fresh vacuum may reclaim the branch's root
    drop_branch(spark, table.path, "pinned")
    removed = table.vacuum(keep_last=1, min_age_seconds=0.0)
    assert removed  # something branch-only (or superseded) went


def test_branch_constraints_and_append_compose(spark, table):
    from etl_reporting_spark.operators.wap import ConstraintViolation

    table.add_check_constraint("amt_pos", "amount >= 0")
    br = create_branch(spark, table.path, "gated")
    # the branch inherits the fork-era constraint set
    bad = spark.createDataFrame(
        [(700, "d0", -1.0)], "id long, ds string, amount double"
    )
    with pytest.raises(ConstraintViolation):
        br.append_rows(bad)
    ok = spark.createDataFrame(
        [(700, "d0", 1.0)], "id long, ds string, amount double"
    )
    br.append_rows(ok)
    tip = publish_branch(spark, table.path, "gated")
    assert table.read(version=tip).filter("id = 700").count() == 1
    # main's constraint survived the publish (sticky carry on replay)
    assert table.check_constraints() == {"amt_pos": "amount >= 0"}


def test_branch_hygiene(spark, table):
    with pytest.raises(ValueError, match="identifier"):
        create_branch(spark, table.path, "no spaces!")
    create_branch(spark, table.path, "dup")
    with pytest.raises(FileExistsError):
        create_branch(spark, table.path, "dup")
    with pytest.raises(FileNotFoundError):
        open_branch(spark, table.path, "never")
    with pytest.raises(ValueError, match="fork"):
        create_branch(spark, table.path, "deep", at_version=99)
    # publishing an empty branch is a no-op fast-forward
    v = table.current_version()
    assert publish_branch(spark, table.path, "dup") == v


def test_branch_on_hidden_partitioned_table(spark, tmp_path):
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        HiddenPartitionedWapTable,
        create_hidden_partitioned_wap_table,
    )

    rows = [
        (i, dt.date(2026, 1 + (i % 3), 5), float(i)) for i in range(1, 10)
    ]
    t = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "hid"),
        spark.createDataFrame(rows, "id int, ds date, amt double"),
        ["months(ds)"],
    )
    br = create_branch(spark, t.path, "hb")
    assert isinstance(br, HiddenPartitionedWapTable)
    br.upsert_rows_dv(
        spark.createDataFrame(
            [(99, dt.date(2026, 2, 10), 9.0)], "id int, ds date, amt double"
        ),
        keys=["id"],
    )
    assert t.read().filter("id = 99").count() == 0  # invisible on main
    publish_branch(spark, t.path, "hb")
    assert t.read().filter("id = 99").count() == 1
    # published rows stay prunable through the spec
    assert t.read_pruned("ds", eq=dt.date(2026, 2, 10)).filter(
        "id = 99"
    ).count() == 1


def test_branch_on_spec_evolved_table_cross_era_merge(spark, tmp_path):
    """Round-12 interaction: a branch forked AFTER a spec evolution
    runs a CROSS-ERA DV merge (its match scope must find old-era
    residents through the layered commit store), stays invisible to
    main, and publishes — with the old-era masked partition in the
    replayed touched set so conflict screening keeps covering it."""
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    rows0 = [
        (i, dt.date(2026, 1, 1 + i), float(i)) for i in range(1, 8)
    ]
    t = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "evo"),
        spark.createDataFrame(rows0, "id int, ds date, amt double"),
        ["days(ds)"],
    )
    t.evolve_partition_spec(["months(ds)"])
    t.append_rows(
        spark.createDataFrame(
            [(100, dt.date(2026, 3, 10), 100.0)],
            "id int, ds date, amt double",
        )
    )
    br = create_branch(spark, t.path, "evb")
    # id 3 lives in an era-0 DAY partition; the branch merge must
    # retract it there, not duplicate
    br.upsert_rows_dv(
        spark.createDataFrame(
            [(3, dt.date(2026, 1, 4), 333.0)], "id int, ds date, amt double"
        ),
        keys=["id"],
    )
    assert br.read().filter("id = 3").first()["amt"] == 333.0
    assert br.read().count() == 8  # no duplicate on the branch
    assert t.read().filter("id = 3").first()["amt"] == 3.0  # main unseen
    publish_branch(spark, t.path, "evb")
    assert t.read().filter("id = 3").first()["amt"] == 333.0
    assert t.read().count() == 8
    rec = t._commit_record(t.current_version())
    assert any(k.startswith("_p_ds_days=") for k in rec["touched"])
    # era attribution still intact after the publish: pruned range
    # read over the era boundary equals the residual-filtered scan
    lo, hi = dt.date(2026, 1, 3), dt.date(2026, 3, 31)
    assert (
        t.read_pruned("ds", lo=lo, hi=hi).count()
        == t.read().filter((F.col("ds") >= lo) & (F.col("ds") <= hi)).count()
    )


def test_branch_dv_update_publishes(spark, tmp_path):
    """Round-12: the DV UPDATE rung on a BRANCH — invisible to main,
    masked files in the replayed touched set, publish lands it."""
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(1, 11)],
        "k int, bucket int, amt double",
    )
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), df, ["bucket"]
    )
    br = create_branch(spark, t.path, "updbr")
    v, n = br.update_rows_dv("k = 4", {"amt": "444.0"})
    assert n == 1
    assert br.read().filter("k = 4").first()["amt"] == 444.0
    assert t.read().filter("k = 4").first()["amt"] == 4.0  # main unseen
    publish_branch(spark, t.path, "updbr")
    assert t.read().filter("k = 4").first()["amt"] == 444.0
    assert t.read().count() == 10


def test_staged_migration_fork_alter_evolve_merge_publish(
    spark, tmp_path
):
    """Round-13 headline composition (VERDICT #1): the staged-migration
    pattern the reference's stage-then-MERGE loaders implement (reference
    connector/snowpark_connector.py:607-688) — fork, RENAME a column +
    EVOLVE the partition spec + DV-merge ON THE BRANCH, publish — and
    the published table is row-identical to the same operations applied
    directly to main."""
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    rows = [(i, dt.date(2026, 1, 1 + (i % 20)), float(i)) for i in range(1, 31)]
    schema = "id int, ds date, amt double"

    def build(path):
        return create_hidden_partitioned_wap_table(
            spark, path, spark.createDataFrame(rows, schema), ["days(ds)"]
        )

    def migrate(t):
        t.alter_schema(rename={"amt": "amount"})
        t.evolve_partition_spec(["months(ds)"])
        t.append_rows(
            spark.createDataFrame(
                [(100, dt.date(2026, 3, 5), 100.0)],
                "id int, ds date, amount double",
            )
        )
        t.upsert_rows_dv(
            spark.createDataFrame(
                [(3, dt.date(2026, 1, 4), 333.0)],
                "id int, ds date, amount double",
            ),
            keys=["id"],
        )

    # twin A: everything directly on main
    direct = build(str(tmp_path / "direct"))
    migrate(direct)

    # twin B: fork, migrate on the branch, publish
    staged = build(str(tmp_path / "staged"))
    br = create_branch(spark, staged.path, "mig")
    migrate(br)
    # main never saw any of it pre-publish
    assert staged.read().columns == ["id", "ds", "amt"]
    assert staged.read().count() == 30
    publish_branch(spark, staged.path, "mig")

    import re as _re

    from etl_reporting_spark.operators.wap import open_wap_table

    pub = open_wap_table(spark, staged.path)
    a = sorted(map(tuple, direct.read().select("id", "ds", "amount").collect()))
    b = sorted(map(tuple, pub.read().select("id", "ds", "amount").collect()))
    assert a == b and len(a) == 31
    assert pub.read().filter("id = 3").first()["amount"] == 333.0
    # the published table carries the evolved spec + the name chain
    rec = pub._commit_record(pub.current_version())
    assert rec.get("prior_names") == {"amount": ["amt"]}
    assert len(rec.get("partition_spec_history", [])) == 2
    # era-aware prune still works post-publish across the boundary
    lo, hi = dt.date(2026, 1, 3), dt.date(2026, 3, 31)
    assert (
        pub.read_pruned("ds", lo=lo, hi=hi).count()
        == pub.read()
        .filter((F.col("ds") >= lo) & (F.col("ds") <= hi))
        .count()
    )
    del _re


def test_publish_crash_midway_then_rerun_completes(spark, tmp_path):
    """Round-13 crash-window recovery: a publish interrupted BETWEEN
    replays leaves a marked prefix on main; re-running publish_branch
    skips what already landed (markers: branch_published_from +
    branch_created_at + branch_replayed_version) and completes the
    suffix — including re-executed metadata commits, which would
    otherwise refuse on double-apply (rename of a now-missing column).
    Final state ≡ the same migration applied directly to main."""
    import datetime as dt

    from etl_reporting_spark.operators import wap as wap_mod
    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )
    from etl_reporting_spark.operators.wap import open_wap_table

    rows = [(i, dt.date(2026, 1, 1 + (i % 10)), float(i)) for i in range(1, 21)]
    schema = "id int, ds date, amt double"

    def build(p):
        return create_hidden_partitioned_wap_table(
            spark, p, spark.createDataFrame(rows, schema), ["days(ds)"]
        )

    def migrate(t):
        t.alter_schema(rename={"amt": "amount"})
        t.evolve_partition_spec(["months(ds)"])
        t.append_rows(
            spark.createDataFrame(
                [(100, dt.date(2026, 3, 5), 100.0)],
                "id int, ds date, amount double",
            )
        )
        t.upsert_rows_dv(
            spark.createDataFrame(
                [(3, dt.date(2026, 1, 4), 333.0)],
                "id int, ds date, amount double",
            ),
            keys=["id"],
        )

    direct = build(str(tmp_path / "direct"))
    migrate(direct)

    staged = build(str(tmp_path / "staged"))
    br = create_branch(spark, staged.path, "crashmig")
    migrate(br)

    # crash after the SECOND successful publish inside publish_branch
    # (i.e. mid-replay: rename + evolve landed, append/merge did not)
    real_publish = wap_mod.WapTable._publish
    state = {"n": 0}

    def crashing(self, record):
        real_publish(self, record)
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("simulated crash between replays")

    wap_mod.WapTable._publish = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            publish_branch(spark, staged.path, "crashmig")
    finally:
        wap_mod.WapTable._publish = real_publish

    # the prefix is on main, marked; the branch is still registered
    assert registered_branches(open_wap_table(spark, staged.path))
    pub = open_wap_table(spark, staged.path)
    prefix_rec = pub._commit_record(pub.current_version())
    assert prefix_rec["branch_published_from"] == "crashmig"
    assert "branch_replayed_version" in prefix_rec

    # recovery is exactly "run it again"
    publish_branch(spark, staged.path, "crashmig")
    pub = open_wap_table(spark, staged.path)
    a = sorted(map(tuple, direct.read().select("id", "ds", "amount").collect()))
    b = sorted(map(tuple, pub.read().select("id", "ds", "amount").collect()))
    assert a == b and len(a) == 21
    assert pub.read().filter("id = 3").first()["amount"] == 333.0
    # and a third run is a no-op fast-forward (everything in done-set)
    v = pub.current_version()
    create_branch(spark, staged.path, "noop13")
    assert publish_branch(spark, staged.path, "noop13") == v


def test_main_constraint_add_validates_branch_rows_at_publish(
    spark, table
):
    """Round-13 continuation: main ADDs a constraint while the branch
    is open — publish no longer refuses; the branch's touched-partition
    content is validated against the gained constraint (the screen its
    rows skipped by being written on the branch)."""
    from etl_reporting_spark.operators.wap import ConstraintViolation

    # clean branch rows pass
    br = create_branch(spark, table.path, "gained_ok")
    br.append_rows(
        spark.createDataFrame(
            [(900, "d0", 5.0)], "id long, ds string, amount double"
        )
    )
    table.add_check_constraint("amt_cap", "amount <= 100000")
    tip = publish_branch(spark, table.path, "gained_ok")
    assert table.read(version=tip).filter("id = 900").count() == 1
    assert "amt_cap" in table.check_constraints()

    # violating branch rows refuse, branch stays live
    br2 = create_branch(spark, table.path, "gained_bad")
    br2.append_rows(
        spark.createDataFrame(
            [(901, "d1", 50000.0)], "id long, ds string, amount double"
        )
    )
    table.add_check_constraint("amt_cap2", "amount <= 10000")
    with pytest.raises(ConstraintViolation):
        publish_branch(spark, table.path, "gained_bad")
    assert registered_branches(table)[0]["name"] == "gained_bad"
    assert table.read().filter("id = 901").count() == 0


def test_main_constraint_drop_commutes_with_branch(spark, table):
    """A DROP on main only relaxes — publish proceeds; and a branch
    that drops the SAME constraint main already dropped commutes
    instead of failing on a missing name."""
    table.add_check_constraint("amt_pos", "amount >= 0")
    br = create_branch(spark, table.path, "relax")
    br.drop_check_constraint("amt_pos")
    br.append_rows(
        spark.createDataFrame(
            [(902, "d2", -5.0)], "id long, ds string, amount double"
        )
    )
    table.drop_check_constraint("amt_pos")  # main drops it too
    publish_branch(spark, table.path, "relax")
    assert table.check_constraints() == {}
    assert table.read().filter("id = 902").count() == 1


def test_publish_crash_at_every_prefix_point_recovers(spark, tmp_path):
    """Exhaustive crash sweep: for EVERY publish-internal commit index
    k, crash after k successful publishes, re-run, and the final state
    must be row-identical to the uninterrupted twin — the idempotence
    claim as a property, not an anecdote (single backend: the sweep is
    storage-agnostic, the markers live in commit records)."""
    import datetime as dt

    from etl_reporting_spark.operators import wap as wap_mod
    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )
    from etl_reporting_spark.operators.wap import open_wap_table

    rows = [(i, dt.date(2026, 1, 1 + (i % 5)), float(i)) for i in range(1, 11)]
    schema = "id int, ds date, amt double"

    def migrate(t):
        t.alter_schema(rename={"amt": "amount"})
        t.evolve_partition_spec(["months(ds)"])
        t.append_rows(
            spark.createDataFrame(
                [(50, dt.date(2026, 4, 2), 50.0)],
                "id int, ds date, amount double",
            )
        )
        t.delete_rows("id = 2")

    direct = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "direct"),
        spark.createDataFrame(rows, schema),
        ["days(ds)"],
    )
    migrate(direct)
    want = sorted(
        map(tuple, direct.read().select("id", "ds", "amount").collect())
    )

    real_publish = wap_mod.WapTable._publish
    # 4 branch commits -> 4 publish-internal commits; sweep each
    for k in (1, 2, 3, 4):
        t = create_hidden_partitioned_wap_table(
            spark,
            str(tmp_path / f"c{k}"),
            spark.createDataFrame(rows, schema),
            ["days(ds)"],
        )
        br = create_branch(spark, t.path, "mig")
        migrate(br)
        state = {"n": 0}

        def crashing(self, record, _k=k, _s=state):
            real_publish(self, record)
            _s["n"] += 1
            if _s["n"] == _k:
                raise RuntimeError(f"crash@{_k}")

        wap_mod.WapTable._publish = crashing
        try:
            with pytest.raises(RuntimeError, match=f"crash@{k}"):
                publish_branch(spark, t.path, "mig")
        finally:
            wap_mod.WapTable._publish = real_publish
        publish_branch(spark, t.path, "mig")  # recovery: run it again
        pub = open_wap_table(spark, t.path)
        got = sorted(
            map(tuple, pub.read().select("id", "ds", "amount").collect())
        )
        assert got == want, f"crash point {k} diverged"


def test_main_rename_commutes_with_branch_data_commits(spark, table):
    """Round-13 continuation: main RENAMEs a column while the branch
    holds data commits under the old name — publish no longer refuses.
    The branch's files serve through the name chain; the replayed
    records carry main's new schema and re-keyed stats."""
    br = create_branch(spark, table.path, "oldname")
    br.upsert_rows_dv(
        spark.createDataFrame(
            [(4, "d1", 999.0)], "id long, ds string, amount double"
        ),
        keys=["id"],
    )
    br.append_rows(
        spark.createDataFrame(
            [(950, "d0", 9.5)], "id long, ds string, amount double"
        )
    )
    table.alter_schema(rename={"amount": "amt_total"})
    tip = publish_branch(spark, table.path, "oldname")
    got = table.read(version=tip)
    assert "amt_total" in got.columns and "amount" not in got.columns
    vals = {r["id"]: r["amt_total"] for r in got.collect()}
    assert vals[4] == 999.0 and vals[950] == 9.5 and len(vals) == 13
    # the replayed tip record carries main's schema + re-keyed stats
    rec = table.latest_record()
    names = [f["name"] for f in rec["schema"]["fields"]]
    assert "amt_total" in names and "amount" not in names
    for pk, cols in (rec.get("stats") or {}).items():
        assert "amount" not in cols


def test_main_drop_column_commutes_with_branch_data(spark, table):
    """Main DROPs a non-key column post-fork: branch data publishes,
    the dropped column stays dropped (projection), stats stripped."""
    br = create_branch(spark, table.path, "dropcol")
    br.append_rows(
        spark.createDataFrame(
            [(960, "d2", 1.0)], "id long, ds string, amount double"
        )
    )
    table.alter_schema(drop=["amount"])
    tip = publish_branch(spark, table.path, "dropcol")
    got = table.read(version=tip)
    assert "amount" not in got.columns
    assert got.filter("id = 960").count() == 1


def test_branch_analyze_rekeys_through_main_rename(spark, table):
    """ADVICE r13: a branch-side ANALYZE replayed under a main-side
    post-fork RENAME must re-key its table_stats column/key dicts
    through the rename (and shed dropped columns) — advisory-only,
    but fork-era names leaking into main's stats degrade planning
    silently."""
    from etl_reporting_spark.operators.stats import collect_table_stats

    br = create_branch(spark, table.path, "anlzrn")
    br.append_rows(
        spark.createDataFrame(
            [(955, "d1", 9.0)], "id long, ds string, amount double"
        )
    )
    collect_table_stats(br)  # records column stats under 'amount'
    table.alter_schema(rename={"amount": "amt_total"})
    tip = publish_branch(spark, table.path, "anlzrn")
    ts = table._commit_record(tip).get("table_stats") or {}
    cols = ts.get("columns") or {}
    assert "amt_total" in cols and "amount" not in cols
    keys = ts.get("keys") or {}
    assert "amount" not in keys


def test_multi_op_constraint_commit_refuses_at_replay(spark, table):
    """ADVICE r13: a (foreign) branch constraint commit whose diff
    spans more than one constraint would emit multiple main commits
    under ONE branch_replayed_version — a crash between them would
    make recovery skip the rest. Replay refuses it instead."""
    br = create_branch(spark, table.path, "multicon")
    rec = dict(br._commit_record(1))
    rec.update(
        {
            "version": 2,
            "operation": "add_constraint",
            "constraints": {"c1": "amount >= 0", "c2": "id >= 0"},
        }
    )
    rec.pop("touched", None)
    br._publish(rec)
    with pytest.raises(ConcurrentWriteError, match="more than one constraint"):
        publish_branch(spark, table.path, "multicon")
    assert registered_branches(table)[0]["name"] == "multicon"


def test_disjoint_schema_changes_compose(spark, table):
    """Round-14 (VERDICT r13 #2b): main AND branch both altered
    schema since the fork, but their column footprints are DISJOINT —
    branch ADDs 'note' (+ data under it) while main RENAMEs amount →
    amt2. The branch's alter re-executes deterministically against
    main's tip, so publish composes both sides instead of refusing."""
    br = create_branch(spark, table.path, "bothalter")
    br.alter_schema(add={"note": "string"})
    br.append_rows(
        spark.createDataFrame(
            [(970, "d0", 2.0, "x")],
            "id long, ds string, amount double, note string",
        )
    )
    table.alter_schema(rename={"amount": "amt2"})
    tip = publish_branch(spark, table.path, "bothalter")
    got = table.read(version=tip)
    assert set(got.columns) == {"id", "ds", "amt2", "note"}
    rows = {r["id"]: r for r in got.collect()}
    assert rows[970]["amt2"] == 2.0 and rows[970]["note"] == "x"
    assert rows[4]["amt2"] == 40.0 and rows[4]["note"] is None
    assert len(rows) == 13
    # the tip record carries BOTH sides' metadata: main's name chain
    # and the branch's added column
    rec = table.latest_record()
    names = [f["name"] for f in rec["schema"]["fields"]]
    assert "amt2" in names and "note" in names and "amount" not in names


def test_overlapping_schema_changes_refuse(spark, table):
    """Both sides renamed the SAME column since the fork: the
    footprints overlap, so re-execution order would decide the
    outcome — refuse with the columns named."""
    br = create_branch(spark, table.path, "clashalter")
    br.alter_schema(rename={"amount": "amt_branch"})
    table.alter_schema(rename={"amount": "amt_main"})
    with pytest.raises(
        ConcurrentWriteError, match="not provably disjoint"
    ):
        publish_branch(spark, table.path, "clashalter")
    assert registered_branches(table)[0]["name"] == "clashalter"


def test_branch_evolve_spec_under_main_alter_refuses(spark, tmp_path):
    """A branch-side evolve-spec replays its recorded spec history
    VERBATIM, which needs main's era history provably identical — a
    main-side schema change breaks that proof, so this pairing stays
    refused even though alter+alter now composes when disjoint."""
    import datetime as dt

    from etl_reporting_spark.operators.transforms import (
        create_hidden_partitioned_wap_table,
    )

    t = create_hidden_partitioned_wap_table(
        spark,
        str(tmp_path / "hp"),
        spark.createDataFrame(
            [(i, dt.date(2026, 1, 1 + (i % 20)), float(i)) for i in range(1, 31)],
            "id int, ds date, amt double",
        ),
        ["days(ds)"],
    )
    br = create_branch(spark, t.path, "specbr")
    br.evolve_partition_spec(["months(ds)"])
    t.alter_schema(add={"note": "string"})  # disjoint, but spec ≠ alter
    with pytest.raises(ConcurrentWriteError, match="ambiguous"):
        publish_branch(spark, t.path, "specbr")
    assert registered_branches(t)[0]["name"] == "specbr"


def test_publish_overwrite_crash_then_rerun_completes(spark, table):
    """Crash between the rebuild replay and the overwrite replay: the
    re-run's done-set skips the landed prefix and completes the
    overwrite — same "run it again" contract as the metadata sweep."""
    from etl_reporting_spark.operators import wap as wap_mod

    br = create_branch(spark, table.path, "crashow")
    new = spark.createDataFrame(
        [(201, "d0", 1.0), (202, "d2", 2.0)],
        "id long, ds string, amount double",
    )
    br.commit_partitions(
        new, replace=sorted(table.partition_map()), operation="rebuild"
    )
    rec = dict(br._commit_record(2))
    rec.pop("touched", None)
    rec.update({"version": 3, "operation": "full_overwrite"})
    br._publish(rec)

    real_publish = wap_mod.WapTable._publish
    state = {"n": 0}

    def crashing(self, record):
        real_publish(self, record)
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("simulated crash between replays")

    wap_mod.WapTable._publish = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            publish_branch(spark, table.path, "crashow")
    finally:
        wap_mod.WapTable._publish = real_publish

    # prefix landed and marked; branch still live
    assert registered_branches(table)[0]["name"] == "crashow"
    assert table.latest_record()["branch_replayed_version"] == 2

    tip = publish_branch(spark, table.path, "crashow")
    final = table._commit_record(tip)
    assert final["operation"] == "full_overwrite"
    assert final["branch_replayed_version"] == 3
    got = sorted(
        map(tuple, table.read(version=tip).select("id", "amount").collect())
    )
    assert got == [(201, 1.0), (202, 2.0)]
    assert registered_branches(table) == []
