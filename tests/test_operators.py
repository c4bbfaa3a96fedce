from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_reporting_spark.functions.datetime_fns import month_spine, working_days_between
from etl_reporting_spark.functions.text_fns import strip_domain_prefix
from etl_reporting_spark.operators.aggregates import (
    column_profile,
    duplicate_keys,
    grouped_report,
    outlier_filter,
)
from etl_reporting_spark.operators.merge import merge_upsert
from etl_reporting_spark.operators.relational import (
    anti_join_not_in,
    conditional_insert_missing,
    top_k,
    union_by_name_allow_missing,
    with_scalar,
)


def test_working_days_brute_force(spark):
    # every (start dow, length) combination against a Python oracle
    rows = []
    base = dt.date(2024, 1, 1)  # a Monday
    for start_off in range(7):
        for length in range(0, 22):
            s = base + dt.timedelta(days=start_off)
            e = s + dt.timedelta(days=length)
            expected = sum(
                1
                for i in range(length + 1)
                if (s + dt.timedelta(days=i)).weekday() < 5
            )
            rows.append((s, e, expected))
    df = spark.createDataFrame(rows, "s date, e date, expected int")
    out = df.withColumn("got", working_days_between(F.col("s"), F.col("e")))
    bad = out.filter(F.col("got") != F.col("expected")).collect()
    assert bad == [], f"mismatches: {bad[:5]}"
    # reversed interval → 0
    assert (
        df.limit(1)
        .select(working_days_between(F.col("e") + F.expr("INTERVAL 5 DAYS"), F.col("e")).alias("x"))
        .first()["x"]
        == 0
    )


def test_strip_domain_prefix(spark):
    df = spark.createDataFrame([("CORP\\jdoe",), ("plain_user",)], "u string")
    got = [r["x"] for r in df.select(strip_domain_prefix(F.col("u")).alias("x")).collect()]
    assert got == ["jdoe", "plain_user"]


def test_anti_join_not_in(spark):
    left = spark.createDataFrame([(" p1 ",), ("p2",), ("p3",)], "policy string")
    right = spark.createDataFrame([("p1",), ("p4",)], "policy string")
    out = anti_join_not_in(left, right, "policy")
    assert {r["policy"].strip() for r in out.collect()} == {"p2", "p3"}


def test_duplicate_keys(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    out = duplicate_keys(df, ["k"])
    assert [(r["k"], r["dup_count"]) for r in out.collect()] == [(1, 2)]


def test_grouped_report_rollup(spark):
    df = spark.createDataFrame(
        [("east", 10.0, 1), ("east", 20.0, 2), ("west", 5.0, 1)],
        "grp string, amount double, claimants int",
    )
    out = grouped_report(df, ["grp"], ["amount", "claimants"])
    rows = {r["grp"]: (r["sum_amount"], r["sum_claimants"]) for r in out.collect()}
    assert rows["east"] == (30.0, 3)
    assert rows["west"] == (5.0, 1)
    assert rows["Grand Total"] == (35.0, 4)


def test_outlier_filter(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 1, 2, 1, 2, 100]], "v double")
    out = outlier_filter(df, "v", sigmas=2.0)
    assert [r["v"] for r in out.collect()] == [100.0]


def test_column_profile(spark):
    df = spark.createDataFrame([(1,), (1,), (None,), (3,)], "v int")
    row = column_profile(df, "v").first()
    assert (row["row_count"], row["null_count"], row["unique_count"]) == (4, 1, 2)
    assert (row["min_value"], row["max_value"]) == (1, 3)


def test_top_k(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    assert [r["v"] for r in top_k(df, [F.col("v").desc()], 3).collect()] == [99, 98, 97]


def test_with_scalar_broadcast(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    cfg = spark.createDataFrame([(dt.date(2024, 1, 31),)], "report_end date")
    out = with_scalar(df, cfg)
    assert out.count() == 2 and "report_end" in out.columns


def test_union_by_name_allow_missing(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, "y")], "id int, b string")
    out = union_by_name_allow_missing([a, b])
    assert set(out.columns) == {"id", "a", "b"} and out.count() == 2


def test_conditional_insert_missing(spark):
    target = spark.createDataFrame([(1,), (2,)], "k int")
    source = spark.createDataFrame([(2,), (3,)], "k int")
    assert [r["k"] for r in conditional_insert_missing(target, source, ["k"]).collect()] == [3]


def test_merge_upsert_full_branches(spark):
    target = spark.createDataFrame(
        [(1, "old1", 10), (2, "old2", 20), (3, "old3", 30)], "k int, v string, amt int"
    )
    source = spark.createDataFrame(
        [(1, "new1", 11), (4, "new4", 40)], "k int, v string, amt int"
    )
    res = merge_upsert(
        target, source, ["k"], delete_not_matched_by_source=True
    )
    rows = {r["k"]: (r["v"], r["amt"]) for r in res.df.collect()}
    assert rows == {1: ("new1", 11), 4: ("new4", 40)}
    assert (res.rows_inserted, res.rows_updated, res.rows_deleted) == (1, 1, 2)

    # no delete branch → target-only rows carried unchanged
    res2 = merge_upsert(target, source, ["k"])
    rows2 = {r["k"]: r["v"] for r in res2.df.collect()}
    assert rows2 == {1: "new1", 2: "old2", 3: "old3", 4: "new4"}


def test_month_spine(spark):
    df = month_spine(spark, 2024, 2024, label="ACME")
    rows = df.orderBy("period_start_dt").collect()
    assert len(rows) == 12
    assert rows[0]["period_start_dt"] == dt.date(2024, 1, 1)
    assert rows[1]["period_end_dt"] == dt.date(2024, 2, 29)
    assert rows[0]["carrier_name"] == "ACME"


def test_sessionize_gap_boundaries(spark):
    from etl_reporting_spark.operators.sessionize import session_aggregates, sessionize

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 10, 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 10), 10, 2.0),   # same session (10 min)
        (3, dt.datetime(2024, 1, 1, 11, 0), 10, 3.0),    # new session (50 min gap)
        (4, dt.datetime(2024, 1, 1, 9, 0), 11, 4.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    s = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert s == {1: 1, 2: 1, 3: 2, 4: 1}
    agg = {(r["user_id"], r["session_seq"]): r for r in session_aggregates(df).collect()}
    assert agg[(10, 1)]["n_events"] == 2 and agg[(10, 1)]["sum_value"] == 3.0
    assert agg[(10, 1)]["duration_sec"] == 600.0
    assert agg[(10, 2)]["n_events"] == 1 and agg[(10, 2)]["duration_sec"] == 0.0


def test_sessionize_runs_on_timestamp_ntz(spark):
    """Spark 4.1 reads the driver's TIMESTAMP(NANOS) events as
    TIMESTAMP_NTZ; the gap arithmetic (timestamp_diff) must accept it
    — unix_micros does not (round-2 w8 regression)."""
    from etl_reporting_spark.operators.sessionize import session_aggregates, sessionize

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 10, 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 10), 10, 2.0),
        (3, dt.datetime(2024, 1, 1, 11, 0), 10, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    s = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert s == {1: 1, 2: 1, 3: 2}
    agg = {(r["user_id"], r["session_seq"]): r for r in session_aggregates(df).collect()}
    assert agg[(10, 1)]["duration_sec"] == 600.0


def test_sql_udfs_registered(spark):
    from etl_reporting_spark.functions.sql_udfs import register_sql_udfs

    register_sql_udfs(spark)
    row = spark.sql(
        "SELECT fm_workingdaysbetween(DATE'2024-01-01', DATE'2024-01-14') AS wd,"
        " strip_domain_prefix('CORP\\\\jdoe') AS u,"
        " fm_workingdaysbetween(DATE'2024-01-14', DATE'2024-01-01') AS rev"
    ).first()
    assert row["wd"] == 10 and row["u"] == "jdoe" and row["rev"] == 0


def test_merge_upsert_null_key_target_row_survives(spark):
    from etl_reporting_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "old1"), (None, "nullkey")], "k int, v string"
    )
    source = spark.createDataFrame([(1, "new1")], "k int, v string")
    res = merge_upsert(target, source, ["k"])
    rows = {r["k"]: r["v"] for r in res.df.collect()}
    assert rows == {1: "new1", None: "nullkey"}  # NULL-key row kept, not dropped
    assert res.rows_unchanged == 1
    res.unpersist()

    # under the delete branch the NULL-key row is "not matched by source" → deleted
    res2 = merge_upsert(target, source, ["k"], delete_not_matched_by_source=True)
    assert {r["k"] for r in res2.df.collect()} == {1}
    assert res2.rows_deleted == 1
    res2.unpersist()


def test_merge_upsert_duplicate_source_keys_fail_fast(spark):
    import pytest as _pytest

    from etl_reporting_spark.operators.merge import (
        NonDeterministicMergeError,
        merge_upsert,
    )

    target = spark.createDataFrame([(1, "old")], "k int, v string")
    source = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with _pytest.raises(NonDeterministicMergeError):
        merge_upsert(target, source, ["k"])
    # explicit opt-out keeps the old fan-out behavior
    res = merge_upsert(target, source, ["k"], validate_source_unique=False)
    assert res.df.count() == 2
    res.unpersist()


def test_merge_upsert_reuses_cached_join(spark):
    """The returned df must read the persisted join (InMemoryTableScan),
    not recompute the full-outer join a second time."""
    from etl_reporting_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "old")], "k int, v string")
    source = spark.createDataFrame([(2, "new")], "k int, v string")
    res = merge_upsert(target, source, ["k"])
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    # the scan reads the persisted join; the join text only appears as
    # the InMemoryRelation's stored child plan, not as live work
    assert "InMemoryTableScan" in plan
    res.unpersist()


def test_merge_backend_dispatch_guards(spark):
    """backend='delta' must refuse loudly (no silent fallback) when
    delta-spark is absent or required handles are missing; unknown
    backends are an immediate error."""
    import pytest as _pytest

    from etl_reporting_spark.operators.merge import delta_available, merge_upsert

    target = spark.createDataFrame([(1, "a")], "k int, v string")
    source = spark.createDataFrame([(1, "b")], "k int, v string")
    with _pytest.raises(ValueError, match="unknown merge backend"):
        merge_upsert(target, source, ["k"], backend="iceberg")
    if not delta_available():
        with _pytest.raises(ImportError, match="delta-spark"):
            merge_upsert(target, source, ["k"], backend="delta")
    else:
        with _pytest.raises(ValueError, match="target_table"):
            merge_upsert(target, source, ["k"], backend="delta", spark=spark)


def test_merge_upsert_delta_full_branches(spark, tmp_path):
    """Same branch semantics as the join backend, through DeltaTable
    MERGE — runs only where delta-spark is installed AND the session
    has the Delta SQL extension (both required for Delta DML)."""
    import pytest as _pytest

    _pytest.importorskip("delta")
    if "DeltaSparkSessionExtension" not in spark.conf.get("spark.sql.extensions", ""):
        _pytest.skip("session not Delta-configured")

    from etl_reporting_spark.operators.merge import merge_upsert

    path = str(tmp_path / "delta_target")
    spark.createDataFrame(
        [(1, "old1", 10), (2, "old2", 20), (3, "old3", 30)], "k int, v string, amt int"
    ).write.format("delta").save(path)
    source = spark.createDataFrame(
        [(1, "new1", 11), (4, "new4", 40)], "k int, v string, amt int"
    )
    res = merge_upsert(
        None,
        source,
        ["k"],
        delete_not_matched_by_source=True,
        backend="delta",
        spark=spark,
        target_table=path,
    )
    rows = {r["k"]: (r["v"], r["amt"]) for r in res.df.collect()}
    assert rows == {1: ("new1", 11), 4: ("new4", 40)}
    assert (res.rows_inserted, res.rows_updated, res.rows_deleted) == (1, 1, 2)
    assert res.rows_unchanged == 0


def test_partial_aggregate_merge_equals_recompute(spark):
    import pyspark.sql.functions as F

    from etl_reporting_spark.operators.aggregates import (
        finalize_stats,
        merge_partials,
        partial_aggregate,
    )

    df = spark.range(500).select(
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") * 7 % 113).cast("double").alias("v"),
    )
    # arbitrary 3-way split; each batch partial-aggregated alone
    parts = None
    for i in range(3):
        p = partial_aggregate(df.filter(F.col("id") % 3 == i), ["k"], "v")
        parts = p if parts is None else parts.unionByName(p)
    merged = finalize_stats(merge_partials(parts, ["k"]))
    full = finalize_stats(partial_aggregate(df, ["k"], "v"))
    got = {r["k"]: tuple(r)[1:] for r in merged.collect()}
    ref = {r["k"]: tuple(r)[1:] for r in full.collect()}
    assert got == ref  # bit-identical, including stddev


def test_funnel_strict_ordering_and_counts(spark):
    import datetime as dt

    from etl_reporting_spark.operators.analytics import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes in order: view(1) click(2) purchase(3)
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, t(2), "click"), (2, t(5), "view"),
        # u3 views+clicks, purchase precedes click: purchase not counted
        (3, t(1), "view"), (3, t(2), "purchase"), (3, t(4), "click"),
        # u4 never views: excluded entirely
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["stage"]: r for r in funnel(events, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 3        # u1, u2, u3
    assert out["click"]["n_users"] == 2       # u1, u3 (u2's click too early)
    assert out["purchase"]["n_users"] == 1    # u1 only
    assert out["click"]["conv_from_prev"] == 2 / 3
    assert out["purchase"]["conv_from_first"] == 1 / 3


def test_cohort_retention_offsets(spark):
    import datetime as dt

    from etl_reporting_spark.operators.analytics import cohort_retention

    # week of Jan 1 2024 starts Monday Jan 1
    rows = [
        (1, dt.datetime(2024, 1, 2)),   # cohort wk0
        (1, dt.datetime(2024, 1, 10)),  # active wk1
        (2, dt.datetime(2024, 1, 3)),   # cohort wk0, never returns
        (3, dt.datetime(2024, 1, 9)),   # cohort wk1
        (3, dt.datetime(2024, 1, 22)),  # active wk3 => offset 2
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r["cohort_period"]), r["period_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
           for r in cohort_retention(events).collect()}
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert got[("2024-01-08", 2)] == (1, 1, 1.0)


def test_flatten_hierarchy_paths_and_cycle_guard(spark):
    import pytest

    from etl_reporting_spark.operators.hierarchy import flatten_hierarchy

    # two trees: 0←1←3, 0←2 and a separate root 10←11
    rows = [(0, None), (1, 0), (2, 0), (3, 1), (10, None), (11, 10)]
    edges = spark.createDataFrame(rows, "node long, parent long")
    got = {r["node"]: r for r in flatten_hierarchy(edges).collect()}
    assert got[3]["root"] == 0 and got[3]["depth"] == 2 and got[3]["path"] == "0/1/3"
    assert got[0]["depth"] == 0 and got[0]["path"] == "0"
    assert got[11]["root"] == 10 and got[11]["path"] == "10/11"
    # cycle: must raise, not loop forever
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    with pytest.raises(RuntimeError, match="max_depth"):
        flatten_hierarchy(cyc, max_depth=5)


def test_flatten_hierarchy_string_ids(spark):
    from etl_reporting_spark.operators.hierarchy import flatten_hierarchy

    rows = [("CEO", None), ("VP1", "CEO"), ("E9", "VP1")]
    edges = spark.createDataFrame(rows, "node string, parent string")
    got = {r["node"]: r for r in flatten_hierarchy(edges).collect()}
    assert got["E9"]["root"] == "CEO" and got["E9"]["path"] == "CEO/VP1/E9"


def test_table_diff_null_semantics(spark):
    from etl_reporting_spark.operators.relational import table_diff

    old = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, None), (3, None, None), (4, 1.0, "x")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 7.0, "a"), (2, None, None), (3, None, None), (5, 2.0, "y")],
        "k long, v double, s string",
    )
    got = {r["k"]: r for r in table_diff(old, new, "k").collect()}
    assert got[1]["diff_status"] == "changed" and got[1]["changed_cols"] == ["v"]
    assert got[2]["diff_status"] == "changed" and got[2]["changed_cols"] == ["v"]
    assert got[3]["diff_status"] == "unchanged"  # NULL == NULL, null-safely
    assert got[4]["diff_status"] == "removed" and got[4]["changed_cols"] == []
    assert got[5]["diff_status"] == "added"
