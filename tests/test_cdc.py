from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_reporting_spark.operators.cdc import (
    asof_join,
    dedup_latest,
    effective_at,
    interval_join,
    point_in_time,
    scd2_intervals,
    snapshot_at,
)


def _cdc_rows(spark):
    # (key, sequenced_at, sequence_no, value)
    rows = [
        ("a", dt.datetime(2024, 1, 1), 1, "a-v1"),
        ("a", dt.datetime(2024, 1, 3), 2, "a-v2"),
        ("a", dt.datetime(2024, 1, 3), 3, "a-v3"),  # same ts, higher seq wins
        ("a", dt.datetime(2024, 1, 9), 4, "a-v4"),
        ("b", dt.datetime(2024, 1, 2), 1, "b-v1"),
    ]
    return spark.createDataFrame(rows, "key string, sequenced_at timestamp, sequence_no int, value string")


def test_dedup_latest_picks_latest_version(spark):
    df = _cdc_rows(spark)
    out = dedup_latest(df, "key", ["sequenced_at", "sequence_no"])
    got = {r["key"]: r["value"] for r in out.collect()}
    assert got == {"a": "a-v4", "b": "b-v1"}


def test_snapshot_at_cutoff(spark):
    df = _cdc_rows(spark)
    out = snapshot_at(df, "key", ["sequenced_at", "sequence_no"], "sequenced_at", dt.datetime(2024, 1, 5))
    got = {r["key"]: r["value"] for r in out.collect()}
    # a-v4 is after the cutoff; tie at 1/3 resolved by sequence_no desc
    assert got == {"a": "a-v3", "b": "b-v1"}


def test_point_in_time_pushdown_shape(spark):
    df = _cdc_rows(spark)
    assert point_in_time(df, "sequenced_at", dt.datetime(2024, 1, 2)).count() == 2


def test_scd2_intervals_lead_chain(spark):
    df = _cdc_rows(spark).filter(F.col("sequence_no") != 3)
    out = scd2_intervals(df, "key", "sequenced_at", "row_expiration", "current_row_indicator")
    rows = {(r["key"], r["value"]): r for r in out.collect()}
    assert rows[("a", "a-v1")]["row_expiration"] == dt.datetime(2024, 1, 3)
    assert rows[("a", "a-v4")]["row_expiration"] == dt.datetime(9999, 12, 31)
    assert rows[("a", "a-v4")]["current_row_indicator"] == 1
    assert rows[("a", "a-v1")]["current_row_indicator"] == 0
    assert rows[("b", "b-v1")]["current_row_indicator"] == 1


def test_scd2_close_previous_adjusts_lead(spark):
    # The reference closes each version 1 minute before the next opens
    # (…detail.sql:19-20); close_previous adjusts the LEAD column, the
    # open-version sentinel is untouched.
    df = _cdc_rows(spark).filter(F.col("sequence_no") != 3)
    out = scd2_intervals(
        df, "key", "sequenced_at",
        close_previous=lambda nxt: nxt - F.expr("INTERVAL 1 MINUTE"),
    )
    rows = {(r["key"], r["value"]): r for r in out.collect()}
    assert rows[("a", "a-v1")]["row_expiration"] == dt.datetime(2024, 1, 2, 23, 59)
    assert rows[("a", "a-v2")]["row_expiration"] == dt.datetime(2024, 1, 8, 23, 59)
    assert rows[("a", "a-v4")]["row_expiration"] == dt.datetime(9999, 12, 31)
    assert rows[("a", "a-v4")]["current_row_indicator"] == 1


def test_asof_join_latest_at_or_before(spark):
    build = _cdc_rows(spark)
    probe = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 2), 100),
            ("a", dt.datetime(2024, 1, 3), 101),  # equal ts → sees 1/3 version
            ("a", dt.datetime(2024, 2, 1), 102),
            ("b", dt.datetime(2024, 1, 1), 103),  # before any build row → NULL
        ],
        "key string, ts timestamp, probe_id int",
    )
    out = asof_join(
        probe, build, "key", "ts", "sequenced_at",
        build_cols=["value"], tie_break=["sequence_no"],
    )
    got = {r["probe_id"]: r["value"] for r in out.collect()}
    assert got == {100: "a-v1", 101: "a-v3", 102: "a-v4", 103: None}


def test_effective_at_sentinel(spark):
    df = spark.createDataFrame(
        [
            ("x", dt.date(2024, 1, 1), dt.date(2024, 2, 1)),
            ("y", dt.date(2024, 1, 15), None),  # open interval
            ("z", dt.date(2024, 3, 1), None),  # not yet effective
        ],
        "k string, eff date, exp date",
    )
    out = effective_at(df, dt.date(2024, 1, 20), "eff", "exp")
    assert {r["k"] for r in out.collect()} == {"x", "y"}


def test_interval_join_binds_fact_to_dim_version(spark):
    dim = spark.createDataFrame(
        [
            ("a", "v1", dt.date(2024, 1, 1), dt.date(2024, 1, 31)),
            ("a", "v2", dt.date(2024, 2, 1), None),
        ],
        "k string, dim_val string, eff date, exp date",
    )
    facts = spark.createDataFrame(
        [("a", dt.date(2024, 1, 10), 1), ("a", dt.date(2024, 2, 10), 2)],
        "k string, event_dt date, fact_id int",
    )
    out = interval_join(facts, dim, "k", "event_dt", "eff", "exp")
    got = {r["fact_id"]: r["dim_val"] for r in out.collect()}
    assert got == {1: "v1", 2: "v2"}


def test_scd2_apply_changes_incremental_equals_rebuild(spark):
    from etl_reporting_spark.operators.cdc import scd2_apply_changes, scd2_intervals

    base = _cdc_rows(spark).filter(F.col("sequence_no") != 3)
    batch = spark.createDataFrame(
        [("a", dt.datetime(2024, 2, 1), 5, "a-v5"), ("c", dt.datetime(2024, 1, 4), 1, "c-v1")],
        "key string, sequenced_at timestamp, sequence_no int, value string",
    )
    dim = scd2_intervals(base, "key", "sequenced_at")
    out = scd2_apply_changes(dim, batch, "key", "sequenced_at")
    rebuild = scd2_intervals(base.unionByName(batch), "key", "sequenced_at")
    key = lambda r: (r["key"], r["sequenced_at"])
    got = {key(r): (r["row_expiration"], r["current_row_indicator"]) for r in out.collect()}
    want = {key(r): (r["row_expiration"], r["current_row_indicator"]) for r in rebuild.collect()}
    assert got == want
    # untouched key 'b' kept its original open interval
    assert got[("b", dt.datetime(2024, 1, 2))] == (dt.datetime(9999, 12, 31), 1)
    # key 'a' closed its old head; new version is current
    assert got[("a", dt.datetime(2024, 2, 1))][1] == 1
    assert got[("a", dt.datetime(2024, 1, 9))] == (dt.datetime(2024, 2, 1), 0)


def test_resample_forward_fill_semantics(spark):
    import datetime as dt

    from etl_reporting_spark.operators.cdc import resample_forward_fill

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 50), 2.0),   # same slot: latest wins
        ("a", dt.datetime(2024, 1, 1, 3, 5), 9.0),    # two-hour gap to fill
        ("b", dt.datetime(2024, 1, 1, 5, 0), 7.0),    # independent key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {(r["k"], r["slot_ts"].hour): r
           for r in resample_forward_fill(df, "k", "ts", "v").collect()}
    assert out[("a", 0)]["v"] == 2.0 and out[("a", 0)]["observed"] == 2.0
    assert out[("a", 1)]["v"] == 2.0 and out[("a", 1)]["observed"] is None  # filled
    assert out[("a", 2)]["v"] == 2.0
    assert out[("a", 3)]["v"] == 9.0
    assert len([k for k in out if k[0] == "a"]) == 4  # full spine 0..3
    assert out[("b", 5)]["v"] == 7.0 and len([k for k in out if k[0] == "b"]) == 1


def test_resample_forward_fill_null_and_tie_semantics(spark):
    import datetime as dt
    import pytest

    from etl_reporting_spark.operators.cdc import resample_forward_fill

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 50), None),   # null = no reading
        ("a", dt.datetime(2024, 1, 1, 1, 30), 3.0),
        ("a", dt.datetime(2024, 1, 1, 1, 30), 2.0),    # exact-ts tie: max value wins
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["slot_ts"].hour: r for r in resample_forward_fill(df, "k", "ts", "v").collect()}
    assert out[0]["v"] == 1.0          # null at latest ts doesn't shadow the value
    assert out[1]["v"] == 3.0          # deterministic tiebreak
    with pytest.raises(ValueError, match="reserved"):
        resample_forward_fill(df.withColumnRenamed("v", "observed"), "k", "ts", "observed")


def test_asof_join_tolerance_and_matched_time(spark):
    """Bounded-staleness as-of (pandas merge_asof tolerance parity):
    matches older than the tolerance null out, matched_time_col
    exposes the freshness probe, and numeric time axes work too."""
    import datetime as dt

    from etl_reporting_spark.operators.cdc import asof_join

    probe = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 10)), ("k", dt.datetime(2024, 1, 30))],
        "key string, pt timestamp",
    )
    build = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 8), 100.0)],
        "key string, bt timestamp, price double",
    )
    out = {
        r["pt"].day: r
        for r in asof_join(
            probe, build, "key", "pt", "bt",
            tolerance="INTERVAL '7' DAY", matched_time_col="m",
        ).collect()
    }
    # day 10: match 2 days old — within tolerance
    assert out[10]["price"] == 100.0 and out[10]["m"] == dt.datetime(2024, 1, 8)
    # day 30: latest match is 22 days stale — nulled, freshness NULL
    assert out[30]["price"] is None and out[30]["m"] is None

    # numeric time axis: tolerance is a plain number expression
    p2 = spark.createDataFrame([(1, 100), (1, 200)], "k long, t long")
    b2 = spark.createDataFrame([(1, 95, "x")], "k long, t2 long, tag string")
    got = {
        r["t"]: r["tag"]
        for r in asof_join(p2, b2, "k", "t", "t2", tolerance="10").collect()
    }
    assert got == {100: "x", 200: None}
