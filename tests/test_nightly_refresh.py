"""Nightly incremental refresh with the WAP commit log as the
watermark store.

The reference persists high-water marks in audit tables next to the
target; with WAP commits the watermark can ride the commit record
itself — one atomic publish carries BOTH the new snapshot and the
watermark that produced it, so a crash can never separate them (the
classic double-write hazard of table+audit designs). Two nights of
CDC arrivals drive:

  watermark from the last commit → filter the landing zone to new
  rows → dedup-latest within the batch → merge_upsert_wap with the
  new watermark in commit_extra → readers see only whole nights.

Also pins time travel (night-1 state stays queryable) and restart
safety (re-running a night against the same landing data loads zero
rows and publishes nothing).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_reporting_spark.operators.cdc import dedup_latest
from etl_reporting_spark.operators.merge import merge_upsert_wap
from etl_reporting_spark.operators.wap import WapTable, create_wap_table

SCHEMA = "policy_id long, sequenced_at timestamp, status string, premium double"
T0 = dt.datetime(2024, 1, 1)


def _nightly(spark, table_path: str, landing) -> int | None:
    """One refresh cycle; returns the committed version (None if the
    night had no new rows)."""
    table = WapTable(spark, table_path)
    rec = table.latest_record() or {}
    wm = rec.get("watermark")
    batch = landing
    if wm is not None:
        batch = landing.filter(F.col("sequenced_at") > F.lit(wm).cast("timestamp"))
    if batch.limit(1).count() == 0:
        return None
    batch = dedup_latest(batch, "policy_id", ["sequenced_at"])
    new_wm = batch.agg(F.max("sequenced_at")).collect()[0][0]
    res = merge_upsert_wap(
        spark,
        table_path,
        batch.select("policy_id", "sequenced_at", "status", "premium"),
        ["policy_id"],
        commit_extra={"watermark": new_wm.isoformat(sep=" ")},
    )
    return res.version


def test_nightly_wap_refresh(spark, tmp_path):
    landing_rows = [
        # night 1 arrivals
        (1, T0 + dt.timedelta(days=1), "active", 100.0),
        (2, T0 + dt.timedelta(days=1), "pending", 200.0),
        (2, T0 + dt.timedelta(days=2), "active", 210.0),  # same-night update
        # night 2 arrivals
        (1, T0 + dt.timedelta(days=5), "lapsed", 100.0),
        (3, T0 + dt.timedelta(days=6), "active", 300.0),
    ]
    landing = spark.createDataFrame(landing_rows, SCHEMA)
    night1 = landing.filter(F.col("sequenced_at") <= F.lit(T0 + dt.timedelta(days=2)))
    path = str(tmp_path / "serving")
    create_wap_table(
        spark, path, spark.createDataFrame([], SCHEMA)
    )
    t = WapTable(spark, path)

    # night 1: loads 3 rows, dedups policy 2 to its latest
    v1 = _nightly(spark, path, night1)
    assert v1 == 2
    state1 = {r["policy_id"]: (r["status"], r["premium"]) for r in t.read().collect()}
    assert state1 == {1: ("active", 100.0), 2: ("active", 210.0)}
    assert t.latest_record()["watermark"] == "2024-01-03 00:00:00"

    # restart safety: re-running night 1 against the same landing
    # data sees nothing past the watermark and publishes no version
    assert _nightly(spark, path, night1) is None
    assert t.current_version() == 2

    # night 2: the full landing zone arrives; only post-watermark rows load
    v2 = _nightly(spark, path, landing)
    assert v2 == 3
    state2 = {r["policy_id"]: r["status"] for r in t.read().collect()}
    assert state2 == {1: "lapsed", 2: "active", 3: "active"}
    assert t.latest_record()["watermark"] == "2024-01-07 00:00:00"

    # time travel: night-1 state remains queryable as version 2
    old = {r["policy_id"]: r["status"] for r in t.read(version=2).collect()}
    assert old == {1: "active", 2: "active"}

    # the log tells the whole story
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "merge", "merge"]
