"""Capstone integration test: the whole engine chained as one
pipeline, the way a datamart deployment composes it —

  CDC landing (streaming AvailableNow ingest)
  → dedup-latest snapshot → SCD2 dimension build
  → MERGE into a serving table (with mutation metrics)
  → templated report over the serving state
  → DQ battery over the report output
  → CSV datafeed export + execution audit
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_full_datamart_pipeline(spark, tmp_path):
    from etl_reporting_spark.datafeeds.writers import ExecutionLog, write_csv
    from etl_reporting_spark.dq import checks as C
    from etl_reporting_spark.io import Engine, TableType, WriteMode
    from etl_reporting_spark.operators.cdc import scd2_intervals, snapshot_at
    from etl_reporting_spark.operators.merge import merge_upsert
    from etl_reporting_spark.streaming.cdc_stream import read_event_stream, run_available_now_to_table

    engine = Engine(spark)

    # -- 1. CDC landing: two change files arrive; stream them into the PSA
    schema = "policy_id long, sequenced_at timestamp, sequence_no long, status string, premium double"
    t0 = dt.datetime(2024, 1, 1)
    changes1 = [
        (1, t0, 1, "active", 100.0),
        (2, t0, 1, "active", 200.0),
        (3, t0, 1, "pending", 300.0),
    ]
    changes2 = [
        (1, t0 + dt.timedelta(days=5), 2, "lapsed", 100.0),   # policy 1 lapses
        (3, t0 + dt.timedelta(days=3), 2, "active", 310.0),   # policy 3 activates
        (4, t0 + dt.timedelta(days=4), 1, "active", 400.0),   # new policy
    ]
    landing = tmp_path / "landing"
    landing.mkdir()
    spark.createDataFrame(changes1, schema).coalesce(1).write.parquet(str(landing / "b1"))
    spark.createDataFrame(changes2, schema).coalesce(1).write.parquet(str(landing / "b2"))

    spark.sql("DROP TABLE IF EXISTS psa_policy")
    stream = read_event_stream(spark, str(landing) + "/*", schema)
    q = run_available_now_to_table(stream, "psa_policy", str(tmp_path / "cp"))
    q.awaitTermination(120)
    psa = spark.table("psa_policy")
    assert psa.count() == 6

    # -- 2. current snapshot + SCD2 dimension
    current = snapshot_at(
        psa, "policy_id", ["sequenced_at", "sequence_no"], "sequenced_at",
        t0 + dt.timedelta(days=30),
    )
    assert {r["policy_id"]: r["status"] for r in current.collect()} == {
        1: "lapsed", 2: "active", 3: "active", 4: "active",
    }
    dim = scd2_intervals(psa, "policy_id", "sequenced_at", "row_expiration")
    assert dim.filter(F.col("current_row_indicator") == 1).count() == 4

    # -- 3. MERGE the snapshot into the serving table
    serving_seed = spark.createDataFrame(
        [(1, "active", 100.0), (2, "active", 200.0), (9, "zombie", 999.0)],
        "policy_id long, status string, premium double",
    )
    res = merge_upsert(
        serving_seed, current.select("policy_id", "status", "premium"),
        ["policy_id"], delete_not_matched_by_source=True,
    )
    assert (res.rows_inserted, res.rows_updated, res.rows_deleted) == (2, 2, 1)
    engine.save_as_table(res.df, "serving_policy", WriteMode.OVERWRITE, TableType.TEMPORARY)

    # -- 4. templated report over the serving state
    engine.set_session_variables(min_premium="0")
    report = engine.execute_query(
        """
        SELECT status, COUNT(*) AS n_policies,
               CAST(SUM(CAST(premium AS DECIMAL(18,2))) AS DOUBLE) AS total_premium
        FROM serving_policy WHERE premium > $MIN_PREMIUM
        GROUP BY status ORDER BY status
        """
    )
    engine.save_as_view(report, "policy_report")
    got = {r["status"]: (r["n_policies"], r["total_premium"]) for r in report.collect()}
    assert got == {"active": (3, 910.0), "lapsed": (1, 100.0)}

    # -- 5. DQ over the report output
    rpt = spark.table("policy_report")
    assert C.evaluate("E2E-1", C.not_null_check(rpt, "status")).status == "PASS"
    assert C.evaluate("E2E-2", C.negative_value_check(rpt, "total_premium")).status == "PASS"
    assert C.evaluate("E2E-3", C.unique_check(rpt, "status")).status == "PASS"

    # -- 6. export + audit
    out_csv = tmp_path / "policy_report.csv"
    write_csv(rpt, out_csv, crlf=True)
    assert b"status" in out_csv.read_bytes()
    spark.sql("CREATE DATABASE IF NOT EXISTS e2e_audit")
    log = ExecutionLog(spark, table="e2e_audit.exec_log")
    log.record("policy_report", "SUCCESS", dt.datetime(2024, 2, 1), rows_affected=rpt.count())
    assert spark.table("e2e_audit.exec_log").count() >= 1
    spark.sql("DROP TABLE e2e_audit.exec_log")
    spark.sql("DROP DATABASE e2e_audit")
    spark.sql("DROP TABLE IF EXISTS psa_policy")
