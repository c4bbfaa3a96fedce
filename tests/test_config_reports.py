from __future__ import annotations

import pandas as pd
import pytest

from etl_reporting_spark.config import DatamartTable, load_report_config
from etl_reporting_spark.datafeeds.pdf_tables import (
    classify_table,
    combine_extracted_tables,
    continue_headers,
    extract_pdf_tables,
)
from etl_reporting_spark.dq.checks import Expectation
from etl_reporting_spark.report_runner import run_report


def test_datamart_table_uppercases_identifiers():
    t = DatamartTable(source_database="src_db", target_database="tgt", table_name="claims")
    assert (t.source_database, t.table_name) == ("SRC_DB", "CLAIMS")


def test_report_config_yaml(tmp_path):
    p = tmp_path / "report.yml"
    p.write_text(
        "carrier_name: ACME\nreport_name: claims\n"
        "tables_list: [t1, t2]\nsheetnames: [s1, s2]\n"
    )
    cfg = load_report_config(p)
    assert cfg.carrier_name == "ACME" and cfg.tables_list == ["t1", "t2"]
    p.write_text("carrier_name: ACME\nreport_name: r\ntables_list: [t1]\nsheetnames: [a, b]\n")
    with pytest.raises(Exception):
        load_report_config(p)


def test_expectation_rules():
    assert Expectation("m", "=", 0).check(0).status == "PASS"
    assert Expectation("m", "=", 0).check(3).status == "FAIL"
    assert Expectation("m", "<=", 5).check(5).status == "PASS"
    assert Expectation("m", ">", 0).check(0).status == "FAIL"


def test_pdf_pipeline_without_pdf_libs(spark):
    with pytest.raises(NotImplementedError):
        extract_pdf_tables("whatever.pdf")
    page1 = pd.DataFrame({"policy": ["p1", "p2", "p3", "p4"], "amount": ["1", "2", "3", "4"]})
    page2 = pd.DataFrame({0: ["p5", "p6", "p7", "p8"], 1: ["5", "6", "7", "8"]})  # continuation
    summary = pd.DataFrame({"policy": ["Grand Total"], "amount": ["36"]})
    fixed = continue_headers([page1, page2, summary])
    assert list(fixed[1].columns) == ["policy", "amount"]
    assert classify_table(page1) == "detail" and classify_table(summary) == "summary"
    combined = combine_extracted_tables(spark, [page1, page2, summary], kind="detail")
    assert combined.count() == 8


def test_report_runner_end_to_end(spark, sf_dir):
    result = run_report(
        spark,
        "reports/active_claimants",
        sf_dir,
        {"CARRIER_NAME": "ACME", "REPORT_END_DT": "2024-01-15 00:00:00"},
    )
    rows = result.collect()
    assert len(rows) > 0
    assert {"region_name", "event_type", "n_claimants", "n_purchasers", "sum_value"} <= set(
        result.columns
    )
    # view + tables registered
    assert spark.catalog.tableExists("user_latest_state")
    assert spark.catalog.tableExists("claimant_detail")


def test_datafeed_export_end_to_end(spark, sf_dir, tmp_path):
    from etl_reporting_spark.config import ReportConfig
    from etl_reporting_spark.datafeeds.export import run_export

    cfg = ReportConfig(
        carrier_name="ACME",
        report_name="claims_feed",
        tables_list=["customer", "orders"],
        sheetnames=["customers", "orders"],
        exclude_columns=["c_acctbal"],
        filter_rows="",
        sorting_columns=[],
    )
    paths = run_export(spark, cfg, sf_dir, tmp_path / "feed")
    assert len(paths) == 2
    raw = (tmp_path / "feed" / "claims_feed_customers.csv").read_bytes()
    header = raw.splitlines()[0].decode()
    assert "c_custkey" in header and "c_acctbal" not in header
    assert b"\r\n" in raw


def test_incremental_load_is_log_driven(spark, sf_dir):
    """Run 2 appends only post-watermark rows; a rerun at the same
    cutoff is a zero-row no-op and never regresses the watermark."""
    from etl_reporting_spark.datafeeds.writers import ExecutionLog
    from etl_reporting_spark.report_runner import incremental_table_load

    from etl_reporting_spark.io import Engine

    eng = Engine(spark)
    eng.drop_managed_table("t_inc_tgt")
    eng.drop_managed_table("t_inc_log")

    def load(cutoff):
        return incremental_table_load(
            spark,
            "reports/incremental_orders/orders_batch.sql",
            "t_inc_tgt",
            "o_orderdate",
            sf_dir,
            substitutions={"BATCH_CUTOFF": cutoff},
            log_table="t_inc_log",
        )

    n1 = load("1996-06-30").count()
    n2 = load("1996-12-31").count()
    assert n2 > n1
    log = ExecutionLog(spark, table="t_inc_log")
    affected = [
        r["rows_affected"]
        for r in spark.table("t_inc_log").orderBy("execution_start_ts").collect()
    ]
    assert affected[0] == n1 and affected[1] == n2 - n1
    hwm_after_2 = log.get_last_successful_load("t_inc_tgt")

    n3 = load("1996-12-31").count()  # rerun: nothing new
    assert n3 == n2
    affected3 = spark.table("t_inc_log").orderBy("execution_start_ts").collect()[-1]
    assert affected3["rows_affected"] == 0
    assert log.get_last_successful_load("t_inc_tgt") == hwm_after_2
