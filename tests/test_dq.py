from __future__ import annotations

import datetime as dt

import pytest

from etl_reporting_spark.dq import checks as C
from etl_reporting_spark.dq.runner import (
    DQRunner,
    OneOrMoreTestCasesFailedException,
    TestCaseSpec,
    parse_test_blocks,
)


@pytest.fixture(scope="module")
def tables(spark):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (2, "b", 0.0), (4, None, 3.0)],
        "id int, name string, amount double",
    ).createOrReplaceTempView("dq_child")
    spark.createDataFrame([(1,), (2,)], "id int").createOrReplaceTempView("dq_parent")
    return None


def test_unique_check(spark, tables):
    fails = C.unique_check(spark.table("dq_child"), "id").collect()
    assert [(r["key_value"], r["dup_count"]) for r in fails] == [("2", 2)]


def test_combination_unique_check(spark, tables):
    fails = C.combination_unique_check(spark.table("dq_child"), ["id", "name"]).collect()
    assert len(fails) == 1 and fails[0]["dup_count"] == 2


def test_orphan_check(spark, tables):
    fails = C.orphan_check(spark.table("dq_child"), spark.table("dq_parent"), "id").collect()
    assert {r["id"] for r in fails} == {4}


def test_not_null_and_value_checks(spark, tables):
    df = spark.table("dq_child")
    assert C.not_null_check(df, "name").count() == 1
    assert C.negative_value_check(df, "amount").count() == 1
    assert C.zero_value_check(df, "amount").count() == 1
    assert C.default_value_check(df, "name", "a").count() == 1


def test_row_count_and_freshness(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1),), (dt.datetime(2024, 1, 2),)], "ts timestamp"
    )
    assert C.row_count_check(df, min_rows=3).count() == 1
    assert C.row_count_check(df, min_rows=1).count() == 0
    stale = C.freshness_check(df, "ts", max_age_hours=24, now=dt.datetime(2024, 1, 10))
    assert stale.count() == 1
    fresh = C.freshness_check(df, "ts", max_age_hours=24, now=dt.datetime(2024, 1, 2, 12))
    assert fresh.count() == 0


def test_runner_summary_and_raise(spark, tables):
    runner = DQRunner(spark)
    specs = [
        TestCaseSpec("DQ-001", "UNIQUE_CHECK", "dq_child", "id"),
        TestCaseSpec("DQ-002", "NOT_NULL_CHECK", "dq_child", "name"),
        TestCaseSpec("DQ-003", "ORPHAN_CHECK", "dq_child", "id", parent_table="dq_parent"),
        TestCaseSpec("DQ-004", "NEGATIVE_VALUE_CHECK", "dq_child", "amount"),
    ]
    summary = runner.run(specs, raise_on_failure=False)
    st = {r["test_id"]: r["status"] for r in summary.collect()}
    assert st == {"DQ-001": "FAIL", "DQ-002": "FAIL", "DQ-003": "FAIL", "DQ-004": "FAIL"}
    with pytest.raises(OneOrMoreTestCasesFailedException):
        runner.run(specs)

    ok = [TestCaseSpec("DQ-005", "ZERO_VALUE_CHECK", "dq_parent", "id")]
    st2 = {r["test_id"]: r["status"] for r in runner.run(ok).collect()}
    assert st2 == {"DQ-005": "PASS"}


def test_templated_sql_blocks(spark, tables):
    text = """
-- START_TEST
-- @NAME: orphan_amounts
-- @QUERY: SELECT * FROM {table} WHERE amount < {min_amount}
-- END_TEST
"""
    blocks = parse_test_blocks(text)
    assert "orphan_amounts" in blocks
    runner = DQRunner(spark, template_sql=blocks)
    spec = TestCaseSpec(
        "DQ-T1", "TEMPLATED_SQL", "dq_child", "orphan_amounts", params={"min_amount": "0"}
    )
    res = runner.run_spec(spec)
    assert res.status == "FAIL" and res.failed_rows == 1


def test_reconciliation_generator(spark):
    from etl_reporting_spark.dq.test_case_generator import ColumnMapping, run_reconciliation

    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "pk int, name string, amt double"
    ).createOrReplaceTempView("recon_src")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "pk int, name string, amt double"
    ).createOrReplaceTempView("recon_tgt_ok")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0)], "pk int, name string, amt double"
    ).createOrReplaceTempView("recon_tgt_bad")

    m = ColumnMapping(table="recon_src", column="amt", primary_key="pk")
    ok = run_reconciliation(spark, m, "recon_src", "recon_tgt_ok")
    assert {r["status"] for r in ok.collect()} == {"MATCH"}
    bad = run_reconciliation(spark, m, "recon_src", "recon_tgt_bad")
    st = {r["check"]: r["status"] for r in bad.collect()}
    assert st["sum_amount"] == "MISMATCH" and st["row_count"] == "MATCH"


def test_sample_failures_payload(spark):
    from etl_reporting_spark.dq.checks import negative_value_check, with_sample_failures

    df = spark.createDataFrame([(1, -5.0), (2, 3.0), (3, -1.0)], "id int, amt double")
    samples = with_sample_failures(negative_value_check(df, "amt"), n=1).collect()
    assert len(samples) == 1
    assert '"amt":-' in samples[0]["sample_failure"]


def test_carrier_condition_synthesis(spark):
    """Schema introspection picks the right scoping predicate
    (reference test_framework_helper.py:180-208)."""
    from etl_reporting_spark.dq.runner import DQRunner, TestCaseSpec

    rows = [("ACME", -1.0), ("ACME", 2.0), ("GLOBEX", -3.0), ("GLOBEX", -4.0)]
    base = spark.createDataFrame(rows, "carrier string, amt double")
    base.withColumnRenamed("carrier", "carrier_name").createOrReplaceTempView("ct_name")
    base.selectExpr("md5(carrier) AS carrier_name_dim_id", "amt").createOrReplaceTempView(
        "ct_dim"
    )
    base.createOrReplaceTempView("ct_none")

    def neg_count(table, carrier):
        spec = TestCaseSpec("t", "NEGATIVE_VALUE_CHECK", table, "amt")
        return DQRunner(spark, carrier=carrier).run_spec(spec).failed_rows

    # carrier_name path: per-tenant counts
    assert neg_count("ct_name", "ACME") == 1
    assert neg_count("ct_name", "GLOBEX") == 2
    # carrier_name_dim_id path: same scoping through the md5 key
    assert neg_count("ct_dim", "ACME") == 1
    assert neg_count("ct_dim", "GLOBEX") == 2
    # neither column → 1=1, unscoped
    assert neg_count("ct_none", "ACME") == 3
    # no carrier at all → unscoped even when the column exists
    assert neg_count("ct_name", None) == 3


def test_carrier_condition_sql_fragment_escapes_quotes():
    from pyspark.sql import functions as F  # noqa: F401
    from etl_reporting_spark.dq.runner import synthesize_carrier_condition

    _, frag = synthesize_carrier_condition(["carrier_name"], "O'BRIEN")
    assert frag == "carrier_name = 'O''BRIEN'"
    _, frag2 = synthesize_carrier_condition(["carrier_name_dim_id"], "X")
    assert frag2 == "carrier_name_dim_id = md5('X')"
    _, frag3 = synthesize_carrier_condition(["other"], "X")
    assert frag3 == "1=1"


def test_templated_sql_gets_carrier_condition(spark):
    from etl_reporting_spark.dq.runner import DQRunner, TestCaseSpec

    spark.createDataFrame(
        [("ACME", -1.0), ("GLOBEX", -2.0)], "carrier_name string, amt double"
    ).createOrReplaceTempView("ct_tpl")
    tpl = {"neg": "SELECT * FROM {table} WHERE {carrier_name_condition} AND amt < 0"}
    spec = TestCaseSpec("t", "TEMPLATED_SQL", "ct_tpl", "neg")
    r = DQRunner(spark, template_sql=tpl, carrier="ACME").run_spec(spec)
    assert r.failed_rows == 1
    r2 = DQRunner(spark, template_sql=tpl).run_spec(spec)
    assert r2.failed_rows == 2


def test_reconciliation_high_cardinality_stays_engine_side(spark):
    """value_distribution over 12k distinct values: the diff runs as
    an engine-side symmetric difference, no driver-side collect of the
    distribution."""
    from pyspark.sql import functions as F

    from etl_reporting_spark.dq.test_case_generator import ColumnMapping, run_reconciliation

    big = spark.range(12_000).select(
        F.col("id").alias("pk"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    big.createOrReplaceTempView("hc_src")
    big.createOrReplaceTempView("hc_tgt_ok")
    big.withColumn(
        "val", F.when(F.col("pk") == 11_999, F.lit("CHANGED")).otherwise(F.col("val"))
    ).createOrReplaceTempView("hc_tgt_bad")

    m = ColumnMapping(table="hc_src", column="val", primary_key="pk")
    ok = {r["check"]: r["status"] for r in run_reconciliation(spark, m, "hc_src", "hc_tgt_ok").collect()}
    assert ok["value_distribution"] == "MATCH" and ok["row_count"] == "MATCH"
    bad = {r["check"]: r["status"] for r in run_reconciliation(spark, m, "hc_src", "hc_tgt_bad").collect()}
    assert bad["value_distribution"] == "MISMATCH" and bad["row_count"] == "MATCH"


def test_fused_row_checks_one_scan(spark):
    from pyspark.sql import functions as F

    from etl_reporting_spark.dq.checks import fused_row_checks

    df = spark.createDataFrame(
        [("a", 5), (None, -1), ("", 3)], "name string, bal int"
    )
    out = {
        r["test_id"]: (r["status"], r["failed_rows"])
        for r in fused_row_checks(
            df,
            {
                "NN": F.col("name").isNull() | (F.col("name") == ""),
                "NEG": F.col("bal") < 0,
                "BIG": F.col("bal") > 100,
            },
        ).collect()
    }
    assert out == {"NN": ("FAIL", 2), "NEG": ("FAIL", 1), "BIG": ("PASS", 0)}
    # empty input: counts are 0, never NULL
    empty = spark.createDataFrame([], "name string, bal int")
    rows = fused_row_checks(empty, {"NN": F.col("name").isNull()}).collect()
    assert rows[0]["failed_rows"] == 0 and rows[0]["status"] == "PASS"


def test_drift_check_tvd_semantics(spark):
    from etl_reporting_spark.dq.checks import drift_check

    base = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "c string")
    same = spark.createDataFrame([("a",)] * 20 + [("b",)] * 20, "c string")
    r = drift_check(same, base, "c").first()
    assert r["tvd"] == 0.0 and r["passed"]
    # category swap: a 100%→0%, c 0%→100% ⇒ TVD = 1.0
    moved = spark.createDataFrame([("c",)] * 10, "c string")
    only_a = spark.createDataFrame([("a",)] * 10, "c string")
    rows = drift_check(moved, only_a, "c").collect()
    assert all(r["tvd"] == 1.0 and not r["passed"] for r in rows)
    cats = {r["category"]: r for r in rows}
    assert cats["a"]["n_cur"] == 0 and cats["c"]["n_base"] == 0  # absent sides = 0


def test_drift_numeric_guard_bins(spark):
    from etl_reporting_spark.dq.checks import drift_check_numeric

    base = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    cur = spark.createDataFrame(
        [(-5.0,), (50.0,), (None,)], "v double"
    )  # below-range, above-range, null
    rows = {r["category"]: r for r in
            drift_check_numeric(cur, base, "v", lo=0.0, hi=10.0, n_bins=10).collect()}
    assert rows["-1"]["n_cur"] == 1 and rows["-1"]["n_base"] == 0   # below range
    assert rows["10"]["n_cur"] == 1                                  # above range
    assert rows["11"]["n_cur"] == 1                                  # null bin
    assert all(not r["passed"] for r in rows.values())               # massive drift
