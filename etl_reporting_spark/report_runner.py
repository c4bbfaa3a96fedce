"""Report runner — the engine's equivalent of the reference's per-
report CLI entry point (§3 entry point 1:
sql/new_rfb_and_total_claimants_active/new_rfb_and_total_claimants_active.py:28-89
driving tools/datamart_utils.py:568-741 + the connector).

Lifecycle: CLI/config → session → session variables → templated SQL
steps from files → each step materialized as a view or table →
execution audit row. Snowflake-dialect plumbing is re-expressed, not
emulated: ``$VARS`` render Python-side so Catalyst constant-folds
them; views are temp views; tables are catalog writes.

Usage:
    python -m etl_reporting_spark.report_runner \
        --sf-dir /root/testdata/sf0.001 \
        --report-dir reports/active_claimants \
        --carrier-name ACME --report-end-dt "2024-01-15 00:00:00"

A report directory holds numbered SQL steps: ``NN_name.view.sql`` →
saved as view ``name``; ``NN_name.table.sql`` → saved as table; the
last step's result prints/returns.
"""

from __future__ import annotations

import argparse
import datetime as dt
import re
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_reporting_spark.datafeeds.writers import ExecutionLog
from etl_reporting_spark.io import Engine, TableType, WriteMode

_STEP_RE = re.compile(r"^(\d+)_(.+)\.(view|table)\.sql$")


def run_report(
    spark: SparkSession,
    report_dir: str | Path,
    sf_dir: str,
    session_variables: dict[str, str],
    log_table: str | None = None,
) -> DataFrame | None:
    from etl_reporting_spark.functions.sql_udfs import register_sql_udfs

    engine = Engine(spark)
    engine.register_testdata(sf_dir)
    register_sql_udfs(spark)
    engine.set_session_variables(**session_variables)

    steps = []
    for p in sorted(Path(report_dir).glob("*.sql")):
        m = _STEP_RE.match(p.name)
        if m:
            steps.append((int(m.group(1)), m.group(2), m.group(3), p))
    if not steps:
        raise FileNotFoundError(f"no NN_name.(view|table).sql steps in {report_dir}")

    last: DataFrame | None = None
    for _, name, kind, path in steps:
        started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        t0 = time.time()
        df = engine.execute_query_from_file(path)
        if kind == "view":
            engine.save_as_view(df, name)
        else:
            engine.save_as_table(df, name, WriteMode.OVERWRITE, TableType.TEMPORARY)
        last = engine.table(name)
        elapsed = time.time() - t0
        print(f"step {name} ({kind}): {elapsed:.2f}s")
        if log_table:
            ExecutionLog(spark, table=log_table).record(
                object_name=name, status="SUCCESS", started_at=started
            )
    return last


def incremental_table_load(
    spark: SparkSession,
    sql_path: str | Path,
    target_table: str,
    incremental_column: str,
    sf_dir: str,
    substitutions: dict[str, str] | None = None,
    log_table: str = "execution_log",
    session_variables: dict[str, str] | None = None,
) -> DataFrame:
    """Self-driving incremental load: the watermark comes from the
    execution log, not the caller (reference connector:400-464 +
    save_execution :1137-1236; CLI-supplied ``--last_load_date`` in
    tools/datamart_utils.py:661-714 becomes log-driven here).

    First run (no SUCCESS row / no target): full load, OVERWRITE.
    Later runs: ``(col) > '<hwm>'`` injected at the {{AND_CONDITION}}/
    {{WHERE_CONDITION}} markers — Catalyst pushes the rendered literal
    to the scan — and only post-watermark rows are appended. The new
    watermark is MAX(incremental_column) of the rows actually loaded
    (data-driven, never wall-clock), so reruns are no-ops and a load
    that sees zero rows can't regress it. Rows equal to the watermark
    are assumed fully loaded (strict ``>``, same as the reference).
    """
    engine = Engine(spark)
    engine.register_testdata(sf_dir)
    if session_variables:
        engine.set_session_variables(**session_variables)
    log = ExecutionLog(spark, table=log_table)
    last = log.get_last_successful_load(target_table)
    full = last is None or not engine.table_exists(target_table)
    started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    batch = engine.execute_query_from_file(
        sql_path,
        substitutions=substitutions,
        incremental_column=None if full else incremental_column,
        last_load_value=None if full else last,
    )
    batch.persist()
    try:
        if full:
            engine.drop_managed_table(target_table)  # clear any stale location
        batch.write.mode("overwrite" if full else "append").saveAsTable(target_table)
        stats = batch.agg(
            F.max(incremental_column).alias("hwm"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        log.record(
            object_name=target_table,
            status="SUCCESS",
            started_at=started,
            rows_affected=stats["n"],
            high_watermark=None if stats["hwm"] is None else str(stats["hwm"]),
        )
    finally:
        batch.unpersist()
    return spark.table(target_table)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--report-dir")
    ap.add_argument("--carrier-name", default="ACME")
    ap.add_argument("--report-start-dt", default="2024-01-01 00:00:00")
    ap.add_argument("--report-end-dt", default="2024-01-15 00:00:00")
    ap.add_argument("--show", type=int, default=10)
    ap.add_argument(
        "--incremental",
        metavar="SQL:TABLE:COLUMN",
        help="run one watermark-driven load instead of the report steps, "
        "e.g. reports/incremental_orders/orders_batch.sql:orders_inc:o_orderdate",
    )
    ap.add_argument("--log-table", default="execution_log")
    args = ap.parse_args()

    from etl_reporting_spark.session import get_spark

    spark = get_spark("report_runner")
    if args.incremental:
        sql_path, target, column = args.incremental.split(":")
        result = incremental_table_load(
            spark,
            sql_path,
            target,
            column,
            args.sf_dir,
            substitutions={"BATCH_CUTOFF": args.report_end_dt},
            log_table=args.log_table,
        )
    elif not args.report_dir:
        ap.error("--report-dir is required unless --incremental is given")
    else:
        result = run_report(
            spark,
            args.report_dir,
            args.sf_dir,
            {
                "CARRIER_NAME": args.carrier_name,
                "REPORT_START_DT": args.report_start_dt,
                "REPORT_END_DT": args.report_end_dt,
            },
        )
    if result is not None:
        result.show(args.show, truncate=False)


if __name__ == "__main__":
    main()
