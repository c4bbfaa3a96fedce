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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--report-dir", required=True)
    ap.add_argument("--carrier-name", default="ACME")
    ap.add_argument("--report-start-dt", default="2024-01-01 00:00:00")
    ap.add_argument("--report-end-dt", default="2024-01-15 00:00:00")
    ap.add_argument("--show", type=int, default=10)
    args = ap.parse_args()

    from etl_reporting_spark.session import get_spark

    spark = get_spark("report_runner")
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
