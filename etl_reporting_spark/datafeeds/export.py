"""Datafeed export CLI — lifecycle entry point 2 (§3): YAML report
config → query synthesis (columns / EXCLUDE / filter / sort) →
CSV (or grouped-report CSV) → batch-control audit row.

Mirrors datafeeds/common/excel_csv_writer.py:77-481: the reference
builds ``SELECT {cols|* EXCLUDE(...)} FROM {table} [WHERE ...]
[ORDER BY ...]`` per configured table and writes one sheet/file per
table; aggregation beyond the reference's client-side subtotals runs
in Spark here (grouped_report_frame).

Usage:
    python -m etl_reporting_spark.datafeeds.export \
        --config feed.yml --sf-dir /root/testdata/sf0.001 --out-dir /tmp/feed
"""

from __future__ import annotations

import argparse
import datetime as dt
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_reporting_spark.config import ReportConfig, load_report_config
from etl_reporting_spark.datafeeds.writers import ExecutionLog, write_csv
from etl_reporting_spark.io import Engine


def synthesize_feed_query(spark: SparkSession, cfg: ReportConfig, table: str) -> DataFrame:
    """The reference's per-table SELECT synthesis
    (excel_csv_writer.py:330-343 / claims_reports.py:399-409)."""
    df = spark.table(table)
    if cfg.columns:
        df = df.select(*cfg.columns)
    elif cfg.exclude_columns:
        df = df.drop(*cfg.exclude_columns)
    if cfg.filter_rows:
        df = df.filter(F.expr(cfg.filter_rows.format(carrier_name=cfg.carrier_name)))
    if cfg.sorting_columns:
        df = df.orderBy(*cfg.sorting_columns)
    return df


def run_export(
    spark: SparkSession,
    cfg: ReportConfig,
    sf_dir: str,
    out_dir: str | Path,
    log_table: str | None = None,
) -> list[Path]:
    engine = Engine(spark)
    engine.register_testdata(sf_dir)
    if cfg.pre_sql_query:
        for stmt in cfg.pre_sql_query.format(carrier_name=cfg.carrier_name).splitlines():
            if stmt.strip():
                engine.execute_query(stmt, lazy=False)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for i, table in enumerate(cfg.tables_list):
        name = cfg.sheetnames[i] if cfg.sheetnames else table
        started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        df = synthesize_feed_query(spark, cfg, table)
        path = out_dir / f"{cfg.report_name}_{name}.csv"
        write_csv(df, path, crlf=True)
        written.append(path)
        if log_table:
            ExecutionLog(spark, table=log_table).record(
                object_name=f"{cfg.report_name}.{name}", status="SUCCESS", started_at=started
            )
    return written


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args()

    from etl_reporting_spark.session import get_spark

    spark = get_spark("datafeed_export")
    cfg = load_report_config(args.config)
    paths = run_export(spark, cfg, args.sf_dir, args.out_dir)
    for p in paths:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
