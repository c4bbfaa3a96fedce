"""Datafeed export writers + execution audit log.

Re-expresses the reference's report delivery layer:
- grouped report with per-group subtotals interleaved under each
  group, derived ratio columns, and a grand-total row
  (datafeeds/common/claims_reports.py:134-347) — the AGGREGATION runs
  in Spark (one rollup shuffle); only the presentation interleave of
  report-scale output touches pandas, exactly the reference's
  boundary.
- CSV writer with optional CRLF terminator
  (datafeeds/common/excel_csv_writer.py:264-275)
- Excel writer gated behind openpyxl availability (not present in
  this environment; the reference's formatting layer is presentation
  only)
- execution/batch audit log rows appended to a control table
  (connector/snowpark_connector.py:1137-1236;
  excel_csv_writer.py:159-192)
"""

from __future__ import annotations

import datetime as dt
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grouped_report_frame(
    df: DataFrame,
    group_col: str,
    sum_cols: Sequence[str],
    ratio: tuple[str, str, str] | None = None,
    sort_cols: Sequence[str] | None = None,
    total_label_col: str | None = None,
) -> pd.DataFrame:
    """Detail rows with subtotal rows interleaved after each group and
    a grand total last — the worksheet shape of
    claims_reports.py:189-258.

    One Spark rollup computes every aggregate; pandas only reorders
    report-scale rows. ``ratio=(name, num, den)`` adds the derived
    rate (e.g. Avg Paid Per Claimant) on subtotal/total rows.
    """
    label_col = total_label_col or group_col
    detail = df.orderBy(group_col, *(sort_cols or [])).toPandas()
    totals = (
        df.rollup(group_col)
        .agg(*[F.sum(F.col(c)).alias(c) for c in sum_cols])
        .toPandas()
    )

    def _ratio(row):
        if ratio is None:
            return {}
        name, num, den = ratio
        return {name: (row[num] / row[den]) if row[den] else None}

    frames: list[pd.DataFrame] = []
    grand = totals[totals[group_col].isna()]
    for grp, chunk in detail.groupby(group_col, sort=True):
        frames.append(chunk)
        sub = totals[totals[group_col] == grp]
        if not sub.empty:
            row = {label_col: f"{grp} Total"}
            for c in sum_cols:
                row[c] = sub.iloc[0][c]
            row.update(_ratio(sub.iloc[0]))
            frames.append(pd.DataFrame([row]))
    if not grand.empty:
        row = {label_col: "Grand Total"}
        for c in sum_cols:
            row[c] = grand.iloc[0][c]
        row.update(_ratio(grand.iloc[0]))
        frames.append(pd.DataFrame([row]))
    out = pd.concat(frames, ignore_index=True)
    return out


def write_csv(df: DataFrame, path: str | Path, crlf: bool = False, single_file: bool = True) -> None:
    """CSV sink. ``single_file`` collects through pandas (report-scale
    outputs, matching the reference's client-side write); otherwise a
    distributed ``df.write.csv`` with the requested line separator."""
    if single_file:
        pdf = df.toPandas()
        pdf.to_csv(path, index=False, lineterminator="\r\n" if crlf else "\n")
    else:
        writer = df.write.option("header", True).mode("overwrite")
        if crlf:
            writer = writer.option("lineSep", "\r\n")
        writer.csv(str(path))


def write_grouped_report_csv(
    df: DataFrame,
    path: str | Path,
    group_col: str,
    sum_cols: Sequence[str],
    ratio: tuple[str, str, str] | None = None,
    crlf: bool = False,
) -> pd.DataFrame:
    frame = grouped_report_frame(df, group_col, sum_cols, ratio=ratio)
    frame.to_csv(path, index=False, lineterminator="\r\n" if crlf else "\n")
    return frame


def write_excel(df: DataFrame, path: str | Path, sheet_name: str = "Report") -> None:
    """Excel sink — requires openpyxl (absent here; the reference's
    font/merge formatting is presentation-layer only)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "openpyxl is not installed in this environment; use write_csv "
            "or install openpyxl to enable formatted workbook output"
        ) from e
    df.toPandas().to_excel(path, sheet_name=sheet_name, index=False)  # pragma: no cover


@dataclass
class ExecutionLog:
    """Append-only execution audit (EXECUTION_ID/START/END/STATUS —
    connector/snowpark_connector.py:1091-1110)."""

    spark: SparkSession
    table: str = "execution_log"

    def record(
        self,
        object_name: str,
        status: str,
        started_at: dt.datetime,
        finished_at: dt.datetime | None = None,
        rows_affected: int | None = None,
        execution_id: str | None = None,
        high_watermark: str | None = None,
    ) -> str:
        execution_id = execution_id or str(uuid.uuid4())
        finished_at = finished_at or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        if not self.spark.catalog.tableExists(self.table):
            # first write in this session: clear any stale managed
            # location left by a previous session's log table
            from etl_reporting_spark.io import Engine

            Engine(self.spark).drop_managed_table(self.table)
        row = [
            (
                execution_id,
                object_name,
                status,
                started_at.isoformat(),
                finished_at.isoformat(),
                str((finished_at - started_at).total_seconds()),
                rows_affected,
                high_watermark,
            )
        ]
        schema = (
            "execution_id string, object_name string, status string, "
            "execution_start_ts string, execution_end_ts string, "
            "query_duration string, rows_affected long, high_watermark string"
        )
        self.spark.createDataFrame(row, schema).write.mode("append").saveAsTable(self.table)
        return execution_id

    def get_last_successful_load(self, object_name: str) -> str | None:
        """Watermark retrieval closing the incremental loop (reference
        connector/snowpark_connector.py:400-464 reading the log written
        at :1137-1236): the greatest ``high_watermark`` over SUCCESS
        rows for the object, or None when the object has never loaded
        — the caller then performs a full load. MAX over history (not
        latest row) so a zero-row run that records a NULL watermark
        can never move the watermark backwards."""
        from pyspark.sql import functions as F

        if not self.spark.catalog.tableExists(self.table):
            return None
        row = (
            self.spark.table(self.table)
            .filter((F.col("object_name") == object_name) & (F.col("status") == "SUCCESS"))
            .agg(F.max("high_watermark").alias("hwm"))
            .collect()[0]
        )
        return row["hwm"]
