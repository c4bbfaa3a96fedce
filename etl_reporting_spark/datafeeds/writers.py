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
- Excel writer/reader on a pluggable backend: openpyxl when
  installed, the vendored pure-Python ``xlsxlite`` otherwise — the
  reference's flagship formatted-workbook deliverable executes in
  either environment
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


def to_pandas_safe(df: DataFrame) -> pd.DataFrame:
    """``toPandas`` that survives out-of-pandas-range timestamps — the
    SCD2 9999-12-31 open-row sentinel overflows datetime64[ns]
    (ArrowInvalid / OutOfBoundsDatetime). Fast path is the plain Arrow
    conversion; on overflow, re-transfer with ``timestamp_as_object``
    so sentinel instants arrive as ``datetime.datetime`` objects."""
    try:
        return df.toPandas()
    except Exception:
        return df.toArrow().to_pandas(timestamp_as_object=True)


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
    detail = to_pandas_safe(df.orderBy(group_col, *(sort_cols or [])))
    # grouping() disambiguates the grand-total row from a subtotal of a
    # genuinely-NULL group value — both carry NULL in group_col.
    totals = to_pandas_safe(
        df.rollup(group_col).agg(
            *[F.sum(F.col(c)).alias(c) for c in sum_cols],
            F.grouping(group_col).alias("__is_grand"),
        )
    )

    def _ratio(row):
        if ratio is None:
            return {}
        name, num, den = ratio
        return {name: (row[num] / row[den]) if row[den] else None}

    frames: list[pd.DataFrame] = []
    subtotals = totals[totals["__is_grand"] == 0]
    grand = totals[totals["__is_grand"] == 1]
    # dropna=False: rows with a NULL group value stay in the report
    # body (labelled subtotal) so subtotals reconcile with the grand
    # total, which always includes them.
    for grp, chunk in detail.groupby(group_col, sort=True, dropna=False):
        frames.append(chunk)
        if pd.isna(grp):
            sub = subtotals[subtotals[group_col].isna()]
            label = "(null) Total"
        else:
            sub = subtotals[subtotals[group_col] == grp]
            label = f"{grp} Total"
        if not sub.empty:
            row = {label_col: label}
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
    out = pd.concat(frames, ignore_index=True).drop(columns="__is_grand", errors="ignore")
    return out


def write_csv(df: DataFrame, path: str | Path, crlf: bool = False, single_file: bool = True) -> None:
    """CSV sink. ``single_file`` collects through pandas (report-scale
    outputs, matching the reference's client-side write); otherwise a
    distributed ``df.write.csv`` with the requested line separator."""
    if single_file:
        pdf = to_pandas_safe(df)
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


def xlsx_backend():
    """openpyxl when installed (full-fidelity formatting), else the
    vendored pure-Python ``xlsxlite`` (same API subset — xlsx is just
    zip+XML). Every Excel surface in the engine resolves through this
    hook, so the reference's flagship workbook deliverable executes
    for real even in dependency-free containers."""
    try:
        import openpyxl

        return openpyxl
    except ImportError:
        from etl_reporting_spark.datafeeds import xlsxlite

        return xlsxlite


# Backwards-compatible alias from the import-gated era; callers that
# used it now always get a working backend.
_require_openpyxl = xlsx_backend


@dataclass
class WorkbookStyle:
    """Presentation knobs for formatted workbooks (the role of the
    reference's YAML font config, multiple_worksheets_with_formatting
    .py:92-266)."""

    font_name: str = "Calibri"
    title_size: int = 14
    header_size: int = 11
    header_fill: str = "D9D9D9"
    column_width: int = 18
    dollar_format: str = "$#,##0.00"


def write_formatted_workbook(
    sheets: "dict[str, pd.DataFrame]",
    path: str | Path,
    carrier_name: str = "",
    report_name: str = "",
    report_start_dt: str | None = None,
    report_end_dt: str | None = None,
    dollar_columns: Sequence[str] = (),
    specific_column_widths: "dict[str, int] | None" = None,
    style: WorkbookStyle | None = None,
    total_label_suffix: str = "Total",
) -> None:
    """Multi-worksheet formatted workbook — the reference's flagship
    deliverable (multiple_worksheets_with_formatting.py:92-266,
    claims_reports.py:134-347), re-expressed:

    - one worksheet per ``sheets`` entry, written in dict order
    - a 3-row merged report header per sheet: carrier (left) /
      "Page i of n" (right), report name, and the date range
    - a bold, filled table-header row with wrapped text
    - uniform column widths with per-column overrides
    - ``$#,##0.00`` number format on designated dollar columns
    - bold rows whose first cell ends with ``total_label_suffix`` (the
      interleaved subtotal/grand-total rows from grouped_report_frame)

    Runs on openpyxl when installed, else on the vendored pure-Python
    xlsxlite backend — the Spark-side aggregation/interleave lives in
    grouped_report_frame; this function is presentation only.
    """
    xl = xlsx_backend()
    Workbook = xl.Workbook
    Alignment, Font, PatternFill = xl.styles.Alignment, xl.styles.Font, xl.styles.PatternFill
    get_column_letter = xl.utils.get_column_letter

    style = style or WorkbookStyle()
    wb = Workbook()
    wb.remove(wb.active)
    n_pages = len(sheets)
    for page, (sheet_name, frame) in enumerate(sheets.items(), start=1):
        ws = wb.create_sheet(title=sheet_name[:31])
        ncols = max(len(frame.columns), 2)
        title_font = Font(name=style.font_name, size=style.title_size, bold=True)

        ws.cell(row=1, column=1, value=carrier_name).font = title_font
        ws.merge_cells(start_row=1, start_column=1, end_row=1, end_column=ncols // 2)
        right = ws.cell(row=1, column=ncols // 2 + 1, value=f"Page {page} of {n_pages}")
        right.font = title_font
        right.alignment = Alignment(horizontal="right")
        ws.merge_cells(
            start_row=1, start_column=ncols // 2 + 1, end_row=1, end_column=ncols
        )
        ws.cell(row=2, column=1, value=report_name).font = title_font
        ws.merge_cells(start_row=2, start_column=1, end_row=2, end_column=ncols)
        if report_start_dt and report_end_dt:
            dates = f"For Dates: {report_start_dt} To {report_end_dt}"
        else:
            dates = ""
        ws.cell(row=3, column=1, value=dates).font = Font(
            name=style.font_name, size=style.header_size, bold=True
        )
        ws.merge_cells(start_row=3, start_column=1, end_row=3, end_column=ncols)

        header_row = 5
        for col, name in enumerate(frame.columns, start=1):
            cell = ws.cell(row=header_row, column=col, value=str(name))
            cell.font = Font(name=style.font_name, size=style.header_size, bold=True)
            cell.fill = PatternFill(fill_type="solid", fgColor=style.header_fill)
            cell.alignment = Alignment(horizontal="center", wrap_text=True)

        for r, row in enumerate(frame.itertuples(index=False), start=header_row + 1):
            first = row[0]
            is_total = isinstance(first, str) and first.endswith(total_label_suffix)
            for c, value in enumerate(row, start=1):
                cell = ws.cell(row=r, column=c, value=None if pd.isna(value) else value)
                if is_total:
                    cell.font = Font(name=style.font_name, bold=True)

        for col in range(1, len(frame.columns) + 1):
            letter = get_column_letter(col)
            width = (specific_column_widths or {}).get(
                str(frame.columns[col - 1]), style.column_width
            )
            ws.column_dimensions[letter].width = width
        for colname in dollar_columns:
            if colname in frame.columns:
                letter = get_column_letter(list(frame.columns).index(colname) + 1)
                for cell in ws[letter]:
                    if cell.row > header_row:
                        cell.number_format = style.dollar_format
    wb.save(str(path))


def write_excel(df: DataFrame, path: str | Path, sheet_name: str = "Report") -> None:
    """Single-sheet Excel sink: header row + data rows, no formatting.
    Backend-portable (openpyxl or vendored xlsxlite) — built cell-wise
    instead of pandas ``to_excel`` so both backends serve it."""
    xl = xlsx_backend()
    pdf = to_pandas_safe(df)
    wb = xl.Workbook()
    ws = wb.active
    ws.title = sheet_name
    ws.append([str(c) for c in pdf.columns])
    for row in pdf.itertuples(index=False):
        ws.append([v.item() if hasattr(v, "item") else v for v in row])
    wb.save(str(path))


def read_excel(
    spark: SparkSession,
    path: str | Path,
    sheet_name: str | None = None,
    header_row: int = 1,
) -> DataFrame:
    """Excel source (SURVEY S6) — sheet iteration to a Spark
    DataFrame: row ``header_row`` provides column names, every later
    row becomes a data row (values as read; cast downstream). Mirrors
    the reference's mapping-sheet ingestion
    (tools/sql_test_case_generator.py:152-188) generically; reads via
    openpyxl when installed, the vendored xlsxlite otherwise."""
    backend = xlsx_backend()
    wb = backend.load_workbook(str(path), read_only=True, data_only=True)
    ws = wb[sheet_name] if sheet_name else wb.active
    rows = ws.iter_rows(min_row=header_row, values_only=True)
    header = [str(c) if c is not None else f"_c{i}" for i, c in enumerate(next(rows))]
    data = [tuple(r) for r in rows if any(v is not None for v in r)]
    wb.close()
    pdf = pd.DataFrame(data, columns=header)
    return spark.createDataFrame(pdf)


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

    def recent(self, n: int = 100, object_name: str | None = None) -> DataFrame:
        """Query-history read-back (reference ``get_query_history``,
        connector/snowpark_connector.py:585-601): the ``n`` most recent
        executions, newest first, optionally scoped to one object.
        Top-k over the log — TakeOrderedAndProject, no full sort."""
        from pyspark.sql import functions as F

        if not self.spark.catalog.tableExists(self.table):
            return self.spark.createDataFrame(
                [],
                "execution_id string, object_name string, status string, "
                "execution_start_ts string, execution_end_ts string, "
                "query_duration string, rows_affected long, high_watermark string",
            )
        df = self.spark.table(self.table)
        if object_name is not None:
            df = df.filter(F.col("object_name") == object_name)
        return df.orderBy(F.col("execution_start_ts").desc()).limit(n)

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
