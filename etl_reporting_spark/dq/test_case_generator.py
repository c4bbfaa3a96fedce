"""Reconciliation test-case generator (SURVEY §5 layer 4).

Re-expresses tools/sql_test_case_generator.py:62-257: given
(table, column, pk, filter) mappings, synthesize per-column
reconciliation queries — row count, duplicate-PK with TRIM, SUM for
amount-ish columns, COUNT + GROUP BY distribution otherwise — to be
run on both source and target and compared. The reference emits
SQL-Server-dialect strings for the source side; here both sides are
Spark/ANSI SQL and ``run_reconciliation`` executes and diffs them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ColumnMapping:
    """One row of the reference's Excel mapping sheet
    (tools/sql_test_case_generator.py:152-188)."""

    table: str
    column: str
    primary_key: str
    filter_column: str = ""  # optional date column for a rolling window
    window_days: int = 7


def _window_predicate(m: ColumnMapping) -> str:
    if not m.filter_column:
        return ""
    return (
        f" WHERE {m.filter_column} >= date_sub(current_date(), {m.window_days})"
    )


def generate_test_sql(m: ColumnMapping) -> dict[str, str]:
    """The per-column query battery (reference :62-150)."""
    where = _window_predicate(m)
    out = {
        "row_count": f"SELECT COUNT(*) AS n FROM {m.table}{where}",
        "duplicate_pk": (
            f"SELECT TRIM(CAST({m.primary_key} AS STRING)) AS pk, COUNT(*) AS n"
            f" FROM {m.table}{where} GROUP BY 1 HAVING COUNT(*) > 1"
        ),
    }
    if "amt" in m.column.lower() or "amount" in m.column.lower() or "price" in m.column.lower():
        out["sum_amount"] = (
            f"SELECT CAST(SUM(CAST({m.column} AS DECIMAL(18,2))) AS DOUBLE) AS total"
            f" FROM {m.table}{where}"
        )
    else:
        out["value_distribution"] = (
            f"SELECT {m.column} AS value, COUNT(*) AS n FROM {m.table}{where}"
            f" GROUP BY 1"
        )
    return out


def run_reconciliation(
    spark: SparkSession,
    mapping: ColumnMapping,
    source_table: str,
    target_table: str,
) -> DataFrame:
    """Run the generated battery against source and target tables and
    report match/mismatch per check — the comparison the reference
    leaves to a human spreadsheet, done engine-side.

    The diff is a symmetric difference computed in the engine
    (``exceptAll`` both ways + isEmpty), never a driver-side collect:
    a value_distribution over a high-cardinality column stays
    distributed no matter how many groups it has."""
    results = []
    for check, sql in generate_test_sql(mapping).items():
        src = spark.sql(sql.replace(mapping.table, source_table, 1))
        tgt = spark.sql(sql.replace(mapping.table, target_table, 1))
        matches = src.exceptAll(tgt).union(tgt.exceptAll(src)).isEmpty()
        results.append(
            (
                mapping.table,
                mapping.column,
                check,
                "MATCH" if matches else "MISMATCH",
                src.count(),
                tgt.count(),
            )
        )
    return spark.createDataFrame(
        results,
        "table string, column string, check string, status string, src_rows long, tgt_rows long",
    )


def load_mappings_excel(
    path: str, sheet_name: str | None = None
) -> "list[ColumnMapping]":
    """Column mappings from the reference's Excel workbook format
    (tools/sql_test_case_generator.py:152-188: one row per mapping,
    columns table/column/primary_key/filter_column[/window_days]).
    Reads through the shared xlsx backend (openpyxl when installed,
    vendored xlsxlite otherwise), like every Excel surface in this
    engine; the CSV path (ColumnMapping construction from any
    iterable) remains equivalent."""
    from etl_reporting_spark.datafeeds.writers import xlsx_backend

    backend = xlsx_backend()
    wb = backend.load_workbook(str(path), read_only=True, data_only=True)
    ws = wb[sheet_name] if sheet_name else wb.active
    rows = ws.iter_rows(values_only=True)
    header = [str(c).strip().lower() if c else "" for c in next(rows)]
    idx = {name: header.index(name) for name in header if name}
    out: list[ColumnMapping] = []
    for r in rows:
        if r is None or all(v is None for v in r):
            continue
        out.append(
            ColumnMapping(
                table=str(r[idx["table"]]),
                column=str(r[idx["column"]]),
                primary_key=str(r[idx["primary_key"]]),
                filter_column=str(r[idx["filter_column"]] or "") if "filter_column" in idx else "",
                window_days=int(r[idx["window_days"]] or 7) if "window_days" in idx else 7,
            )
        )
    wb.close()
    return out
