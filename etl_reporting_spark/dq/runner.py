"""CSV-spec-driven DQ test runner.

Mirrors the reference's test framework entry point
(test_framework_run.py:20-105 + tools/test_framework_helper.py):

1. load a CSV of test cases, keep ``is_enabled`` rows
   (test_framework_helper.py:22-36)
2. resolve each case to either a check-type function (checks.py) or a
   templated SQL block (``-- START_TEST``/``@NAME:``/``@QUERY:``
   parsing, :117-163) with ``{placeholder}`` rendering (:214-222)
3. execute; empty result ⇒ PASS, rows ⇒ FAIL with failure count
   (:584-629)
4. produce a summary DataFrame and optionally raise when any test
   fails (:632-698, OneOrMoreTestCasesFailedException)
"""

from __future__ import annotations

import csv
import re
from dataclasses import dataclass, field
from pathlib import Path

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_reporting_spark.dq import checks as C

_BLOCK_RE = re.compile(
    r"--\s*START_TEST\s*(.*?)--\s*END_TEST", re.DOTALL | re.IGNORECASE
)
_NAME_RE = re.compile(r"--\s*@NAME:\s*(\S+)", re.IGNORECASE)
_QUERY_RE = re.compile(r"--\s*@QUERY:\s*(.*)", re.DOTALL | re.IGNORECASE)


class OneOrMoreTestCasesFailedException(Exception):
    pass


def parse_test_blocks(sql_text: str) -> dict[str, str]:
    """``@NAME`` → ``@QUERY`` map from a templated SQL file
    (test_framework_helper.py:117-163)."""
    out: dict[str, str] = {}
    for block in _BLOCK_RE.findall(sql_text):
        name_m = _NAME_RE.search(block)
        query_m = _QUERY_RE.search(block)
        if name_m and query_m:
            out[name_m.group(1)] = query_m.group(1).strip()
    return out


@dataclass
class TestCaseSpec:
    test_id: str
    check_type: str
    table: str
    column: str = ""
    parent_table: str = ""
    parent_column: str = ""
    default_value: str = ""
    is_enabled: bool = True
    params: dict[str, str] = field(default_factory=dict)


def load_specs_csv(path: str | Path) -> list[TestCaseSpec]:
    specs: list[TestCaseSpec] = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            enabled = str(row.get("is_enabled", "1")).strip().lower() in ("1", "true", "y", "yes")
            specs.append(
                TestCaseSpec(
                    test_id=row["test_id"],
                    check_type=row["check_type"].strip().upper(),
                    table=row["table"],
                    column=row.get("column", "") or "",
                    parent_table=row.get("parent_table", "") or "",
                    parent_column=row.get("parent_column", "") or "",
                    default_value=row.get("default_value", "") or "",
                    is_enabled=enabled,
                )
            )
    return [s for s in specs if s.is_enabled]


def synthesize_carrier_condition(
    columns: Sequence[str], carrier: str | None
) -> tuple[Column, str]:
    """Multi-tenant check scoping by schema introspection, the
    reference's carrier-condition synthesis
    (tools/test_framework_helper.py:180-208): pick the predicate from
    the table's own columns —

    - ``carrier_name`` column       → ``carrier_name = '<carrier>'``
    - ``carrier_name_dim_id`` column → ``… = md5('<carrier>')``
    - neither (or no carrier given)  → ``1=1`` (unscoped)

    Returns the predicate twice: as a Column for DataFrame checks and
    as a SQL fragment for templated-SQL checks. Embedded quotes are
    doubled so a carrier like "O'BRIEN" can't break the SQL form.
    """
    if not carrier:
        return F.lit(True), "1=1"
    esc = carrier.replace("'", "''")
    if "carrier_name" in columns:
        return F.col("carrier_name") == F.lit(carrier), f"carrier_name = '{esc}'"
    if "carrier_name_dim_id" in columns:
        return (
            F.col("carrier_name_dim_id") == F.md5(F.lit(carrier)),
            f"carrier_name_dim_id = md5('{esc}')",
        )
    return F.lit(True), "1=1"


@dataclass
class DQRunner:
    spark: SparkSession
    template_sql: dict[str, str] = field(default_factory=dict)
    carrier: str | None = None

    def run_spec(self, spec: TestCaseSpec) -> C.CheckResult:
        df = self.spark.table(spec.table)
        scope, scope_sql = synthesize_carrier_condition(df.columns, self.carrier)
        df = df.filter(scope)
        ct = spec.check_type
        if ct == "UNIQUE_CHECK":
            failures = C.unique_check(df, spec.column)
        elif ct == "COMBINATION_COLUMN_UNIQUE_CHECK":
            failures = C.combination_unique_check(df, [c.strip() for c in spec.column.split("|")])
        elif ct == "ORPHAN_CHECK":
            parent = self.spark.table(spec.parent_table)
            failures = C.orphan_check(df, parent, spec.column, spec.parent_column or None)
        elif ct == "NOT_NULL_CHECK":
            failures = C.not_null_check(df, spec.column)
        elif ct == "DEFAULT_VALUE_CHECK":
            failures = C.default_value_check(df, spec.column, spec.default_value)
        elif ct == "NEGATIVE_VALUE_CHECK":
            failures = C.negative_value_check(df, spec.column)
        elif ct == "ZERO_VALUE_CHECK":
            failures = C.zero_value_check(df, spec.column)
        elif ct == "TEMPLATED_SQL":
            rendered = self.template_sql[spec.column].format(
                table=spec.table, carrier_name_condition=scope_sql, **spec.params
            )
            failures = self.spark.sql(rendered)
        else:
            raise ValueError(f"unknown check type: {ct}")
        return C.evaluate(spec.test_id, failures)

    def run(self, specs: list[TestCaseSpec], raise_on_failure: bool = True) -> DataFrame:
        results = [self.run_spec(s) for s in specs]
        summary = self.spark.createDataFrame(
            [(r.test_id, r.status, r.failed_rows, r.business_impact) for r in results],
            "test_id string, status string, failed_rows long, business_impact string",
        )
        if raise_on_failure and any(r.status == "FAIL" for r in results):
            failed = [r.test_id for r in results if r.status == "FAIL"]
            raise OneOrMoreTestCasesFailedException(f"failed: {failed}")
        return summary
