"""Config-as-data models + YAML loaders.

Mirrors the reference's Pydantic-validated configuration surface:
- ``DatamartTable`` (models/custom_models.py:39-99) — identifiers
  uppercased by validation, the engine-facing description of one
  datamart load
- report YAML (datafeeds/common/claims_reports.py:430-457 /
  excel_csv_writer.py:77-94) — carrier/report/table/sheet/pre-SQL
  keys with required-key validation
- datamart YAML loading (tools/datamart_configuration.py:29-76)
"""

from __future__ import annotations

from pathlib import Path

import yaml
from pydantic import BaseModel, field_validator


class DatamartTable(BaseModel):
    """One datamart table load (reference models/custom_models.py:39-99).
    Identifier fields are uppercased, as the reference validates."""

    source_database: str
    target_database: str
    target_schema: str = "PUBLIC"
    table_name: str
    carrier_name: str = ""
    write_mode: str = "overwrite"
    table_type: str = "permanent"
    incremental_column: str = ""
    join_keys: list[str] = []

    @field_validator(
        "source_database", "target_database", "target_schema", "table_name", mode="after"
    )
    @classmethod
    def _upper(cls, v: str) -> str:
        return v.upper()


class ReportConfig(BaseModel):
    """Datafeed report YAML (excel_csv_writer.py:77-94)."""

    carrier_name: str
    report_name: str
    tables_list: list[str]
    sheetnames: list[str] = []
    pre_sql_query: str = ""
    columns: list[str] = []
    exclude_columns: list[str] = []
    filter_rows: str = ""
    sorting_columns: list[str] = []

    @field_validator("sheetnames", mode="after")
    @classmethod
    def _match_tables(cls, v, info):
        tables = info.data.get("tables_list") or []
        if v and len(v) != len(tables):
            raise ValueError("sheetnames must match tables_list length")
        return v


def load_report_config(path: str | Path) -> ReportConfig:
    return ReportConfig(**yaml.safe_load(Path(path).read_text()))


def load_datamart_tables(path: str | Path) -> list[DatamartTable]:
    raw = yaml.safe_load(Path(path).read_text())
    items = raw["tables"] if isinstance(raw, dict) and "tables" in raw else raw
    return [DatamartTable(**item) for item in items]
