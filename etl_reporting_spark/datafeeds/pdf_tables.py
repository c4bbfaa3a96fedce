"""PDF table ingestion pipeline (S7).

The reference extracts tables from PDFs with pdfplumber/tabula/
camelot, classifies each as detail vs summary, then combines
differing schemas by union-of-columns
(datafeeds/pdf_table_extractor.py:99-509). None of those PDF
libraries exist in this environment, so EXTRACTION is an import-gated
stub — but the downstream pipeline (header continuation, detail/
summary classification, union-of-columns combine, Spark ingestion) is
real and tested over plain DataFrames, which is exactly what the PDF
step produces.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_reporting_spark.operators.relational import union_by_name_allow_missing


def extract_pdf_tables(path: str) -> list[pd.DataFrame]:
    """Extract raw tables from a PDF — requires pdfplumber (reference
    :99-292 falls back pdfplumber → tabula → camelot)."""
    try:
        import pdfplumber  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "no PDF extraction library installed; feed extracted tables "
            "to combine_extracted_tables/ingest_tables directly"
        ) from e
    raise NotImplementedError  # pragma: no cover


def continue_headers(tables: Sequence[pd.DataFrame]) -> list[pd.DataFrame]:
    """Multi-page continuation heuristic (reference :198-236): a table
    whose columns are unnamed/positional inherits the previous
    table's header when the column count matches."""
    out: list[pd.DataFrame] = []
    prev_cols: list[str] | None = None
    for t in tables:
        cols = list(t.columns)
        unnamed = all(str(c).startswith("Unnamed") or isinstance(c, int) for c in cols)
        if unnamed and prev_cols is not None and len(cols) == len(prev_cols):
            t = t.copy()
            t.columns = prev_cols
        else:
            prev_cols = cols
        out.append(t)
    return out


def classify_table(t: pd.DataFrame, summary_keywords: Sequence[str] = ("total", "subtotal")) -> str:
    """Detail vs summary classifier (reference :294-345): summary
    tables are short and keyword-laden; detail tables are long with
    mostly-distinct first columns."""
    if t.empty:
        return "summary"
    first_col = t.iloc[:, 0].astype(str).str.lower()
    kw_hits = first_col.str.contains("|".join(summary_keywords), regex=True).mean()
    if kw_hits > 0.2 or len(t) <= 3:
        return "summary"
    return "detail"


def combine_extracted_tables(
    spark: SparkSession, tables: Sequence[pd.DataFrame], kind: str = "detail"
) -> DataFrame | None:
    """Union-of-columns combine (reference :421-509): keep tables of
    the requested kind, align headers across pages, union by name with
    missing columns null-filled."""
    fixed = continue_headers(tables)
    kept = [t for t in fixed if classify_table(t) == kind]
    if not kept:
        return None
    dfs = [spark.createDataFrame(t.astype(str)) for t in kept]
    return union_by_name_allow_missing(dfs)
