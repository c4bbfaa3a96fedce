"""PDF table ingestion pipeline (S7).

The reference extracts tables from PDFs with pdfplumber/tabula/
camelot, classifies each as detail vs summary, then combines
differing schemas by union-of-columns
(datafeeds/pdf_table_extractor.py:99-509). The extractor chain here
tries those libraries in the reference's order where installed, then
falls back to the vendored pure-Python ``pdflite`` — which reads the
text-positioned table structure machine-generated report PDFs carry,
so simple-PDF ingestion executes for real even in this dependency-free
container. Rich PDFs without the heavyweight libraries still raise
the honest NotImplementedError naming every attempt. The downstream
pipeline (header continuation, detail/summary classification,
union-of-columns combine, Spark ingestion) is library-independent.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etl_reporting_spark.operators.relational import union_by_name_allow_missing


def _extract_with_pdfplumber(path: str) -> list[pd.DataFrame]:
    import pdfplumber

    tables: list[pd.DataFrame] = []
    with pdfplumber.open(path) as pdf:  # pragma: no cover - lib absent here
        for page in pdf.pages:
            for raw in page.extract_tables():
                if raw and len(raw) > 1:
                    tables.append(pd.DataFrame(raw[1:], columns=raw[0]))
    return tables


def _extract_with_tabula(path: str) -> list[pd.DataFrame]:
    import tabula

    return tabula.read_pdf(  # pragma: no cover - lib absent here
        path, pages="all", multiple_tables=True
    )


def _extract_with_camelot(path: str) -> list[pd.DataFrame]:
    import camelot

    return [t.df for t in camelot.read_pdf(path, pages="all")]  # pragma: no cover


def _extract_with_pdflite(path: str) -> list[pd.DataFrame]:
    from etl_reporting_spark.datafeeds import pdflite

    return pdflite.extract_tables(path)


DEFAULT_EXTRACTORS: tuple[tuple[str, object], ...] = (
    ("pdfplumber", _extract_with_pdfplumber),
    ("tabula", _extract_with_tabula),
    ("camelot", _extract_with_camelot),
    ("pdflite", _extract_with_pdflite),
)


def extract_pdf_tables(path: str, extractors=DEFAULT_EXTRACTORS) -> list[pd.DataFrame]:
    """Extract raw tables from a PDF via the reference's fallback chain
    (pdf_table_extractor.py:99-292): try each extractor in order —
    pdfplumber, then tabula, then camelot, then the vendored pdflite —
    moving on when a library is missing, errors out, or finds no
    tables. Raises NotImplementedError naming every attempt when the
    whole chain comes up empty (in this container that means: the
    three libraries absent AND the PDF's structure beyond pdflite's
    text-positioned-table subset)."""
    attempts: list[str] = []
    for name, fn in extractors:
        try:
            tables = fn(path)
        except ImportError:
            attempts.append(f"{name}: not installed")
            continue
        except Exception as e:  # noqa: BLE001 - any extractor failure falls through
            attempts.append(f"{name}: {type(e).__name__}: {e}")
            continue
        if tables:
            return list(tables)
        attempts.append(f"{name}: no tables found")
    raise NotImplementedError(
        "PDF extraction failed (" + "; ".join(attempts) + "); feed extracted "
        "tables to combine_extracted_tables/ingest_tables directly"
    )


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
