"""Vendored PDF table extractor: write → extract round-trips, the
extractor chain landing on pdflite, and the full S7 ingestion path
(multi-page continuation, classify, combine) over real PDF files."""

from __future__ import annotations

from etl_reporting_spark.datafeeds.pdflite import extract_tables, write_simple_table_pdf


ROWS = [
    ["policy", "claimant", "amount"],
    ["P-1001", "Adams (primary)", "1250.50"],
    ["P-1002", "Brown", "88.00"],
    ["P-1003", "Chen \\ co", "420.75"],
    ["P-1004", "Davis", "9.99"],
]


def test_roundtrip_uncompressed(tmp_path):
    p = tmp_path / "plain.pdf"
    write_simple_table_pdf(str(p), ROWS)
    (t,) = extract_tables(str(p))
    assert list(t.columns) == ROWS[0]
    assert t.values.tolist() == [r for r in ROWS[1:]]


def test_roundtrip_flate_compressed(tmp_path):
    p = tmp_path / "flate.pdf"
    write_simple_table_pdf(str(p), ROWS, compress=True)
    (t,) = extract_tables(str(p))
    assert t.values.tolist() == [r for r in ROWS[1:]]


def test_unreadable_pdf_yields_no_tables(tmp_path):
    p = tmp_path / "junk.pdf"
    p.write_bytes(b"%PDF-1.4\nnot really a pdf body\n%%EOF\n")
    assert extract_tables(str(p)) == []


def test_extractor_chain_lands_on_pdflite(tmp_path):
    """With pdfplumber/tabula/camelot absent, extract_pdf_tables must
    fall through to pdflite and return the table instead of raising."""
    from etl_reporting_spark.datafeeds.pdf_tables import extract_pdf_tables

    p = tmp_path / "chain.pdf"
    write_simple_table_pdf(str(p), ROWS)
    (t,) = extract_pdf_tables(str(p))
    assert list(t.columns) == ROWS[0] and len(t) == 4


def test_s7_pipeline_end_to_end_from_pdf_files(spark, tmp_path):
    """The whole S7 path against actual PDFs: a detail page, an
    unnamed-header continuation page, and a summary table — extracted,
    header-continued, classified, combined, ingested into Spark."""
    import pandas as pd

    from etl_reporting_spark.datafeeds.pdf_tables import (
        classify_table,
        combine_extracted_tables,
        continue_headers,
        extract_pdf_tables,
    )

    page1 = tmp_path / "page1.pdf"
    page2 = tmp_path / "page2.pdf"
    summary = tmp_path / "summary.pdf"
    write_simple_table_pdf(
        str(page1),
        [["policy", "amount"], ["P-1", "10"], ["P-2", "20"], ["P-3", "30"], ["P-4", "40"]],
    )
    # continuation page: positional headers (pandas-style unnamed)
    write_simple_table_pdf(
        str(page2), [["Unnamed: 0", "Unnamed: 1"], ["P-5", "50"], ["P-6", "60"],
                     ["P-7", "70"], ["P-8", "80"]],
    )
    write_simple_table_pdf(str(summary), [["label", "value"], ["Grand Total", "360"]])

    tables = []
    for f in (page1, page2, summary):
        tables.extend(extract_pdf_tables(str(f)))
    assert len(tables) == 3
    fixed = continue_headers(tables)
    assert list(fixed[1].columns) == ["policy", "amount"]  # header inherited
    assert classify_table(fixed[2]) == "summary"

    detail = combine_extracted_tables(spark, tables, kind="detail")
    got = {(r["policy"], r["amount"]) for r in detail.collect()}
    assert got == {(f"P-{i}", str(i * 10)) for i in range(1, 9)}

    assert isinstance(fixed[0], pd.DataFrame)
