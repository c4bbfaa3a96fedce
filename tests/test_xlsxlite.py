"""Vendored xlsx backend: the subset contract writers.py relies on.

The formatted-workbook and Excel source/sink round-trips live in
test_io_feeds_streaming (they run on whichever backend is resolved);
these tests pin xlsxlite itself — including reading files this module
did NOT write (shared strings, as produced by real Excel/openpyxl).
"""

from __future__ import annotations

import datetime as dt
import zipfile

from etl_reporting_spark.datafeeds import xlsxlite
from etl_reporting_spark.datafeeds.xlsxlite import (
    Font,
    Workbook,
    column_index,
    get_column_letter,
    load_workbook,
)


def test_column_letters_roundtrip():
    for i in (1, 26, 27, 52, 702, 703, 16384):
        assert column_index(get_column_letter(i)) == i
    assert get_column_letter(1) == "A"
    assert get_column_letter(27) == "AA"
    assert get_column_letter(703) == "AAA"


def test_workbook_roundtrip_values_styles_merges(tmp_path):
    wb = Workbook()
    ws = wb.active
    ws.title = "Report"
    ws.cell(1, 1, "Header").font = Font(bold=True, size=14)
    ws.merge_cells(start_row=1, start_column=1, end_row=1, end_column=3)
    ws.append(["name", "amount", "flag"])
    ws.append(["a", 1, True])
    ws.append(["b", 2.5, False])
    ws.append([None, dt.datetime(2024, 3, 1, 12, 30), None])
    money = ws.cell(3, 2)
    money.number_format = "$#,##0.00"
    ws.column_dimensions["B"].width = 22
    second = wb.create_sheet("Detail")
    second.cell(1, 1, "x < y & z")  # XML escaping
    path = tmp_path / "out.xlsx"
    wb.save(str(path))

    back = load_workbook(path)
    assert back.sheetnames == ["Report", "Detail"]
    rs = back["Report"]
    assert rs.cell(1, 1).value == "Header"
    assert rs.cell(1, 1).font.bold and rs.cell(1, 1).font.size == 14
    assert [m.ref for m in rs.merged_ranges] == ["A1:C1"]
    assert rs.cell(3, 1).value == "a" and rs.cell(3, 2).value == 1
    assert rs.cell(3, 3).value is True and rs.cell(4, 3).value is False
    assert rs.cell(4, 2).value == 2.5  # float survives (not collapsed to int)
    assert rs.cell(3, 2).number_format == "$#,##0.00"
    assert rs.cell(4, 2).number_format == "General"
    assert rs.cell(5, 2).value == "2024-03-01T12:30:00"  # datetime → ISO text
    assert rs.column_dimensions["B"].width == 22
    assert back["Detail"].cell(1, 1).value == "x < y & z"


def test_iter_rows_and_column_indexing(tmp_path):
    wb = Workbook()
    ws = wb.active
    ws.append(["h1", "h2"])
    ws.append([1, None])
    ws.append([None, "x"])
    rows = list(ws.iter_rows(min_row=1, values_only=True))
    assert rows == [("h1", "h2"), (1, None), (None, "x")]
    col_b = ws["B"]
    assert [c.value for c in col_b] == ["h2", "x"]
    assert [c.row for c in col_b] == [1, 3]


def test_reads_shared_strings_files(tmp_path):
    """Files from real Excel/openpyxl store strings in a shared table
    (t="s") rather than inline — the reader must resolve both."""
    decl = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    ssml = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    path = tmp_path / "shared.xlsx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            f'{decl}<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types"><Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/><Default Extension="xml" '
            'ContentType="application/xml"/></Types>',
        )
        z.writestr(
            "_rels/.rels",
            f'{decl}<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
            '" Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'{decl}<workbook xmlns="{ssml}" xmlns:r="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships"><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'{decl}<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            '" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f'{decl}<sst xmlns="{ssml}" count="2" uniqueCount="2">'
            "<si><t>hello</t></si><si><t>world</t></si></sst>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'{decl}<worksheet xmlns="{ssml}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
            '<c r="C1"><v>42</v></c></row></sheetData></worksheet>',
        )
    wb = load_workbook(path)
    assert list(wb["S"].iter_rows(values_only=True)) == [("hello", "world", 42)]


def test_backend_namespace_parity():
    """writers.xlsx_backend() callers use openpyxl-shaped attribute
    paths; xlsxlite must expose the same ones."""
    assert xlsxlite.styles.Font is Font
    assert xlsxlite.utils.get_column_letter is get_column_letter
    assert callable(xlsxlite.load_workbook)
