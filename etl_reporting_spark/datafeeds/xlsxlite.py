"""Vendored minimal xlsx writer/reader — pure Python, zero deps.

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500
SpreadsheetML); this module implements exactly the subset the engine's
Excel surfaces use (datafeeds/writers.py, dq/test_case_generator.py),
with an openpyxl-compatible API so ``writers.xlsx_backend()`` can
return either library interchangeably:

- ``Workbook`` / ``Worksheet`` with ``cell(row, column, value)``,
  ``append``, ``merge_cells``, ``column_dimensions[letter].width``,
  ``ws[column_letter]``, ``iter_rows(min_row, values_only)``
- ``Font`` (name/size/bold), ``PatternFill`` (solid fg),
  ``Alignment`` (horizontal, wrap_text), per-cell ``number_format``
- ``get_column_letter`` / ``load_workbook`` (values, fonts, number
  formats, and column widths round-trip; shared and inline strings
  both readable so files from real Excel/openpyxl open too)

Strings are written as inline strings (no sharedStrings part — one
fewer indirection, same file validity). Datetimes are written as ISO
text: the engine's report frames carry dates pre-formatted as
strings, so serial-date math is out of scope. Styles are deduplicated
into the styles.xml cellXfs table at save time, the same model
openpyxl uses.

Reference behavior this replaces: the openpyxl import gate on the
formatted-workbook deliverable (reference
datafeeds/common/multiple_worksheets_with_formatting.py:92-266,
claims_reports.py:134-347) — with this module the reference's primary
output format executes in dependency-free containers.
"""

from __future__ import annotations

import re
import zipfile
from dataclasses import dataclass, field
from types import SimpleNamespace
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_SSML = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def get_column_letter(idx: int) -> str:
    """1-based column index → A1-style letters (1→A, 27→AA)."""
    if idx < 1:
        raise ValueError(f"column index must be >= 1, got {idx}")
    out = ""
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def column_index(letters: str) -> int:
    """A1-style letters → 1-based index (inverse of get_column_letter)."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx


@dataclass(frozen=True)
class Font:
    name: str = "Calibri"
    size: float = 11
    bold: bool = False


@dataclass(frozen=True)
class PatternFill:
    fill_type: str | None = None
    fgColor: str = "FFFFFF"  # noqa: N815 — openpyxl-compatible name


@dataclass(frozen=True)
class Alignment:
    horizontal: str | None = None
    wrap_text: bool | None = None


_DEFAULT_FONT = Font()


class Cell:
    __slots__ = ("row", "column", "value", "font", "fill", "alignment", "number_format")

    def __init__(self, row: int, column: int, value=None):
        self.row = row
        self.column = column
        self.value = value
        self.font = _DEFAULT_FONT
        self.fill = PatternFill()
        self.alignment = Alignment()
        self.number_format = "General"

    @property
    def coordinate(self) -> str:
        return f"{get_column_letter(self.column)}{self.row}"


@dataclass
class _ColumnDimension:
    width: float | None = None


class _ColumnDimensions(dict):
    def __missing__(self, key: str) -> _ColumnDimension:
        self[key] = _ColumnDimension()
        return self[key]


@dataclass
class _MergeRange:
    min_row: int
    min_col: int
    max_row: int
    max_col: int

    @property
    def ref(self) -> str:
        return (
            f"{get_column_letter(self.min_col)}{self.min_row}:"
            f"{get_column_letter(self.max_col)}{self.max_row}"
        )


class Worksheet:
    def __init__(self, title: str):
        self.title = title
        self._cells: dict[tuple[int, int], Cell] = {}
        self.column_dimensions = _ColumnDimensions()
        self.merged_ranges: list[_MergeRange] = []
        self._next_append_row = 1

    # -- openpyxl-compatible surface -----------------------------------
    def cell(self, row: int, column: int, value=None) -> Cell:
        c = self._cells.get((row, column))
        if c is None:
            c = Cell(row, column)
            self._cells[(row, column)] = c
        if value is not None:
            c.value = value
        self._next_append_row = max(self._next_append_row, row + 1)
        return c

    def append(self, values) -> None:
        r = self._next_append_row
        for i, v in enumerate(values, start=1):
            if v is not None:
                self.cell(r, i, v)
        self._next_append_row = max(self._next_append_row, r + 1)

    def merge_cells(
        self,
        range_string: str | None = None,
        start_row: int = 1,
        start_column: int = 1,
        end_row: int = 1,
        end_column: int = 1,
    ) -> None:
        if range_string:
            start, end = range_string.split(":")
            (start_column, start_row), (end_column, end_row) = (
                _parse_ref(start),
                _parse_ref(end),
            )
        self.merged_ranges.append(_MergeRange(start_row, start_column, end_row, end_column))

    @property
    def max_row(self) -> int:
        return max((r for r, _ in self._cells), default=0)

    @property
    def max_column(self) -> int:
        return max((c for _, c in self._cells), default=0)

    def __getitem__(self, key: str):
        """``ws["B"]`` → tuple of that column's populated cells in row
        order (the subset of openpyxl indexing the engine uses)."""
        if not re.fullmatch(r"[A-Za-z]+", key):
            raise KeyError(f"only column-letter indexing is supported, got {key!r}")
        col = column_index(key)
        return tuple(
            self._cells[(r, c)] for r, c in sorted(self._cells) if c == col
        )

    def iter_rows(self, min_row: int = 1, max_row: int | None = None, values_only: bool = False):
        top = max_row or self.max_row
        ncols = self.max_column
        for r in range(min_row, top + 1):
            row = tuple(
                self._cells.get((r, c)) or Cell(r, c) for c in range(1, ncols + 1)
            )
            yield tuple(c.value for c in row) if values_only else row


class Workbook:
    def __init__(self):
        self._sheets: list[Worksheet] = [Worksheet("Sheet")]

    @property
    def active(self) -> Worksheet | None:
        return self._sheets[0] if self._sheets else None

    @property
    def sheetnames(self) -> list[str]:
        return [ws.title for ws in self._sheets]

    @property
    def worksheets(self) -> list[Worksheet]:
        return list(self._sheets)

    def __getitem__(self, name: str) -> Worksheet:
        for ws in self._sheets:
            if ws.title == name:
                return ws
        raise KeyError(name)

    def create_sheet(self, title: str | None = None) -> Worksheet:
        ws = Worksheet(title or f"Sheet{len(self._sheets) + 1}")
        self._sheets.append(ws)
        return ws

    def remove(self, ws: Worksheet) -> None:
        self._sheets.remove(ws)

    def close(self) -> None:  # reader-API parity; nothing to release
        pass

    # -- serialization -------------------------------------------------
    def save(self, path: str) -> None:
        _save_workbook(self, str(path))


# ---------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------


@dataclass
class _StyleTable:
    """Deduplicated styles.xml parts. Index 0 of each list is the
    required default; fills additionally reserve index 1 for the
    mandatory gray125 pattern (consumers expect both present)."""

    fonts: list[Font] = field(default_factory=lambda: [_DEFAULT_FONT])
    fills: list[PatternFill] = field(
        default_factory=lambda: [PatternFill(), PatternFill(fill_type="gray125")]
    )
    numfmts: list[str] = field(default_factory=list)
    xfs: list[tuple[int, int, int, Alignment]] = field(
        default_factory=lambda: [(0, 0, 0, Alignment())]
    )
    _xf_index: dict = field(default_factory=dict)

    def xf_for(self, cell: Cell) -> int:
        key = (cell.font, cell.fill, cell.alignment, cell.number_format)
        if key in self._xf_index:
            return self._xf_index[key]
        font_id = self._intern(self.fonts, cell.font)
        fill_id = self._intern(self.fills, cell.fill)
        if cell.number_format == "General":
            numfmt_id = 0
        else:
            if cell.number_format not in self.numfmts:
                self.numfmts.append(cell.number_format)
            numfmt_id = 164 + self.numfmts.index(cell.number_format)
        xf = (font_id, fill_id, numfmt_id, cell.alignment)
        if xf == self.xfs[0]:
            idx = 0
        else:
            self.xfs.append(xf)
            idx = len(self.xfs) - 1
        self._xf_index[key] = idx
        return idx

    @staticmethod
    def _intern(pool: list, item) -> int:
        if item in pool:
            return pool.index(item)
        pool.append(item)
        return len(pool) - 1

    def to_xml(self) -> str:
        parts = [f'<styleSheet xmlns="{_SSML}">']
        if self.numfmts:
            parts.append(f'<numFmts count="{len(self.numfmts)}">')
            for i, fmt in enumerate(self.numfmts):
                parts.append(f'<numFmt numFmtId="{164 + i}" formatCode={quoteattr(fmt)}/>')
            parts.append("</numFmts>")
        parts.append(f'<fonts count="{len(self.fonts)}">')
        for f in self.fonts:
            bold = "<b/>" if f.bold else ""
            parts.append(
                f'<font>{bold}<sz val="{f.size}"/><name val={quoteattr(f.name)}/></font>'
            )
        parts.append("</fonts>")
        parts.append(f'<fills count="{len(self.fills)}">')
        for fl in self.fills:
            if fl.fill_type == "solid":
                parts.append(
                    f'<fill><patternFill patternType="solid">'
                    f'<fgColor rgb="FF{fl.fgColor[-6:]}"/></patternFill></fill>'
                )
            else:
                parts.append(
                    f'<fill><patternFill patternType="{fl.fill_type or "none"}"/></fill>'
                )
        parts.append("</fills>")
        parts.append('<borders count="1"><border/></borders>')
        parts.append(
            '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'
            "</cellStyleXfs>"
        )
        parts.append(f'<cellXfs count="{len(self.xfs)}">')
        for font_id, fill_id, numfmt_id, al in self.xfs:
            attrs = (
                f'numFmtId="{numfmt_id}" fontId="{font_id}" fillId="{fill_id}" borderId="0"'
                ' applyFont="1" applyFill="1" applyNumberFormat="1"'
            )
            if al.horizontal or al.wrap_text:
                a = "<alignment"
                if al.horizontal:
                    a += f' horizontal="{al.horizontal}"'
                if al.wrap_text:
                    a += ' wrapText="1"'
                a += "/>"
                parts.append(f'<xf {attrs} applyAlignment="1">{a}</xf>')
            else:
                parts.append(f"<xf {attrs}/>")
        parts.append("</cellXfs></styleSheet>")
        return "".join(parts)


def _cell_xml(cell: Cell, style_id: int) -> str:
    v = cell.value
    if hasattr(v, "item"):  # numpy scalar → python scalar
        v = v.item()
    s_attr = f' s="{style_id}"' if style_id else ""
    ref = cell.coordinate
    if v is None:
        return f'<c r="{ref}"{s_attr}/>' if style_id else ""
    if isinstance(v, bool):
        return f'<c r="{ref}"{s_attr} t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"{s_attr}><v>{v!r}</v></c>'
    if not isinstance(v, str):  # datetimes and anything else: ISO text
        v = v.isoformat() if hasattr(v, "isoformat") else str(v)
    return f'<c r="{ref}"{s_attr} t="inlineStr"><is><t xml:space="preserve">{escape(v)}</t></is></c>'


def _sheet_xml(ws: Worksheet, styles: _StyleTable) -> str:
    parts = [f'<worksheet xmlns="{_SSML}">']
    widths = [(k, d.width) for k, d in ws.column_dimensions.items() if d.width is not None]
    if widths:
        parts.append("<cols>")
        for letters, width in widths:
            i = column_index(letters)
            parts.append(f'<col min="{i}" max="{i}" width="{width}" customWidth="1"/>')
        parts.append("</cols>")
    parts.append("<sheetData>")
    by_row: dict[int, list[Cell]] = {}
    for (r, _c), cell in sorted(ws._cells.items()):
        by_row.setdefault(r, []).append(cell)
    for r in sorted(by_row):
        parts.append(f'<row r="{r}">')
        for cell in by_row[r]:
            parts.append(_cell_xml(cell, styles.xf_for(cell)))
        parts.append("</row>")
    parts.append("</sheetData>")
    if ws.merged_ranges:
        parts.append(f'<mergeCells count="{len(ws.merged_ranges)}">')
        for m in ws.merged_ranges:
            parts.append(f'<mergeCell ref="{m.ref}"/>')
        parts.append("</mergeCells>")
    parts.append("</worksheet>")
    return "".join(parts)


def _save_workbook(wb: Workbook, path: str) -> None:
    if not wb._sheets:
        raise ValueError("workbook has no sheets")
    styles = _StyleTable()
    sheet_xml = [_sheet_xml(ws, styles) for ws in wb._sheets]  # fills the style table
    n = len(wb._sheets)
    decl = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    content_types = (
        f'{decl}<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + "</Types>"
    )
    root_rels = (
        f'{decl}<Relationships xmlns="{_PKG_REL}">'
        '<Relationship Id="rId1" Type='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"'
        ' Target="xl/workbook.xml"/></Relationships>'
    )
    workbook_xml = (
        f'{decl}<workbook xmlns="{_SSML}" xmlns:r="{_REL_NS}"><sheets>'
        + "".join(
            f"<sheet name={quoteattr(ws.title)} sheetId=\"{i + 1}\" r:id=\"rId{i + 1}\"/>"
            for i, ws in enumerate(wb._sheets)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        f'{decl}<Relationships xmlns="{_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type='
            '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"'
            f' Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + f'<Relationship Id="rId{n + 1}" Type='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles"'
        ' Target="styles.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", decl + styles.to_xml())
        for i, xml in enumerate(sheet_xml):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", decl + xml)


# ---------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------

_REF_RE = re.compile(r"([A-Z]+)(\d+)")

# The builtin number formats the engine can encounter (full table is
# ECMA-376 §18.8.30; ids ≥ 164 are file-defined and read from numFmts).
_BUILTIN_FMTS = {0: "General", 1: "0", 2: "0.00", 9: "0%", 10: "0.00%", 14: "mm-dd-yy"}


def _parse_ref(ref: str) -> tuple[int, int]:
    m = _REF_RE.fullmatch(ref)
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    return column_index(m.group(1)), int(m.group(2))


def _tag(el) -> str:
    return el.tag.rsplit("}", 1)[-1]


def _parse_styles(data: bytes) -> tuple[list[Font], list[str]]:
    """styles.xml → (xf index → Font, xf index → number format)."""
    root = ET.fromstring(data)
    fonts: list[Font] = []
    numfmts = dict(_BUILTIN_FMTS)
    xf_fonts: list[Font] = []
    xf_formats: list[str] = []
    for el in root:
        tag = _tag(el)
        if tag == "fonts":
            for f in el:
                name, size, bold = "Calibri", 11.0, False
                for prop in f:
                    p = _tag(prop)
                    if p == "b":
                        bold = prop.get("val", "1") not in ("0", "false")
                    elif p == "sz":
                        size = float(prop.get("val", "11"))
                    elif p == "name":
                        name = prop.get("val", "Calibri")
                fonts.append(Font(name=name, size=size, bold=bold))
        elif tag == "numFmts":
            for nf in el:
                numfmts[int(nf.get("numFmtId"))] = nf.get("formatCode", "General")
        elif tag == "cellXfs":
            for xf in el:
                font_id = int(xf.get("fontId", "0"))
                numfmt_id = int(xf.get("numFmtId", "0"))
                xf_fonts.append(fonts[font_id] if font_id < len(fonts) else _DEFAULT_FONT)
                xf_formats.append(numfmts.get(numfmt_id, "General"))
    return xf_fonts, xf_formats


def load_workbook(path, read_only: bool = False, data_only: bool = False) -> Workbook:
    """Read an .xlsx into a Workbook: values, fonts, number formats,
    column widths, merged ranges, sheet order. ``read_only`` and
    ``data_only`` accepted for openpyxl signature parity (this reader
    is always values-only — formulas would surface as their cached
    ``<v>`` results, same as openpyxl's data_only=True)."""
    wb = Workbook()
    wb._sheets.clear()
    with zipfile.ZipFile(str(path)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root:
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_SSML}}}t")))
        xf_fonts: list[Font] = []
        xf_formats: list[str] = []
        if "xl/styles.xml" in z.namelist():
            xf_fonts, xf_formats = _parse_styles(z.read("xl/styles.xml"))
        rels = {}
        if "xl/_rels/workbook.xml.rels" in z.namelist():
            for rel in ET.fromstring(z.read("xl/_rels/workbook.xml.rels")):
                rels[rel.get("Id")] = rel.get("Target")
        book = ET.fromstring(z.read("xl/workbook.xml"))
        for sheet in book.iter(f"{{{_SSML}}}sheet"):
            name = sheet.get("name")
            rid = sheet.get(f"{{{_REL_NS}}}id")
            target = rels.get(rid, f"worksheets/sheet{len(wb._sheets) + 1}.xml")
            part = target.lstrip("/")
            if not part.startswith("xl/"):
                part = "xl/" + part
            ws = wb.create_sheet(name)
            _load_sheet(ws, z.read(part), shared, xf_fonts, xf_formats)
    return wb


def _load_sheet(
    ws: Worksheet,
    data: bytes,
    shared: list[str],
    xf_fonts: list[Font],
    xf_formats: list[str],
) -> None:
    root = ET.fromstring(data)
    for col in root.iter(f"{{{_SSML}}}col"):
        width = col.get("width")
        if width is None:
            continue
        for i in range(int(col.get("min")), int(col.get("max")) + 1):
            ws.column_dimensions[get_column_letter(i)].width = float(width)
    for c in root.iter(f"{{{_SSML}}}c"):
        col, row = _parse_ref(c.get("r"))
        t = c.get("t", "n")
        v_el = c.find(f"{{{_SSML}}}v")
        if t == "inlineStr":
            is_el = c.find(f"{{{_SSML}}}is")
            value = (
                "".join(tn.text or "" for tn in is_el.iter(f"{{{_SSML}}}t"))
                if is_el is not None
                else None
            )
        elif v_el is None or v_el.text is None:
            value = None
        elif t == "s":
            value = shared[int(v_el.text)]
        elif t == "b":
            value = v_el.text == "1"
        elif t == "str":
            value = v_el.text
        else:
            # int only when the stored text is integral — "10.0" stays
            # a float so numeric dtypes survive the round-trip.
            text = v_el.text
            value = int(text) if re.fullmatch(r"-?\d+", text) else float(text)
        cell = ws.cell(row, col, value)
        s = int(c.get("s", "0"))
        if s < len(xf_fonts):
            cell.font = xf_fonts[s]
            cell.number_format = xf_formats[s]
    for m in root.iter(f"{{{_SSML}}}mergeCell"):
        ws.merge_cells(range_string=m.get("ref"))


# openpyxl namespace parity: callers do ``backend.styles.Font`` /
# ``backend.utils.get_column_letter`` regardless of which library the
# backend hook returned.
styles = SimpleNamespace(Font=Font, PatternFill=PatternFill, Alignment=Alignment)
utils = SimpleNamespace(get_column_letter=get_column_letter)
