"""Vendored minimal PDF table extractor — pure Python, zero deps.

Machine-generated report PDFs (the shape the reference ingests with
pdfplumber — datafeeds/pdf_table_extractor.py:99-292) position each
table cell with explicit text operators. This module parses exactly
that structure:

- content streams found by scanning ``stream``/``endstream`` spans,
  FlateDecode (stdlib zlib) or uncompressed;
- the text-state machine: BT/ET, Td, TD, Tm, T*, TL, Tj, TJ and the
  ``'`` shorthand, tracking (x, y) per text run;
- table reconstruction: runs grouped into rows by y (tolerance),
  column boundaries clustered from x positions across rows, cells
  joined in reading order — the same rows-by-baseline/columns-by-gap
  heuristic lattice-free extractors use.

Out of scope, by design (the chain's earlier backends handle rich
PDFs where installed): encryption, CID/Type0 fonts with ToUnicode
CMaps, rotated text, graphics-line table detection. Inputs this
parser cannot read yield zero tables, which the extractor chain
reports honestly.

``write_simple_table_pdf`` emits a valid single-page PDF (xref and
all) with one text-positioned table — the test harness for this
module and a handy fixture generator for the whole S7 pipeline.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd

_ROW_TOL = 2.0  # points: runs within this y-distance share a row
_COL_TOL = 3.0  # points: x-starts within this distance share a column


# ---------------------------------------------------------------------
# Content-stream tokenizer
# ---------------------------------------------------------------------

_TOKEN_RE = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^\\()])*\))      # literal string (escapes handled later)
  | (?P<hex><[0-9A-Fa-f\s]*>)          # hex string
  | (?P<arr>\[|\])
  | (?P<num>[-+]?\d*\.?\d+)
  | (?P<name>/[^\s/\[\]()<>]*)
  | (?P<op>[A-Za-z'"*]+)
    """,
    re.VERBOSE,
)


def _decode_pdf_string(raw: bytes) -> str:
    """Literal-string unescape: \\( \\) \\\\ \\n \\r \\t \\b \\f and
    octal \\ddd; bytes decode as Latin-1 (the ASCII-compatible choice
    for the standard simple fonts)."""
    body = raw[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        b = body[i]
        if b != 0x5C:  # backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= len(body):
            break
        c = body[i]
        simple = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
        if c in simple:
            out.append(simple[c])
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            j = i
            while j < len(body) and j < i + 3 and 0x30 <= body[j] <= 0x37:
                j += 1
            out.append(int(body[i:j], 8) & 0xFF)
            i = j
        else:  # \( \) \\ and anything else: literal next byte
            out.append(c)
            i += 1
    return out.decode("latin-1")


def _decode_hex_string(raw: bytes) -> str:
    hexdigits = re.sub(rb"\s", b"", raw[1:-1])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1")


def _text_runs(content: bytes) -> "list[tuple[float, float, str]]":
    """Run the text-positioning state machine over one content stream,
    returning (x, y, text) per shown string."""
    runs: list[tuple[float, float, str]] = []
    # text-space origin; PDF default matrix has y increasing upward
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 0.0
    stack: list[float] = []
    in_array = False
    array_text: list[str] = []

    def show(s: str) -> None:
        if s:
            runs.append((x, y, s))

    for m in _TOKEN_RE.finditer(content):
        kind = m.lastgroup
        tok = m.group()
        if kind == "num":
            stack.append(float(tok))
        elif kind == "str" or kind == "hex":
            # Strings show at the CURRENT position: Tj arrives after
            # its operand, and Td/Tm already updated (x, y) — correct
            # for per-cell-positioned tables, this parser's target.
            s = _decode_pdf_string(tok) if kind == "str" else _decode_hex_string(tok)
            if in_array:
                array_text.append(s)
            else:
                show(s)
        elif kind == "arr":
            if tok == b"[":
                in_array = True
                array_text = []
            else:
                in_array = False
                show("".join(array_text))
                stack.clear()
        elif kind == "op":
            op = tok.decode("latin-1")
            if op == "BT":
                x = y = line_x = line_y = 0.0
                stack.clear()
            elif op == "Td" and len(stack) >= 2:
                line_x += stack[-2]
                line_y += stack[-1]
                x, y = line_x, line_y
                stack.clear()
            elif op == "TD" and len(stack) >= 2:
                leading = -stack[-1]
                line_x += stack[-2]
                line_y += stack[-1]
                x, y = line_x, line_y
                stack.clear()
            elif op == "Tm" and len(stack) >= 6:
                line_x, line_y = stack[-2], stack[-1]
                x, y = line_x, line_y
                stack.clear()
            elif op == "T*":
                line_y -= leading
                x, y = line_x, line_y
                stack.clear()
            elif op == "TL" and stack:
                leading = stack[-1]
                stack.clear()
            elif op == "'":
                # move to next line, then the preceding string already
                # showed at the old position — rare in generated
                # tables; accept the approximation and advance
                line_y -= leading
                x, y = line_x, line_y
                stack.clear()
            elif op in ("Tj", "ET", "Tf", "Tc", "Tw", "Tz", "Ts", "Tr"):
                stack.clear()
            else:
                stack.clear()
        elif kind == "name":
            pass
    return runs


# ---------------------------------------------------------------------
# Document-level parsing
# ---------------------------------------------------------------------


def _content_streams(data: bytes) -> "list[bytes]":
    """Every stream in the file that decodes (Flate or raw) to
    something containing a BT text block. Object-graph-free scanning:
    robust to files whose xref this module has no need to interpret."""
    out: list[bytes] = []
    for m in re.finditer(rb"stream\r?\n", data):
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        raw = data[start:end].rstrip(b"\r\n")
        for candidate in (raw,):
            try:
                decoded = zlib.decompress(candidate)
            except zlib.error:
                decoded = candidate
            if b"BT" in decoded and (b"Tj" in decoded or b"TJ" in decoded):
                out.append(decoded)
    return out


def _cluster(values: "list[float]", tol: float) -> "list[float]":
    """1-D single-linkage clustering: sorted values within ``tol`` of
    their predecessor join its cluster; returns each cluster's minimum."""
    reps: list[float] = []
    prev: float | None = None
    for v in sorted(values):
        if prev is None or v - prev > tol:
            reps.append(v)
        prev = v
    return reps


def _runs_to_table(runs: "list[tuple[float, float, str]]") -> pd.DataFrame | None:
    """Rows by y (descending — PDF y grows upward), columns by
    clustered x-starts; first row becomes the header."""
    if not runs:
        return None
    # group into rows
    rows: list[list[tuple[float, float, str]]] = []
    for run in sorted(runs, key=lambda r: (-r[1], r[0])):
        if rows and abs(rows[-1][0][1] - run[1]) <= _ROW_TOL:
            rows[-1].append(run)
        else:
            rows.append([run])
    col_x = _cluster([r[0] for r in runs], _COL_TOL)
    if len(rows) < 2 or len(col_x) < 2:
        return None

    def col_of(xv: float) -> int:
        best, best_d = 0, abs(xv - col_x[0])
        for i, cx in enumerate(col_x):
            d = abs(xv - cx)
            if d < best_d:
                best, best_d = i, d
        return best

    grid: list[list[str]] = []
    for row in rows:
        cells = [""] * len(col_x)
        for xv, _yv, text in sorted(row, key=lambda r: r[0]):
            c = col_of(xv)
            cells[c] = (cells[c] + " " + text).strip() if cells[c] else text
        grid.append(cells)
    header, *body = grid
    if not body:
        return None
    return pd.DataFrame(body, columns=header)


def extract_tables(path: str) -> "list[pd.DataFrame]":
    """pdfplumber-shaped entry point: list of DataFrames, one per
    text-positioned table found (one table per content stream — the
    structure ``write_simple_table_pdf`` and simple report generators
    produce). Unreadable/rich PDFs yield []."""
    with open(path, "rb") as f:
        data = f.read()
    tables: list[pd.DataFrame] = []
    for stream in _content_streams(data):
        t = _runs_to_table(_text_runs(stream))
        if t is not None and len(t.columns) > 1:
            tables.append(t)
    return tables


# ---------------------------------------------------------------------
# Minimal writer (test harness / fixture generator)
# ---------------------------------------------------------------------


def write_simple_table_pdf(
    path: str,
    rows: "list[list[str]]",
    x0: float = 72,
    y0: float = 720,
    col_width: float = 110,
    row_height: float = 16,
    compress: bool = False,
) -> None:
    """A valid single-page PDF whose table cells are individually
    Td-positioned Tj strings — the structure ``extract_tables`` reads
    back. ``compress`` exercises the FlateDecode path."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    parts = ["BT /F1 10 Tf"]
    prev_x, prev_y = 0.0, 0.0
    for ri, row in enumerate(rows):
        for ci, cell in enumerate(row):
            cx = x0 + ci * col_width
            cy = y0 - ri * row_height
            parts.append(f"{cx - prev_x:.1f} {cy - prev_y:.1f} Td ({esc(cell)}) Tj")
            prev_x, prev_y = cx, cy
    parts.append("ET")
    content = " ".join(parts).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(bytes(out))
