"""XLSX writer (writeTabular / writeXlsx).

Reimplements /root/reference/js/export/writeTabular.js:10-260: A1-style
column references, one worksheet of inline-string cells built from
detected-table matrices (one table after another, a blank row between
tables — createCells semantics for table data), packed into the
minimal SpreadsheetML OPC zip with deterministic entry timestamps.
"""

from __future__ import annotations

import io
import zipfile

from ..functions.textnorm import escape_xml

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    "</Types>")

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>')

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/></Relationships>')

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/'
    'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
    'org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>")


def col_index_to_ref(index: int) -> str:
    """0 -> A, 25 -> Z, 26 -> AA (writeTabular.js colIndexToRef)."""
    ref = ""
    index += 1
    while index > 0:
        index, rem = divmod(index - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def create_cells(tables: list[list[list[str]]]) -> str:
    """Sheet rows from table matrices: tables stacked with one blank
    row between them, every cell an inline string."""
    rows_xml = []
    row_n = 0
    for t_i, matrix in enumerate(tables):
        if t_i > 0:
            row_n += 1  # blank separator row
        for row in matrix:
            row_n += 1
            cells = "".join(
                f'<c r="{col_index_to_ref(c)}{row_n}" t="inlineStr">'
                f"<is><t>{escape_xml(cell)}</t></is></c>"
                for c, cell in enumerate(row))
            rows_xml.append(f'<row r="{row_n}">{cells}</row>')
    return "".join(rows_xml)


def write_xlsx(tables: list[list[list[str]]]) -> bytes:
    """Full .xlsx (OPC zip) from cell matrices. Deterministic output."""
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + create_cells(tables) + "</sheetData></worksheet>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("xl/workbook.xml", _WORKBOOK),
            ("xl/_rels/workbook.xml.rels", _WB_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def read_xlsx_cells(data: bytes) -> list[list[list[str]]]:
    """Inverse of :func:`write_xlsx`: sheet1.xml inline-string cells
    back into per-table matrices. Tables are delimited by the blank
    separator rows create_cells leaves as gaps in the row numbering."""
    import re as _re
    from xml.sax.saxutils import unescape as _unescape

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode("utf-8")
    tables: list[list[list[str]]] = []
    current: list[list[str]] = []
    last_n = 0
    for row_m in _re.finditer(r'<row r="(\d+)">(.*?)</row>', sheet):
        n = int(row_m.group(1))
        if current and n > last_n + 1:
            tables.append(current)
            current = []
        cells: dict[int, str] = {}
        for c_m in _re.finditer(
                r'<c r="([A-Z]+)\d+" t="inlineStr">'
                r"<is><t>(.*?)</t></is></c>", row_m.group(2)):
            col = 0
            for ch in c_m.group(1):
                col = col * 26 + (ord(ch) - 64)
            cells[col - 1] = _unescape(
                c_m.group(2), {"&apos;": "'", "&quot;": '"'})
        width = max(cells) + 1 if cells else 0
        current.append([cells.get(i, "") for i in range(width)])
        last_n = n
    if current:
        tables.append(current)
    return tables


def matrices_digest(tables: list[list[list[str]]]) -> str:
    """Canonical md5 of a cell-matrix list — the XLSX writer-roundtrip
    oracle hashes the re-read workbook with this and compares against
    the same digest of the independently-derived expected matrices."""
    import hashlib

    h = hashlib.md5()
    for t, matrix in enumerate(tables):
        for r, row in enumerate(matrix):
            for c, cell in enumerate(row):
                h.update(f"{t}\x1e{r}\x1e{c}\x1e{cell}\x1f"
                         .encode("utf-8"))
    return h.hexdigest()
