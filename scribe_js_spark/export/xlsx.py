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
