"""DOCX/XLSX writer tests: roundtrip through our own readers."""

import re
import zipfile
from io import BytesIO

from scribe_js_spark.export.docx import write_docx, write_docx_content
from scribe_js_spark.export.xlsx import (
    col_index_to_ref,
    create_cells,
    write_xlsx,
)
from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import (
    build_doc_model,
    build_groupx_models,
    expected_text,
    render_hocr,
)
from scribe_js_spark.operators.docx import parse_docx_paragraphs
from scribe_js_spark.render_pdf import render_pdf


def _pages(model):
    res = extract_document(render_hocr(model).encode())
    assert res.error is None
    return res.pages


def test_docx_roundtrip_through_own_reader():
    model = build_doc_model(0)
    pages = _pages(model)
    data = write_docx(pages, reflow_text=True)
    paras = parse_docx_paragraphs(data)
    # reflowed paragraphs of the docx equal the model's paragraph texts
    got = "\n".join(paras)
    assert got == expected_text(model)


def test_docx_is_valid_zip_with_parts():
    pages = _pages(build_doc_model(1))
    data = write_docx(pages)
    with zipfile.ZipFile(BytesIO(data)) as zf:
        names = set(zf.namelist())
        assert "word/document.xml" in names
        assert "[Content_Types].xml" in names
        assert "word/styles.xml" in names


def test_docx_deterministic():
    pages = _pages(build_doc_model(2))
    assert write_docx(pages) == write_docx(pages)


def test_docx_style_runs_become_run_splits():
    m = build_groupx_models(0)
    res = extract_document(render_pdf(
        m["model"], tj_mode=False, rotate=False, ligatures=False,
        cid_font=False))
    body = write_docx_content(res.pages)
    # 'bold.' carries a styleRun: the bold prefix and the regular
    # period must land in separate runs
    assert "<w:b/>" in body
    bold_run = re.search(
        r"<w:r><w:rPr><w:b/>[^<]*(?:<w:rFonts[^>]*/>)?</w:rPr>"
        r"<w:t xml:space=\"preserve\"> ?bold</w:t></w:r>"
        r"<w:r><w:rPr>(?:<w:rFonts[^>]*/>)?</w:rPr>"
        r"<w:t xml:space=\"preserve\">\.</w:t></w:r>", body)
    assert bold_run, body[body.find("bold") - 120:body.find("bold") + 120]


def test_col_index_to_ref():
    assert col_index_to_ref(0) == "A"
    assert col_index_to_ref(25) == "Z"
    assert col_index_to_ref(26) == "AA"
    assert col_index_to_ref(27) == "AB"
    assert col_index_to_ref(701) == "ZZ"
    assert col_index_to_ref(702) == "AAA"


def test_xlsx_cells_and_roundtrip():
    tables = [[["a", "b"], ["1", "2"]], [["x"]]]
    data = write_xlsx(tables)
    with zipfile.ZipFile(BytesIO(data)) as zf:
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    cells = re.findall(r'<c r="([A-Z]+\d+)"[^>]*><is><t>([^<]*)</t>', sheet)
    assert cells == [
        ("A1", "a"), ("B1", "b"), ("A2", "1"), ("B2", "2"),
        ("A4", "x"),  # blank separator row between tables
    ]
    assert write_xlsx(tables) == write_xlsx(tables)


def test_xlsx_escapes_markup():
    sheet = create_cells([[["<&>"]]])
    assert "&lt;&amp;&gt;" in sheet


def test_xlsx_read_back_and_digest():
    """read_xlsx_cells inverts write_xlsx across multiple tables
    (blank-row separators), empty cells and markup-bearing text; the
    canonical digest matches the one computed directly from the
    matrices — and stops matching if the workbook loses a cell."""
    from scribe_js_spark.export.xlsx import (
        matrices_digest, read_xlsx_cells, write_xlsx)

    tables = [
        [["a", "b<&>'\"", ""], ["1,234", "", "x"]],
        [["only"], ["two", "cells"]],
    ]
    data = write_xlsx(tables)
    assert read_xlsx_cells(data) == tables
    assert matrices_digest(read_xlsx_cells(data)) \
        == matrices_digest(tables)
    # a defective writer (dropped cell) must change the digest
    broken = [[r[:] for r in t] for t in tables]
    broken[0][1][2] = "Y"
    assert matrices_digest(broken) != matrices_digest(tables)
