"""Tagged-PDF structure tree tests."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import (
    build_doc_model,
    build_struct_models,
    expected_text,
)
from scribe_js_spark.operators.pdf.document import PdfDocument
from scribe_js_spark.operators.pdf.structtree import (
    build_struct_elem_map,
    doc_authored_by_word,
    pdf_struct_tags,
)
from scribe_js_spark.render_pdf import render_pdf


def _render(m):
    return render_pdf(m["model"], rotate=False, tj_mode=False,
                      outline=False, form_xobject=False,
                      xref_stream=False)


def test_struct_tags_match_model():
    for doc_id in (0, 1, 2):
        m = build_struct_models(doc_id)
        got = [{"page_n": p, "mcid": mc, "tag": t}
               for p, mc, t in pdf_struct_tags(_render(m))]
        exp = sorted(m["expected"],
                     key=lambda r: (r["page_n"], r["mcid"]))
        assert got == exp, doc_id


def test_role_map_resolves_custom_para():
    m = build_struct_models(0)
    tags = {t for _, _, t in pdf_struct_tags(_render(m))}
    assert "P" in tags          # /Para role-mapped to /P
    assert "Para" not in tags


def test_ocr_producer_vetoes_structure():
    m = build_struct_models(3)  # doc_id % 4 == 3 -> ABBYY producer
    assert pdf_struct_tags(_render(m)) == []
    assert build_struct_elem_map(PdfDocument(_render(m))) is None


def test_untagged_doc_has_no_map():
    data = render_pdf(build_doc_model(1), rotate=False)
    assert build_struct_elem_map(PdfDocument(data)) is None
    assert pdf_struct_tags(data) == []


def test_doc_authored_by_word():
    m = build_struct_models(0)  # producer "Microsoft Word 2016"
    assert doc_authored_by_word(PdfDocument(_render(m)))
    m3 = build_struct_models(3)  # ABBYY producer
    assert not doc_authored_by_word(PdfDocument(_render(m3)))


def test_marked_content_preserves_byte_identity():
    m = build_struct_models(0)
    res = extract_document(_render(m))
    assert res.error is None
    assert res.text == expected_text(build_doc_model(0))
