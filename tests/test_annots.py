"""PDF annotation extraction tests."""

from scribe_js_spark.fixtures import build_annot_models
from scribe_js_spark.operators.pdf.annots import extract_pdf_annotations
from scribe_js_spark.operators.pdf.document import PdfDocument
from scribe_js_spark.render_pdf import render_pdf


def _extract(doc_id, enc=None):
    m = build_annot_models(doc_id)
    doc = PdfDocument(render_pdf(m["model"], rotate=False,
                                 encrypt_mode=enc))
    recs = []
    for pn, page in enumerate(doc.get_pages()):
        for an, rec in enumerate(extract_pdf_annotations(doc, page)):
            recs.append((pn, an, rec))
    return recs, m["expected"]


def test_annotations_match_model():
    recs, exp = _extract(0)
    got = [{"page_n": pn, "annot_n": an, "subtype": r["subtype"],
            "contents": r["contents"], "uri": r["uri"],
            "field_name": r["field_name"]} for pn, an, r in recs]
    assert got == exp


def test_link_uri_and_highlight_quads():
    recs, _ = _extract(1)
    link = next(r for _, _, r in recs if r["subtype"] == "Link")
    assert link["uri"].startswith("https://example.test/")
    hl = next(r for _, _, r in recs if r["subtype"] == "Highlight")
    assert len(hl["quad_points"]) == 8
    assert hl["author"] == "reviewer"


def test_encrypted_annotation_strings_decrypt():
    recs, exp = _extract(4, enc="aesv3")
    sticky = next(r for _, _, r in recs if r["subtype"] == "Text")
    assert sticky["contents"].startswith("sticky ")
    got = [{"page_n": pn, "annot_n": an, "subtype": r["subtype"],
            "contents": r["contents"], "uri": r["uri"],
            "field_name": r["field_name"]} for pn, an, r in recs]
    assert got == exp


def test_pages_without_annots_yield_empty():
    from scribe_js_spark.fixtures import build_doc_model

    doc = PdfDocument(render_pdf(build_doc_model(0), rotate=False))
    for page in doc.get_pages():
        assert extract_pdf_annotations(doc, page) == []
