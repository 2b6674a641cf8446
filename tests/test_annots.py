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
            "field_name": r["field_name"],
            "field_value": r["field_value"]} for pn, an, r in recs]
    # field_text_ok is a parse-level check (the driver query computes
    # it against the extracted page text), not an annotation record.
    assert got == [{k: v for k, v in e.items() if k != "field_text_ok"}
                   for e in exp]


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
            "field_name": r["field_name"],
            "field_value": r["field_value"]} for pn, an, r in recs]
    # field_text_ok is a parse-level check (the driver query computes
    # it against the extracted page text), not an annotation record.
    assert got == [{k: v for k, v in e.items() if k != "field_text_ok"}
                   for e in exp]


def test_pages_without_annots_yield_empty():
    from scribe_js_spark.fixtures import build_doc_model

    doc = PdfDocument(render_pdf(build_doc_model(0), rotate=False))
    for page in doc.get_pages():
        assert extract_pdf_annotations(doc, page) == []


def test_layout_field_value_rules():
    """formFieldLayout.js:31-99 semantics: /DA Tf size wins, auto-size
    when absent AND zero, multiline wrap at the rect's character
    capacity with 1.15 leading, comb cells, /Q quadding."""
    from scribe_js_spark.operators.pdf.formfields import (
        layout_field_value)

    # single line, default 10pt, left quadding, pad 2
    r = layout_field_value("John Q Public", 200, 20)
    assert r["font_size"] == 10.0
    [ln] = r["lines"]
    assert ln["x"] == 2.0 and [w[0] for w in ln["words"]] == [
        "John", "Q", "Public"]
    # word x0 = pad + index*avgCharW (avg 5pt at 10pt font)
    assert ln["words"][1][1] == 2.0 + 5 * 5.0
    # /DA size wins
    assert layout_field_value("x", 100, 30,
                              da="/Helv 14 Tf 0 g")["font_size"] == 14.0
    # Tf 0 -> auto-size to rect height
    assert layout_field_value("x", 100, 30,
                              da="/Helv 0 Tf")["font_size"] == 12.0
    # center + right quadding
    c = layout_field_value("ab", 100, 20, quadding=1)["lines"][0]
    assert c["x"] == (100 - 2 * 5.0) / 2
    rr = layout_field_value("ab", 100, 20, quadding=2)["lines"][0]
    assert rr["x"] == 100 - 2 * 5.0 - 2
    # multiline wraps greedily at floor((w-4)/avg) chars
    m = layout_field_value("aa bb cc dd", 34.0, 60, multiline=True)
    texts = [ln["text"] for ln in m["lines"]]
    assert texts == ["aa bb", "cc dd"]
    assert m["lines"][0]["y"] - m["lines"][1]["y"] == 10 * 1.15
    # comb: one char per cell
    cb = layout_field_value("AB CD", 50, 20, comb=True, max_len=5)
    words = cb["lines"][0]["words"]
    assert words[0] == ("AB", 0.0, 20.0) and words[1] == ("CD", 30.0, 50.0)


def test_form_field_values_extracted_as_text():
    """A filled text field's /V becomes page text at the widget rect
    (parsePdfDoc.js:1091-1176); hidden widgets and empty values are
    skipped, and a form-only PDF classifies text-native."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.fixtures import build_doc_model
    from scribe_js_spark.operators.pdf.parse import pdf_document_type
    from scribe_js_spark.render_pdf import render_pdf

    model = build_doc_model(0, n_pages=1)
    model["pages"][0]["annots"] = [
        {"subtype": "Widget", "rect": (200, 700, 420, 730),
         "author": "name", "field_type": "Tx",
         "value": "Jane Example"},
        {"subtype": "Widget", "rect": (200, 600, 420, 630),
         "author": "secret", "field_type": "Tx",
         "value": "HIDDEN", "hidden": True},
        {"subtype": "Widget", "rect": (200, 500, 420, 530),
         "author": "empty", "field_type": "Tx", "value": "  "},
    ]
    res = extract_document(render_pdf(model, rotate=False))
    assert res.error is None, res.error
    assert "Jane Example" in res.text
    assert "HIDDEN" not in res.text

    # form-only PDF: enough field text to clear the 100-char page
    # score -> text-native
    only = build_doc_model(0, n_pages=1)
    for par in only["pages"][0]["pars"]:
        for line in par["lines"]:
            line["words"] = []
    long_val = " ".join(["formtext"] * 20)
    only["pages"][0]["pars"] = only["pages"][0]["pars"][:1]
    only["pages"][0]["pars"][0]["lines"] = \
        only["pages"][0]["pars"][0]["lines"][:1]
    only["pages"][0]["annots"] = [
        {"subtype": "Widget", "rect": (100, 400, 500, 700),
         "author": "big", "field_type": "Tx", "value": long_val,
         "ff": 0x1000}]
    assert pdf_document_type(render_pdf(only, rotate=False)) == "text"


def test_link_annotation_stamps_word_style():
    """Words whose center sits under a /Link /Rect carry its URI
    (parsePdfDoc.js:1032-1063 uriBoxes -> word.style.link)."""
    from scribe_js_spark.fixtures import build_doc_model
    from scribe_js_spark.operators.pdf.parse import parse_pdf_document
    from scribe_js_spark.render_pdf import render_pdf

    model = build_doc_model(0, n_pages=1)
    page_h = model["pages"][0]["height"]
    w0 = model["pages"][0]["pars"][0]["lines"][0]["words"][0]
    # model geometry is top-down px at scale 1; /Rect is bottom-up pts
    rect = (w0["left"] - 2, page_h - w0["bottom"] - 4,
            w0["right"] + 2, page_h - w0["top"] + 4)
    model["pages"][0]["annots"] = [
        {"subtype": "Link", "rect": rect,
         "uri": "https://linked.test/x"}]
    pages = parse_pdf_document(render_pdf(model, rotate=False))
    linked = [w for line in pages[0].lines for w in line.words
              if w.style.link]
    assert linked and linked[0].text == w0["text"]
    assert linked[0].style.link == "https://linked.test/x"
    unlinked = [w for line in pages[0].lines for w in line.words
                if not w.style.link]
    assert unlinked  # only the covered word is stamped


def test_form_field_text_on_rotated_page():
    """Field and link rects map through the page's initial CTM, so a
    /Rotate 90 page still extracts the value in reading order (the
    reference maps annots via mapPoint + initialCtm)."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.fixtures import build_doc_model
    from scribe_js_spark.render_pdf import render_pdf

    model = build_doc_model(0, n_pages=1)
    model["pages"][0]["annots"] = [
        {"subtype": "Widget", "rect": (200, 700, 420, 730),
         "author": "name", "field_type": "Tx",
         "value": "RotatedVal"}]
    res = extract_document(render_pdf(model, rotate=True))
    assert res.error is None, res.error
    assert "RotatedVal" in res.text
