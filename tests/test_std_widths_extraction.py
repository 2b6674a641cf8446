"""End-to-end: PDFs that omit /Widths extract byte-identically only
because the standard-14 AFM fallback supplies the true Helvetica
advances (word positions in the std_widths render variant are laid out
with the real metrics, so flat substitute widths garble word gaps)."""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_doc_model, expected_text
from scribe_js_spark.render_pdf import render_pdf


def _render(doc_id, **kw):
    model = build_doc_model(doc_id)
    kw.setdefault("rotate", False)
    return model, render_pdf(model, std_widths=True, cid_font=False, **kw)


@pytest.mark.parametrize("doc_id,kw", [
    (0, {"tj_mode": False, "ligatures": False, "compress": False}),
    (1, {"tj_mode": False, "ligatures": False, "compress": True}),
    (2, {"tj_mode": True, "ligatures": False}),
    (5, {"tj_mode": False, "ligatures": True}),
    (2, {"tj_mode": True, "ligatures": True}),
    (3, {"tj_mode": False, "ligatures": False, "rotate": True}),
    (5, {"tj_mode": False, "ligatures": False, "hex_strings": True}),
])
def test_no_widths_pdf_extracts_byte_identically(doc_id, kw):
    model, pdf = _render(doc_id, **kw)
    assert b"/Widths" not in pdf
    res = extract_document(pdf)
    assert res.error is None, res.error
    assert res.text == expected_text(model)


def test_standard_metrics_are_decisive(monkeypatch):
    """Without the AFM fallback (flat default widths) the same PDF
    does NOT reproduce the golden text — the fixture is load-bearing,
    not decorative."""
    from scribe_js_spark.operators.pdf import fonts as fonts_mod

    model, pdf = _render(0, tj_mode=False, ligatures=False)
    monkeypatch.setattr(
        fonts_mod, "_apply_standard_metrics", lambda *a, **k: None)
    res = extract_document(pdf)
    assert res.error is None
    assert res.text != expected_text(model)
