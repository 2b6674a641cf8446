"""combineOCRPage / buildCombinedLayer semantics."""

import copy

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import RENDERERS, build_doc_model, build_layer_models, render_hocr
from scribe_js_spark.model import OcrPage
from scribe_js_spark.operators.combine import build_combined_pages, combine_ocr_page


def _page(doc_id=2):
    model = build_doc_model(doc_id)
    return extract_document(RENDERERS["hocr"](model).encode()).pages[0]


def test_combine_reinserts_removed_line():
    page = _page()
    donor = _page()
    # Remove a middle line from `page`; take the same line from `donor`.
    idx = len(page.lines) // 2
    removed_text = " ".join(w.text for w in page.lines[idx].words)
    del page.lines[idx]
    new_page = OcrPage(0, dict(page.dims))
    new_page.lines = [donor.lines[idx]]

    combine_ocr_page(new_page, page)
    texts = [" ".join(w.text for w in l.words) for l in page.lines]
    assert removed_text in texts
    assert texts.index(removed_text) == idx  # reading-order position


def test_combine_merges_words_into_matching_line():
    page = _page()
    donor = _page()
    line0 = donor.lines[0]
    # New page containing the same line -> words merge into line 0.
    new_page = OcrPage(0, dict(page.dims))
    new_page.lines = [line0]
    n_before = len(page.lines[0].words)
    combine_ocr_page(new_page, page)
    assert len(page.lines[0].words) == 2 * n_before
    assert len(page.lines) == len(donor.lines)


def test_build_combined_pages_gate():
    layers = build_layer_models(3)
    native = extract_document(render_hocr(layers["truth"]).encode()).pages
    same = extract_document(render_hocr(layers["truth"]).encode()).pages
    decisions = build_combined_pages(native, same)
    # Identical OCR adds nothing -> native everywhere.
    assert all(d["chosen"] == "native" for d in decisions)

    # No native layer -> OCR kept.
    decisions2 = build_combined_pages([None] * len(same), same)
    assert all(d["chosen"] == "ocr" for d in decisions2)
