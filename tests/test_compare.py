"""Comparison / consensus operator tests against model-derived goldens."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_layer_models, render_hocr
from scribe_js_spark.operators.compare import (
    build_consensus_page,
    compare_ocr_page,
    ocr_adds_new_text,
)

KEYS = ("total", "correct", "incorrect", "missed", "extra",
        "correctLowConf", "incorrectHighConf")


def _pages(model):
    return extract_document(render_hocr(model).encode()).pages


def test_compare_eval_metrics_match_golden():
    for doc_id in (3, 13, 23, 33):
        layers = build_layer_models(doc_id)
        pages_a = _pages(layers["ocr_a"])
        pages_b = _pages(layers["truth"])
        totals = dict.fromkeys(KEYS, 0)
        for pa, pb in zip(pages_a, pages_b):
            m = compare_ocr_page(pa, pb)
            for k in KEYS:
                totals[k] += m[k]
        assert totals == layers["eval_expected"], doc_id


def test_compare_identical_pages():
    layers = build_layer_models(3)
    pages = _pages(layers["truth"])
    m = compare_ocr_page(pages[0], pages[0])
    assert m["incorrect"] == 0
    assert m["missed"] == 0
    assert m["extra"] == 0
    assert m["correct"] == m["total"]


def test_consensus_matches_golden():
    for doc_id in (3, 13):
        layers = build_layer_models(doc_id)
        pages_a = _pages(layers["ocr_a"])
        pages_b = _pages(layers["truth"])
        pages_c = _pages(layers["ocr_b"])
        got = []
        for i in range(len(pages_a)):
            res = build_consensus_page(pages_a[i], [pages_b[i], pages_c[i]])
            got.extend(
                {"word_id": d["word_id"], "text": d["text"], "conf": d["conf"]}
                for d in res["decisions"])
        assert got == layers["consensus_expected"], doc_id


def test_ocr_adds_new_text_gate():
    layers = build_layer_models(3)
    truth = _pages(layers["truth"])
    # OCR identical to native -> adds nothing
    assert not ocr_adds_new_text(truth[0], truth[0])
    # No native page -> always keep OCR
    assert ocr_adds_new_text(None, truth[0])
