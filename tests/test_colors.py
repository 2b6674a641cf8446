"""Text color / alpha / faux-bold operators.

Covers js/pdf/pdfColorFunctions.js (function types 0/2/3/4, cmykToRgb,
tint transforms) and the parsePdfDoc.js:1692-1790 color state machine
through the color fixture family.
"""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_color_models
from scribe_js_spark.operators.pdf.colorfn import (
    cmyk_to_rgb,
    evaluate_function,
    evaluate_ps,
    rgb_to_hex,
    tokenize_ps,
)


def test_ps_calculator():
    assert evaluate_ps(tokenize_ps("{ 2 mul 1 exch sub }"), [0.25]) == [0.5]
    # dup/roll/index
    assert evaluate_ps(tokenize_ps("{ dup dup }"), [0.3]) == [0.3, 0.3, 0.3]
    assert evaluate_ps(tokenize_ps("{ 1 2 3 3 1 roll }"), []) == [3, 1, 2]
    assert evaluate_ps(tokenize_ps("{ 1 2 1 index }"), []) == [1, 2, 1]
    # conditionals
    assert evaluate_ps(
        tokenize_ps("{ 0.7 gt { 1 } { 0 } ifelse }"), [0.9]) == [1]
    assert evaluate_ps(
        tokenize_ps("{ 0.7 gt { 1 } { 0 } ifelse }"), [0.5]) == [0]
    # atan normalization to [0, 360)
    assert evaluate_ps(tokenize_ps("{ atan }"), [-1, 0]) == [270.0]


def test_function_types():
    # type 2 exponential
    fn2 = {"type": 2, "domain": [0.0, 1.0], "range": None, "n_inputs": 1,
           "n_outputs": 3, "c0": [1.0, 1.0, 1.0],
           "c1": [0.0, 0.5, 1.0], "N": 1.0}
    assert evaluate_function(fn2, [0.5]) == [0.5, 0.75, 1.0]
    # domain clipping
    assert evaluate_function(fn2, [2.0]) == [0.0, 0.5, 1.0]
    # type 3 stitching picks the right sub-function
    fn3 = {"type": 3, "domain": [0.0, 1.0], "range": None, "n_inputs": 1,
           "n_outputs": 3, "functions": [fn2, fn2], "bounds": [0.5],
           "encode": [0.0, 1.0, 0.0, 1.0]}
    assert evaluate_function(fn3, [0.25]) == [0.5, 0.75, 1.0]
    assert evaluate_function(fn3, [0.75]) == [0.5, 0.75, 1.0]
    # type 0 sampled linear interpolation
    fn0 = {"type": 0, "domain": [0.0, 1.0],
           "range": [0.0, 1.0, 0.0, 1.0, 0.0, 1.0], "n_inputs": 1,
           "n_outputs": 3, "size": [2], "bps": 8, "encode": None,
           "decode": None, "samples": bytes([255, 128, 0, 0, 128, 255])}
    out = evaluate_function(fn0, [0.5])
    assert out[0] == pytest.approx(0.5) and out[2] == pytest.approx(0.5)
    assert out[1] == pytest.approx(128 / 255)


def test_cmyk_polynomial_and_hex():
    assert cmyk_to_rgb(0, 0, 0, 0) == [255, 255, 255]
    assert cmyk_to_rgb(0, 0, 0, 1) == [0, 0, 0]
    assert cmyk_to_rgb(1, 1, 1, 1) == [0, 0, 0]
    assert cmyk_to_rgb(0, 1, 1, 0) == [255, 46, 23]
    assert rgb_to_hex([0.5, 0.5, 0.5]) == "#808080"
    assert rgb_to_hex([1.0, 0.0, 0.0]) == "#ff0000"


@pytest.mark.parametrize("doc_id", range(8))
def test_color_family_end_to_end(doc_id):
    """Every line of the family doc (device fills, Separation tint —
    one function type per doc — ExtGState alpha, invisible, faux-bold)
    yields the spec-computed word style."""
    m = build_color_models(doc_id)
    res = extract_document(m["pdf"])
    assert res.error is None
    got = []
    for page in res.pages:
        for ln, line in enumerate(page.lines):
            for wn, w in enumerate(line.words):
                got.append({
                    "line_n": ln, "word_n": wn, "text": w.text,
                    "color": w.style.color, "opacity": w.style.opacity,
                    "render_mode": w.renderMode,
                    "stroke_width": w.strokeWidth})
    assert got == m["expected"]
