"""PDF vector-path extraction and underline-detection tests."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_underline_models
from scribe_js_spark.operators.pdf.paths import (
    PaintedPath,
    color_to_rgb,
    extract_underline_rects,
)
from scribe_js_spark.render_pdf import render_pdf


def _path(cmds, fill=True, stroke=False, fill_color=(0.0,),
          fill_cs="gray"):
    return PaintedPath(cmds, fill, stroke, False, list(fill_color),
                       fill_cs, [0.0], "gray", 1.0, [])


def _rect_cmds(x, y, w, h):
    return [("M", x, y), ("L", x + w, y), ("L", x + w, y + h),
            ("L", x, y + h), ("Z",)]


def test_thin_wide_bar_is_underline_candidate():
    rects = extract_underline_rects(
        [_path(_rect_cmds(100, 500, 80, 1.5))], scale=1.0,
        page_h_pts=800)
    assert len(rects) == 1
    r = rects[0]
    assert (r["left"], r["right"]) == (100, 180)
    assert r["y"] == 800 - 501.5  # top-left frame, from maxY


def test_tall_or_narrow_paths_excluded():
    rects = extract_underline_rects(
        [_path(_rect_cmds(100, 500, 80, 5)),    # too tall
         _path(_rect_cmds(100, 500, 8, 1))],    # too narrow
        scale=1.0, page_h_pts=800)
    assert rects == []


def test_unpainted_and_curved_paths_excluded():
    unpainted = _path(_rect_cmds(0, 0, 50, 1), fill=False)
    # curve-dominated glyph-like path: M/L extent is a point, so the
    # whole-path bar rule misses and hasCurve blocks subpath mining
    curved = _path(
        [("M", 0, 0), ("C", 10, 20, 20, 20, 30, 0), ("Z",)])
    assert extract_underline_rects(
        [unpainted, curved], 1.0, 800) == []


def test_double_rule_subpath_mining():
    # two thin bars packed into one filled path (decorative double rule)
    cmds = _rect_cmds(100, 500, 80, 1) + _rect_cmds(100, 504, 80, 1)
    rects = extract_underline_rects([_path(cmds)], 1.0, 800)
    assert len(rects) == 2


def test_color_to_rgb():
    assert color_to_rgb(([0.5], "gray")) == [0.5, 0.5, 0.5]
    assert color_to_rgb(([1.0, 0.0, 0.0], "rgb")) == [1.0, 0.0, 0.0]
    # CMYK red through the Adobe-calibrated polynomial
    # (pdfColorFunctions.js:611): bytes [255, 46, 23] / 255.
    cmyk = color_to_rgb(([0.0, 1.0, 1.0, 0.0], "cmyk"))
    assert cmyk == [255 / 255, 46 / 255, 23 / 255]
    assert color_to_rgb(None) is None
    assert color_to_rgb(([], "rgb")) is None


def test_underline_family_end_to_end():
    for doc_id in (0, 2, 3):  # raw, TJ+ligature, /Rotate-exempt variants
        m = build_underline_models(doc_id)
        res = extract_document(render_pdf(m["model"], rotate=False))
        assert res.error is None
        got = [(p.n, ln, wn, w.text, w.style.underline)
               for p in res.pages
               for ln, line in enumerate(p.lines)
               for wn, w in enumerate(line.words)]
        exp = [(r["page_n"], r["line_n"], r["word_n"], r["text"],
                r["underline"]) for r in m["expected"]]
        assert got == exp


def test_separator_rules_survive_on_page():
    m = build_underline_models(0)
    res = extract_document(render_pdf(m["model"], rotate=False))
    for page_n, page in enumerate(res.pages):
        model_page = m["model"]["pages"][page_n]
        assert len(page.rules) == len(model_page.get("rules", []))
        for rule in page.rules:
            assert rule["right"] - rule["left"] > 500  # page-wide
