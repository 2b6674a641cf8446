"""OCR-side table detection + content extraction on a synthetic page."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import render_hocr
from scribe_js_spark.operators.tables import (
    calc_column_bounds,
    detect_tables_in_page,
    extract_table_rows,
    make_table_columns,
    render_table_markdown,
)
from scribe_js_spark.model import Bbox


def _table_model(n_rows=5, cols=(100, 400, 700, 1000)):
    """One page whose body is an n_rows x 4 numeric table."""
    pars = []
    y = 120
    lines = []
    values = []
    for r in range(n_rows):
        words = []
        row_vals = []
        for ci, x in enumerate(cols):
            val = str(100 * (r + 1) + ci)
            row_vals.append(val)
            words.append({
                "text": val, "chars": None, "out_words": [val],
                "left": x, "right": x + len(val) * 15,
                "top": y - 31, "bottom": y + 9, "conf": 97,
            })
        values.append(row_vals)
        lines.append({"words": words, "baseline_y": y, "indent": 0})
        y += 52
    pars.append({"lines": lines})
    return {
        "doc_id": 0, "family": "base",
        "pages": [{"pars": pars, "width": 1224, "height": 1584}],
    }, values


def test_detect_and_extract_table():
    model, values = _table_model()
    pages = extract_document(render_hocr(model).encode()).pages
    page = pages[0]
    boxes = detect_tables_in_page(page)
    assert len(boxes) == 1
    cols = make_table_columns(page, boxes[0])
    assert len(cols) == 4
    matrix = extract_table_rows(page, boxes[0], cols)
    assert matrix == values
    md = render_table_markdown(matrix)
    assert md.startswith("| 100 | 101 | 102 | 103 |\n| --- | --- | --- | --- |")


def test_no_table_on_prose_page():
    from scribe_js_spark.fixtures import build_doc_model

    model = build_doc_model(1)
    pages = extract_document(render_hocr(model).encode()).pages
    # Prose pages have no >=4-numeric-word rows.
    assert detect_tables_in_page(pages[0]) == []


def test_calc_column_bounds():
    boxes = [Bbox(10, 0, 50, 10), Bbox(12, 20, 48, 30),
             Bbox(100, 0, 150, 10), Bbox(102, 20, 148, 30)]
    bounds = calc_column_bounds(boxes)
    assert len(bounds) == 2
    mid = (50 + 100) / 2
    assert bounds[0] == (10, mid)
    assert bounds[1] == (mid, 150)
