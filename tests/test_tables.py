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


def test_markdown_interleaves_table_at_page_position():
    """writeMarkdown folds a detected table into the flow at its page
    position (writeMarkdown.js:150-188): paragraph above, pipe table,
    paragraph below — and the table's lines never appear as prose."""
    from scribe_js_spark.export.markdown import write_markdown

    def _prose_par(y0, texts):
        words, x = [], 100
        for t in texts:
            words.append({
                "text": t, "chars": None, "out_words": [t],
                "left": x, "right": x + len(t) * 15,
                "top": y0 - 31, "bottom": y0 + 9, "conf": 97})
            x += len(t) * 15 + 10
        return {"lines": [{"words": words, "baseline_y": y0, "indent": 0}]}

    table_model, values = _table_model(n_rows=5)
    tpars = table_model["pages"][0]["pars"]
    # table rows start at y=120 in _table_model; move them between the
    # two prose paragraphs
    for line in tpars[0]["lines"]:
        for w in line["words"]:
            w["top"] += 200
            w["bottom"] += 200
        line["baseline_y"] += 200
    pars = [_prose_par(120, ["alpha", "beta"]),
            tpars[0],
            _prose_par(800, ["gamma", "delta"])]
    model = {"doc_id": 0, "family": "base",
             "pages": [{"pars": pars, "width": 1224, "height": 1584}]}
    pages = extract_document(render_hocr(model).encode()).pages
    md = write_markdown(pages)
    ti = md.index("| 100 | 101 | 102 | 103 |")
    assert md.index("alpha beta") < ti < md.index("gamma delta")
    assert "| --- | --- | --- | --- |" in md
    # table words appear exactly once (in the table, not as prose)
    assert md.count("100") == 1
    # suppressing detection keeps the old prose-only fold
    md_plain = write_markdown(pages, detect_tables=False)
    assert "|" not in md_plain


def test_azure_table_layout_cells():
    """Azure analyzeResult.tables -> column boxes from first-row cell
    polygons, span collapse, empty cells (convertTableLayoutAzure)."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.fixtures import build_azure_table_models
    from scribe_js_spark.operators.tables import extract_table_cells_fixed
    from scribe_js_spark.render_cloud import render_azure_docintel

    for doc_id in (0, 1):  # plain grid / spanning first row
        m = build_azure_table_models(doc_id)
        res = extract_document(
            render_azure_docintel(m["model"]).encode("utf-8"))
        assert res.error is None
        page = res.pages[0]
        assert len(page.tables) == 1
        grid = extract_table_cells_fixed(page, page.tables[0])
        got = [{"table_n": 0, "row_n": r, "col_n": c, "cell": cell}
               for r, row in enumerate(grid)
               for c, cell in enumerate(row)]
        assert got == m["expected"]
        if doc_id == 1:  # span collapsed a column
            n_cols_model = max(
                c["col"] for c in m["model"]["pages"][0]
                ["azure_tables"][0]["cells"]) + 1
            assert len(grid[0]) == n_cols_model - 1
