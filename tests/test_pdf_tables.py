"""PDF-side table detection tests (detectPdfTables minimal core)."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_pdf_table_models
from scribe_js_spark.operators.pdf.tables_pdf import (
    is_num_token,
    is_num_word,
    is_right_clustered_numeric,
)
from scribe_js_spark.operators.tables import extract_table_rows
from scribe_js_spark.render_pdf import render_pdf


class _W:
    def __init__(self, text):
        self.text = text


def test_num_token_classifier():
    assert is_num_token("1,234.56")
    assert is_num_token("(5%)")
    assert is_num_token("-")
    assert not is_num_token("a1")
    assert is_num_word("68,300")
    assert not is_num_word("$.,")  # punctuation-only except bare dash
    assert is_num_word("-")


def test_right_clustered_numeric():
    row = [_W("revenue"), _W("68,300"), _W("63,700"), _W("58,800")]
    assert is_right_clustered_numeric(row)
    # text after the numbers breaks the cluster
    assert not is_right_clustered_numeric(row + [_W("total")])
    # only two trailing numerics
    assert not is_right_clustered_numeric(
        [_W("a"), _W("b"), _W("1"), _W("2")])


def test_grid_and_numeric_tables_end_to_end():
    for doc_id in (0, 1, 7):
        m = build_pdf_table_models(doc_id)
        res = extract_document(render_pdf(m["model"], rotate=False))
        assert res.error is None
        page = res.pages[0]
        assert len(page.tables) == m["n_tables"]
        assert page.tables[0]["method"] == "grid"
        assert (len(page.tables[0]["col_separators"])
                == m["n_grid_cols"] - 1)
        matrix = extract_table_rows(page, page.tables[0]["bbox"])
        got = [(r, c, cell) for r, row in enumerate(matrix)
               for c, cell in enumerate(row)]
        exp = [(rec["row_n"], rec["col_n"], rec["cell"])
               for rec in m["expected"]]
        assert got == exp


def test_plain_text_pages_have_no_tables():
    from scribe_js_spark.fixtures import build_doc_model

    model = build_doc_model(0)
    res = extract_document(render_pdf(model, rotate=False))
    assert res.error is None
    for page in res.pages:
        assert page.tables == []


def test_phase0_prose_bailout_keeps_grids():
    """A prose page (no same-top pairs, no dot-leader cluster) returns
    only path-based tables — the Phase-0 quick exit
    (detectPdfTables.js:72-100)."""
    from scribe_js_spark.fixtures import build_doc_model
    from scribe_js_spark.operators.pdf.tables_pdf import (
        detect_pdf_table_regions)

    model = build_doc_model(7, n_pages=1)  # plain prose, no tables
    res = extract_document(render_pdf(model, rotate=False))
    assert res.error is None
    page = res.pages[0]
    # prose: zero same-top pairs, no dot-leader cluster -> the gate
    # returns the (empty) path-based result without running the
    # text-side cluster analysis
    assert detect_pdf_table_regions(page, [], 2.0, 792) == []


def test_header_rule_tables_end_to_end():
    """Ruling-row tables (>= 3 disjoint rule segments under a header
    row; detectHeaderRuleTables): region, separators at rule midpoints,
    and cells through the rule-derived columns."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        columns_from_separators)

    for doc_id in (3, 7):
        m = build_pdf_table_models(doc_id)
        res = extract_document(render_pdf(m["model"], rotate=False))
        assert res.error is None
        page = res.pages[0]
        got = [(t["method"], len(t.get("col_separators") or []) + 1)
               for t in page.tables]
        assert got == [(r["method"], r["n_cols"]) for r in m["regions"]]
        hr = page.tables[-1]
        assert hr["method"] == "header-rule"
        cols = columns_from_separators(hr["bbox"], hr["col_separators"])
        assert extract_table_rows(page, hr["bbox"], cols) == m["hr_cells"]


def test_dashed_grid_reconstitution():
    """Dashed borders drawn as short stroke pieces reconstitute into
    full rules (reconstituteDashedLines) and the grid detects as if
    solidly ruled."""
    m = build_pdf_table_models(2)  # doc_id % 6 == 2 -> dashed grid
    res = extract_document(render_pdf(m["model"], rotate=False))
    assert res.error is None
    page = res.pages[0]
    assert [t["method"] for t in page.tables] == ["grid"]
    assert len(page.tables[0]["col_separators"]) == m["n_grid_cols"] - 1
    matrix = extract_table_rows(page, page.tables[0]["bbox"])
    got = [(r, c, cell) for r, row in enumerate(matrix)
           for c, cell in enumerate(row)]
    assert got == [(rec["row_n"], rec["col_n"], rec["cell"])
                   for rec in m["expected"]]
