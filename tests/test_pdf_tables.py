"""PDF-side table detection tests (detectPdfTables minimal core)."""

import pytest

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


# ------------------- r4 fidelity push: segmented / multi-table / titles


def test_segmented_hline_table_end_to_end():
    """Per-cell border segments, no verticals
    (detectSegmentedHLineTables): break pattern -> column separators,
    cells extracted through them (docs 5, 11, 17 are the segmented
    fixture variant)."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        columns_from_separators)
    from scribe_js_spark.operators.tables import extract_table_rows

    for doc_id in (5, 11, 17):
        m = build_pdf_table_models(doc_id)
        res = extract_document(render_pdf(m["model"], rotate=False))
        assert res.error is None
        page = res.pages[0]
        seg = [t for t in page.tables
               if t["method"] == "segmented-hline"]
        assert len(seg) == 1
        t = seg[0]
        want = m["regions"][0]
        assert len(t["col_separators"]) + 1 == want["n_cols"]
        cols = columns_from_separators(t["bbox"], t["col_separators"])
        matrix = extract_table_rows(page, t["bbox"], cols)
        exp = [r for r in m["expected"] if r["table_n"] == 0]
        got = {(r, c): cell for r, row in enumerate(matrix)
               for c, cell in enumerate(row)}
        assert got == {(r["row_n"], r["col_n"]): r["cell"] for r in exp}


def test_two_grids_one_page():
    """Two stacked ruled grids detect as two components -> two tables
    (detectStrictGrids union-find; docs 4, 10 are the variant)."""
    for doc_id in (4, 10):
        m = build_pdf_table_models(doc_id)
        res = extract_document(render_pdf(m["model"], rotate=False))
        assert res.error is None
        grids = [t for t in res.pages[0].tables
                 if t["method"] == "grid"]
        assert len(grids) == 2
        assert grids[0]["bbox"].top < grids[1]["bbox"].top
        assert len(grids[1]["col_separators"]) + 1 == 3


def test_table_title_detection():
    """A 'Table 1 <word>' caption line above the grid becomes the
    table's title (detectTableTitle); tables without a caption get
    None."""
    m = build_pdf_table_models(0)
    assert m["regions"][0]["title"] is not None
    res = extract_document(render_pdf(m["model"], rotate=False))
    t = res.pages[0].tables[0]
    assert t["title"] is not None
    assert t["title"]["text"] == m["regions"][0]["title"]

    m2 = build_pdf_table_models(1)   # no caption variant
    res2 = extract_document(render_pdf(m2["model"], rotate=False))
    assert res2.pages[0].tables[0]["title"] is None


def test_validate_stream_order_drops_bad_rows():
    """Phase 6: a row whose spatial order contradicts stream order is
    dropped; column-major rows (index gaps > 2) are exempt."""
    from scribe_js_spark.model import Bbox
    from scribe_js_spark.operators.pdf.tables_pdf import (
        validate_stream_order)

    class L:
        def __init__(self, left):
            self.bbox = Bbox(left, 0, left + 10, 10)

    lines = [L(300), L(100), L(200), L(100), L(200), L(300),
             L(100), L(200), L(300), L(50), L(400)]
    table = {"rows": [
        {"y": 0, "line_indices": [0, 1, 2]},    # spatial != stream: drop
        {"y": 10, "line_indices": [3, 4, 5]},   # consistent: keep
        {"y": 20, "line_indices": [6, 7, 8]},   # consistent: keep
        {"y": 30, "line_indices": [9, 10]},     # keep
    ]}
    assert validate_stream_order(table, lines)
    assert [r["y"] for r in table["rows"]] == [10, 20, 30]

    # column-major (gaps > 2) skips the spatial check entirely
    table2 = {"rows": [{"y": 0, "line_indices": [0, 6]},
                       {"y": 10, "line_indices": [1, 7]},
                       {"y": 20, "line_indices": [2, 8]}]}
    assert validate_stream_order(table2, lines)
    assert len(table2["rows"]) == 3


def test_split_cluster_by_y_gap():
    """Stacked tables sharing an x-extent split at a y-gap > 4-5x the
    median row gap (splitClusterByYGap)."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        _split_cluster_by_y_gap)

    h = [{"y": float(y), "left": 0.0, "right": 500.0}
         for y in (0, 20, 40, 60, 400, 420, 440)]
    parts = _split_cluster_by_y_gap(h)
    assert [len(p) for p in parts] == [4, 3]
    # consistent spacing: no split
    h2 = [{"y": float(y), "left": 0.0, "right": 500.0}
          for y in range(0, 200, 20)]
    assert len(_split_cluster_by_y_gap(h2)) == 1


def test_row_band_tables_end_to_end():
    """Zebra / per-cell-background tables (extractRowBandStructure +
    makeRowBandCandidates): doc 30 (numeric cells) exercises the
    adoption path — the band region lends its dominant-anchor columns
    to the numeric candidate; doc 31 (alpha cells) exercises the
    standalone >= 8-band path where no text candidate forms."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        columns_from_separators)
    from scribe_js_spark.operators.tables import extract_table_rows

    for doc_id in (30, 31):
        m = build_pdf_table_models(doc_id)
        res = extract_document(render_pdf(m["model"], rotate=False))
        assert res.error is None
        page = res.pages[0]
        assert [t["method"] for t in page.tables] == ["row-band"]
        t = page.tables[0]
        assert len(t["col_separators"]) + 1 == 4
        cols = columns_from_separators(t["bbox"], t["col_separators"])
        matrix = extract_table_rows(page, t["bbox"], cols)
        got = {(r, c): cell for r, row in enumerate(matrix)
               for c, cell in enumerate(row)}
        assert got == {(r["row_n"], r["col_n"]): r["cell"]
                       for r in m["expected"]}


def test_extract_row_band_structure_units():
    """Band assembly semantics: touching fills merge into one range
    but keep per-cell anchors; a narrow icon-sized fill is rejected;
    subtotal-row merged cells that appear in under half the bands
    don't contribute column anchors."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        extract_row_band_structure)

    def band(y, cells):
        return [{"left": l, "right": r, "top": y, "bottom": y + 20}
                for l, r in cells]

    cells3 = [(100, 250), (256, 400), (406, 550)]
    fills = band(0, cells3) + band(30, cells3) + band(60, cells3)
    # one merged subtotal band (single wide fill) + an icon-sized fill
    fills += band(90, [(100, 550)])
    fills += [{"left": 600, "top": 300, "right": 620, "bottom": 320}]
    out = extract_row_band_structure(fills)
    assert len(out) == 1
    rbr = out[0]
    assert len(rbr["row_ys"]) == 4
    # separators at the midpoints of the dominant 3-cell pattern
    assert [round(x) for x in rbr["col_xs"]] == [253, 403]


# ------------------------ Phase 1/2/4 text-candidate engine (r4)


def _detect(doc_id):
    m = build_pdf_table_models(doc_id)
    res = extract_document(render_pdf(m["model"], rotate=False))
    assert res.error is None
    return m, res.pages[0]


def test_text_table_no_numbers():
    """All-alpha >= 3-segment rows form a 'text' candidate under the
    min_rows=4 regime (Phase 1 signal B without numerics)."""
    m, page = _detect(36)
    assert [(t["method"], len(t["col_separators"]) + 1)
            for t in page.tables] == [("text", 4)]


def test_side_by_side_tables_split_by_x_cluster():
    """Same-y rows from two adjacent tables split into
    stream-consecutive sub-rows, then x-overlap union-find separates
    the candidates (groupRowsIntoCandidates :1015-1035)."""
    m, page = _detect(37)
    assert [t["method"] for t in page.tables] == ["numeric", "numeric"]
    a, b = page.tables
    assert a["bbox"].right < b["bbox"].left


def test_column_major_stream_rows():
    """Column-major PDFs emit each cell as its own scattered line;
    >= 3 pure-numeric singleton fragments accept the visual row
    (Phase 1 :167-183), and Phase 6 exempts these rows from the
    spatial-order check."""
    m, page = _detect(38)
    assert len(page.tables) == 1
    assert len(page.tables[0]["rows"]) >= 6


def test_section_header_bridging():
    """A narrow 1-line section header between two halves of a table
    bridges the over-threshold y-gap (:955-1000) — one candidate, not
    two."""
    m, page = _detect(39)
    assert len(page.tables) == 1
    assert len(page.tables[0]["rows"]) >= 8


def test_validate_candidate_rejections():
    """Phase 4 rejections: tiny equation fragments and prose cells
    never become tables."""
    from scribe_js_spark.model import Bbox
    from scribe_js_spark.operators.pdf.tables_pdf import (
        validate_candidate)

    class W:
        def __init__(self, text):
            self.text = text

    class L:
        def __init__(self, left, right, words):
            self.bbox = Bbox(left, 0, right, 10)
            self.words = [W(t) for t in words]

    # tiny fragments (equation subscripts): every line < 70 px
    lines = [L(i * 100, i * 100 + 30, ["x"]) for i in range(9)]
    cand = {"rows": [{"y": r * 20, "line_indices": [3 * r, 3 * r + 1,
                                                    3 * r + 2]}
                     for r in range(3)]}
    assert not validate_candidate(cand, lines)

    # prose cells: 3+ alphabetic words, zero numerics, in 2+ cells
    lines2 = [L((i % 2) * 400, (i % 2) * 400 + 350,
                ["lorem", "ipsum", "dolor", "sit"]) for i in range(6)]
    cand2 = {"rows": [{"y": r * 20, "line_indices": [2 * r, 2 * r + 1]}
                      for r in range(3)]}
    assert not validate_candidate(cand2, lines2)


def test_spanning_header_grid():
    """A header strip whose verticals are a strict subset of the data
    columns (a cell spanning several data columns) is the one allowed
    grid asymmetry (tryDetectStrictGrid :2346-2366)."""
    m, page = _detect(40)
    assert [(t["method"], len(t["col_separators"]) + 1)
            for t in page.tables] == [("grid", 4)]
    # header strip became the first row with the spanning cells
    from scribe_js_spark.operators.tables import extract_table_rows
    matrix = extract_table_rows(page, page.tables[0]["bbox"], None)
    assert matrix[0][0].startswith("h2007")
    assert matrix[0][1] == ""


def test_extend_table_label_column_and_total_row():
    """Phase 5.6: an unstroked label column left of the ruled grid
    joins the table (old left edge becomes a separator) and a 'Total'
    row below the bottom rule is captured as a continuation row."""
    m, page = _detect(41)
    t = page.tables[0]
    assert t["method"] == "grid"
    assert len(t["col_separators"]) + 1 == 4
    assert len(t["rows"]) == 5            # 4 data strips + Total row
    from scribe_js_spark.operators.tables import extract_table_rows
    matrix = extract_table_rows(page, t["bbox"], None)
    assert matrix[0][0] == "item00"
    assert matrix[-1][0] == "Total"


def test_extend_table_refuses_number_strip_and_wide_column():
    """The label-column extension refuses pure-numeric page furniture
    (legal line numbers) — a real label column carries text."""
    from scribe_js_spark.model import Bbox
    from scribe_js_spark.operators.pdf.tables_pdf import (
        extend_table_to_adjacent_content)

    class W:
        def __init__(self, text):
            self.text = text

    class L:
        def __init__(self, left, top, right, words):
            self.bbox = Bbox(left, top, right, top + 20)
            self.words = [W(t) for t in words]

    class P:
        pass

    page = P()
    # table lines at x 300-800, rows y 0/50/100; margin numbers at x 20
    page.lines = [L(300, y, 800, ["1,00" + str(y)]) for y in (0, 50, 100)]
    n0 = len(page.lines)
    page.lines += [L(20, y, 40, [str(i + 1)])
                   for i, y in enumerate((0, 50, 100))]
    table = {"bbox": Bbox(300, 0, 800, 120),
             "col_separators": [500.0],
             "rows": [{"y": float(y), "line_indices": [i]}
                      for i, y in enumerate((0, 50, 100))]}
    extend_table_to_adjacent_content(table, page, [table])
    assert table["bbox"].left == 300      # refused: no alphabetic text
    assert len(table["rows"]) == 3
    # with alphabetic labels instead, the column is adopted
    page.lines = page.lines[:n0] + [
        L(20, y, 140, ["item", str(i + 1)])
        for i, y in enumerate((0, 50, 100))]
    extend_table_to_adjacent_content(table, page, [table])
    assert table["bbox"].left == 20
    assert table["col_separators"][0] == 300


def test_stroked_cell_rect_grid():
    """A grid drawn as per-cell stroked rectangles (re S) detects via
    extractGridSegments' edge decomposition — classifyPaths alone
    never sees its lines (doc 42)."""
    m, page = _detect(42)
    assert [(t["method"], len(t["col_separators"]) + 1)
            for t in page.tables] == [("grid", 4)]
    assert len(page.tables[0]["rows"]) == 4


def test_stacked_two_cell_header_rule2():
    """detectHeaders Rule 2: no single header row has 3+ cells, but
    2+ all-text rows of exactly two x-aligned cells (the annual-report
    'As at / 31st March' stack) make the header strong (doc 43)."""
    m, page = _detect(43)
    t = page.tables[0]
    assert t["method"] == "numeric"
    assert t["header"] == "strong"
    assert len(t["col_separators"]) + 1 == 3


def test_currency_chain_and_leader_dots():
    """extractStructure cell merger: '$' chains into its number and
    '.......' leaders absorb into the label phrase — neither forms a
    spurious column (doc 44)."""
    m, page = _detect(44)
    t = page.tables[0]
    assert len(t["col_separators"]) + 1 == 3


def test_header_anchor_separator_replacement():
    """Sparse tables: when word clustering under-counts (< 3 seps) and
    a strong header found more anchors, the header-derived separators
    (anchor midpoints + synthesized label separator) win."""
    from scribe_js_spark.model import Bbox, OcrLine, OcrPage, OcrWord
    from scribe_js_spark.operators.pdf.tables_pdf import (
        infer_unruled_columns)

    page = OcrPage(0, {"width": 1224, "height": 1584})

    def line(y, x, text):
        ln = OcrLine(page, Bbox(x, y, x + len(text) * 15, y + 40),
                     [0.0, 0.0])
        w = OcrWord(ln, f"w{y}_{x}", text,
                    Bbox(x, y, x + len(text) * 15, y + 40))
        ln.words = [w]
        return ln

    # sparse: labels + ONE populated numeric column; the header named 4
    page.lines = []
    rows = []
    for r in range(4):
        y = 100 + r * 50
        page.lines.append(line(y, 100, f"item{r:02d}"))
        page.lines.append(line(y, 500, "1,234"))
        rows.append({"y": float(y),
                     "line_indices": [2 * r, 2 * r + 1]})
    bbox = Bbox(100, 95, 1180, 300)
    table = {"bbox": bbox, "rows": rows, "method": "numeric",
             "col_separators": []}
    plain = infer_unruled_columns(page, table)
    assert len(plain) < 3
    from scribe_js_spark.operators.pdf.tables_pdf import extract_structure
    table["headers"] = {
        "anchors": [530.0, 730.0, 930.0, 1130.0], "band_top": 60.0,
        "band_bottom": 100.0, "confidence": "strong"}
    extract_structure(page, table)
    with_hdr = table["col_separators"]
    assert len(with_hdr) == 4            # label sep + 3 anchor midpoints
    assert with_hdr[0] < 530


def test_follows_prose_stops_header_walk():
    """'...were as follows:' is introductory prose, not a header row —
    the upward header walk stops there instead of absorbing it
    (refineTableTop :3235-3241); a short sub-header like 'Deferred:'
    keeps chaining."""
    from scribe_js_spark.model import Bbox, OcrLine, OcrPage, OcrWord
    from scribe_js_spark.operators.pdf.tables_pdf import (
        detect_table_header)

    page = OcrPage(0, {"width": 1224, "height": 1584})

    def line(y, x, texts):
        ln = OcrLine(page, Bbox(x, y, x + sum(len(t) + 1 for t in texts)
                                * 15, y + 40), [0.0, 0.0])
        ws = []
        cx = x
        for t in texts:
            ws.append(OcrWord(ln, f"w{y}_{cx}", t,
                              Bbox(cx, y, cx + len(t) * 15, y + 40)))
            cx += (len(t) + 1) * 15
        ln.words = ws
        return ln

    page.lines = [
        line(40, 100, ["results", "were", "as", "follows:"]),
        line(100, 100, ["Deferred:"]),
        line(160, 100, ["ha"]), line(160, 500, ["hb"]),
        line(160, 800, ["hc"]),
        line(220, 100, ["item00"]), line(220, 500, ["1,234"]),
        line(220, 800, ["9,876"]),
        line(270, 100, ["item01"]), line(270, 500, ["2,234"]),
        line(270, 800, ["8,876"]),
        line(320, 100, ["item02"]), line(320, 500, ["3,234"]),
        line(320, 800, ["7,876"]),
    ]
    table = {"bbox": Bbox(95, 215, 1000, 340),
             "rows": [{"y": 220.0, "line_indices": [5, 6, 7]},
                      {"y": 270.0, "line_indices": [8, 9, 10]},
                      {"y": 320.0, "line_indices": [11, 12, 13]}]}
    h = detect_table_header(page, table)
    assert h is not None
    # band reaches the 3-cell header row and the Deferred: sub-header,
    # but NOT the follows: prose line
    assert 95 <= h["band_top"] <= 105


def _table_cells(page):
    from scribe_js_spark.operators.pdf.tables_pdf import (
        columns_from_separators)
    from scribe_js_spark.operators.tables import extract_table_rows

    out = []
    for tn, t in enumerate(page.tables):
        cols = (columns_from_separators(t["bbox"], t["col_separators"])
                if t["col_separators"] else None)
        for r, row in enumerate(extract_table_rows(page, t["bbox"], cols)):
            for c, cell in enumerate(row):
                out.append((tn, r, c, cell))
    return out


@pytest.mark.parametrize("doc_id", range(45, 50))
def test_refine_table_top_family(doc_id):
    """Phase-5.5 refineTableTop docs (detectPdfTables.js:3095-3352):
    wide-prose shrink (45), out-of-expansion multi-segment chain (46),
    strong stacked header + 'follows:' stop (47), hLine scan anchor
    (48), sibling top floor (49). 45-47 fail if refine_table_top is
    stubbed (verified at authoring time); 48/49 carry dedicated
    counterfactual tests below."""
    m = build_pdf_table_models(doc_id)
    res = extract_document(render_pdf(m["model"], rotate=False))
    assert res.error is None
    page = res.pages[0]
    got = [(t["method"], len(t.get("col_separators") or []) + 1,
            t.get("header", "none")) for t in page.tables]
    assert got == [(r["method"], r["n_cols"], r["header"])
                   for r in m["regions"]]
    want = sorted((e["table_n"], e["row_n"], e["col_n"], e["cell"])
                  for e in m["expected"])
    assert sorted(_table_cells(page)) == want


def test_refine_top_hline_anchor_counterfactual():
    """Doc 48's header rides ONLY on the hLine scan anchor: the gap
    from the first data row to the header exceeds the 0.45x-pitch
    single-segment budget, so removing the rule must drop the header
    row from the table (refineTableTop :3160-3175)."""
    m = build_pdf_table_models(48)
    page48 = m["model"]["pages"][0]
    assert page48.pop("rules", None), "doc 48 must carry the rule"
    res = extract_document(render_pdf(m["model"], rotate=False))
    page = res.pages[0]
    cells = _table_cells(page)
    # data rows only: 5 rows x 4 cols; no header row
    assert len(cells) == 20
    header_texts = {e["cell"] for e in m["expected"]
                    if e["row_n"] == 0 and e["cell"]}
    assert not any(c[3] in header_texts for c in cells)


def test_refine_top_sibling_floor_counterfactual():
    """Doc 49's lower table: the upper sibling's bbox.bottom floors
    the upward scan; with the floor forced to 0 the multi-segment
    chain (gap 120 < 2.5x pitch) swallows the upper table's rows
    (refineTableTop topFloor, detectPdfTables.js:667-683)."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        refine_table_top)

    m = build_pdf_table_models(49)
    res = extract_document(render_pdf(m["model"], rotate=False))
    page = res.pages[0]
    assert len(page.tables) == 2
    upper, lower = page.tables
    assert lower["bbox"].top > upper["bbox"].bottom

    # counterfactual: rebuild the lower table's pre-refine state and
    # refine with no floor — the chain must climb into the upper table
    cand = {"bbox": lower["bbox"], "rows": lower["rows"],
            "method": "numeric", "headers": lower.get("headers")}
    refine_table_top(cand, page.lines, [], top_floor=0.0)
    assert cand["bbox"].top < upper["bbox"].bottom


def test_rule_cluster_column_refinement():
    """Phase 5.7 (detectPdfTables.js:735-762): doc 50's x-scattered
    numeric cells cluster into one blob column, and only the disjoint
    rule pair under the table recovers the 3-column structure; with
    refine_text_columns_from_rules stubbed the doc reports 2 columns
    (verified at authoring time)."""
    m = build_pdf_table_models(50)
    res = extract_document(render_pdf(m["model"], rotate=False))
    page = res.pages[0]
    assert [(t["method"], len(t["col_separators"]) + 1)
            for t in page.tables] == [("numeric", 3)]
    want = sorted((e["table_n"], e["row_n"], e["col_n"], e["cell"])
                  for e in m["expected"])
    assert sorted(_table_cells(page)) == want


def test_sibling_total_split():
    """Phase 5.4 (detectPdfTables.js:560-640): doc 51's two banded
    sections — one stripe set, each ending in a 'Total ...' row,
    110 px apart — split from a single adopted candidate into two
    sibling tables; the second split's locked top keeps refine from
    chaining back through the first."""
    m = build_pdf_table_models(51)
    res = extract_document(render_pdf(m["model"], rotate=False))
    page = res.pages[0]
    assert [(t["method"], len(t["col_separators"]) + 1)
            for t in page.tables] == [("row-band", 4), ("row-band", 4)]
    assert page.tables[0]["bbox"].bottom < page.tables[1]["bbox"].top
    want = sorted((e["table_n"], e["row_n"], e["col_n"], e["cell"])
                  for e in m["expected"])
    assert sorted(_table_cells(page)) == want


def test_multi_region_header_separated_split():
    """Multi-region split (detectPdfTables.js:388-440): doc 52's two
    banded sections form separate stripe regions with a 2-cell header
    row bridging the candidate across the gap; the header-separated
    rule splits it per region and the second table adopts the header
    row as its band through refine_table_top."""
    m = build_pdf_table_models(52)
    res = extract_document(render_pdf(m["model"], rotate=False))
    page = res.pages[0]
    assert [(t["method"], len(t["col_separators"]) + 1)
            for t in page.tables] == [("row-band", 4), ("row-band", 4)]
    want = sorted((e["table_n"], e["row_n"], e["col_n"], e["cell"])
                  for e in m["expected"])
    assert sorted(_table_cells(page)) == want


def test_vline_first_column_structure():
    """extractStructure's vLine path (:2739-2748): doc 53's two
    interior vertical rules carry the column geometry that word
    clustering (x-scattered blob) cannot recover; the separators are
    the clustered vline positions themselves."""
    m = build_pdf_table_models(53)
    res = extract_document(render_pdf(m["model"], rotate=False))
    page = res.pages[0]
    assert [(t["method"], t["col_separators"]) for t in page.tables] \
        == [("numeric", [480.0, 690.0])]
    want = sorted((e["table_n"], e["row_n"], e["col_n"], e["cell"])
                  for e in m["expected"])
    assert sorted(_table_cells(page)) == want
    # counterfactual: without correlated verticals the blob collapses
    from scribe_js_spark.operators.pdf.tables_pdf import (
        extract_structure)

    t = dict(page.tables[0], col_separators=[])
    extract_structure(page, t, v_lines=())
    assert len(t["col_separators"]) + 1 == 2
