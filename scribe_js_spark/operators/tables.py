"""OCR-side table detection and table content extraction.

Port of /root/reference/js/utils/detectTables.js:12-322 and the
aggressive line splitter (/root/reference/js/utils/ocrUtils.js:142):

- rows grouped by top-proximity (10px),
- a row is table-like when it carries >= 4 numeric words,
- consecutive compatible rows (column counts within 1 of the running
  mean50, or no double word-overlap) of >= 4 rows form a table,
  extended by up to 2 header rows above,
- column bounds by 1-D horizontal-overlap clustering with 5px tolerance
  and midpoint expansion (calcColumnBounds).

Table content extraction assigns each word to the column containing its
midpoint and each line to its row — the input to the Markdown/tabular
writers (extractTables.js semantics).
"""

from __future__ import annotations

import re

from ..functions.stats import calc_box_overlap, calc_horizontal_overlap, mean50
from ..model import Bbox, OcrLine, OcrPage, bbox_union

_NUM_RE = re.compile(r"[0-9]")


def split_line_aggressively(line: OcrLine) -> list:
    """Split a line at gaps wider than the line height
    (ocrUtils.js:142-175). Returns lists of words (sub-lines)."""
    if not line.words:
        return []
    line_height = line.bbox.bottom - line.bbox.top
    out = []
    current = [line.words[0]]
    prev = line.words[0]
    for word in line.words[1:]:
        if word.bbox.left - prev.bbox.right > line_height:
            out.append(current)
            current = [word]
        else:
            current.append(word)
        prev = word
    out.append(current)
    return out


class _SubLine:
    __slots__ = ("words", "bbox")

    def __init__(self, words):
        self.words = words
        self.bbox = bbox_union([w.bbox for w in words])


def calc_column_bounds(bounding_boxes: list) -> list:
    """1-D interval clustering with 5px tolerance + midpoint expansion
    (detectTables.js:12-55)."""
    tolerance = 5
    column_bounds: list[list] = []
    for box in sorted(bounding_boxes, key=lambda b: b.left):
        for column in column_bounds:
            if (box.left <= column[1] + tolerance
                    and box.right >= column[0] - tolerance):
                column[0] = min(column[0], box.left)
                column[1] = max(column[1], box.right)
                break
        else:
            column_bounds.append([box.left, box.right])
    for i in range(len(column_bounds) - 1):
        mid = (column_bounds[i][1] + column_bounds[i + 1][0]) / 2
        column_bounds[i][1] = mid
        column_bounds[i + 1][0] = mid
    return [(c[0], c[1]) for c in column_bounds]


def detect_tables_in_page(page: OcrPage) -> list[Bbox]:
    """Table region bboxes (detectTables.js:62-281)."""
    lines = sorted(page.lines, key=lambda l: l.bbox.top)
    row_threshold = 10
    rows: list[dict] = []
    for line in lines:
        for row in rows:
            if abs(line.bbox.top - row["avgTop"]) <= row_threshold:
                row["items"].append(line)
                row["avgTop"] = sum(
                    l.bbox.top for l in row["items"]) / len(row["items"])
                break
        else:
            rows.append({"avgTop": line.bbox.top, "items": [line]})
    for row in rows:
        row["items"].sort(key=lambda l: l.bbox.left)

    def split_row(row):
        items = []
        for line in row["items"]:
            items.extend(_SubLine(ws) for ws in split_line_aggressively(line))
        return {"avgTop": row["avgTop"], "items": items}

    rows_split = [split_row(r) for r in rows]

    def contains_numbers(row) -> bool:
        n = sum(
            1 for item in row["items"] for w in item.words
            if _NUM_RE.search(w.text))
        return n >= 4

    def has_word_overlap(lines_a, lines_b) -> bool:
        for line_i in lines_a:
            overlaps = []
            for line_j in lines_b:
                if line_i.bbox.right < line_j.bbox.left:
                    break
                if calc_horizontal_overlap(line_i.bbox, line_j.bbox) > 0:
                    overlaps.append(line_j)
            if len(overlaps) > 1:
                words_j = [w for l in overlaps for w in l.words]
                for word_i in line_i.words:
                    count = 0
                    for word_j in words_j:
                        if calc_horizontal_overlap(word_i.bbox, word_j.bbox) > 0:
                            count += 1
                            if count >= 2:
                                return True
        return False

    def is_compat(table_rows, row) -> bool:
        if not table_rows:
            return False
        expected = mean50([len(x["items"]) for x in table_rows])
        if abs(expected - len(row["items"])) <= 1:
            return True
        existing = [item for x in table_rows for item in x["items"]]
        if has_word_overlap(existing, row["items"]) \
                or has_word_overlap(row["items"], existing):
            return False
        return True

    min_rows = 4
    tables: list[list] = []
    current: list = []
    current_compat: list = []
    start_index = 0

    def header_rows_for(compat):
        headers = []
        prev1 = rows_split[start_index - 1] if start_index - 1 >= 0 else None
        prev2 = rows_split[start_index - 2] if start_index - 2 >= 0 else None
        last_table = tables[-1] if tables else None
        if prev1 is not None and (last_table is None or prev1 not in last_table) \
                and is_compat(compat, prev1):
            headers.append(prev1)
            if prev2 is not None and (last_table is None or prev2 not in last_table) \
                    and is_compat(compat, prev2):
                headers.append(prev2)
        return headers

    i = 0
    n_rows = len(rows_split)
    while i < n_rows:
        row_split = rows_split[i]
        if contains_numbers(row_split):
            if current:
                if is_compat(current_compat, row_split):
                    current.append(row_split)
                    current_compat.append(row_split)
                elif len(current) >= min_rows:
                    tables.append(header_rows_for(current_compat) + current)
                    current = [row_split]
                    current_compat = [row_split]
                    start_index = i
                else:
                    current = [row_split]
                    current_compat = [row_split]
                    start_index = i
            else:
                current.append(row_split)
                current_compat.append(row_split)
                start_index = i
        elif current:
            nxt = rows_split[i + 1] if i + 1 < n_rows else None
            nxt2 = rows_split[i + 2] if i + 2 < n_rows else None
            if (nxt and nxt2 and contains_numbers(nxt)
                    and contains_numbers(nxt2)
                    and is_compat(current_compat, nxt)
                    and is_compat(current_compat, nxt2)):
                current.append(row_split)
                i += 1
                continue
            if len(current) >= min_rows:
                tables.append(header_rows_for(current_compat) + current)
            current = []
            current_compat = []
        i += 1

    if len(current) >= min_rows:
        tables.append(current)

    return [
        bbox_union([
            bbox_union([item.bbox for item in row["items"]])
            for row in table])
        for table in tables
    ]


def make_table_columns(page: OcrPage, bbox: Bbox) -> list[Bbox]:
    """Column boxes for a detected table region
    (makeTableFromBbox, detectTables.js:288-322)."""
    lines = [
        l for l in page.lines if calc_box_overlap(l.bbox, bbox) > 0.5]
    if not lines:
        return [bbox]
    sub_boxes = []
    for line in lines:
        sub_boxes.extend(
            bbox_union([w.bbox for w in ws])
            for ws in split_line_aggressively(line))
    bounds = calc_column_bounds(sub_boxes)
    cols = [Bbox(lo, bbox.top, hi, bbox.bottom) for lo, hi in bounds]
    cols[0].left = bbox.left
    cols[-1].right = bbox.right
    for i in range(len(cols) - 1):
        mid = (cols[i].right + cols[i + 1].left) / 2
        cols[i].right = mid
        cols[i + 1].left = mid
    return cols


def extract_table_cells_fixed(page: OcrPage, table: dict) -> list[list[str]]:
    """Cell matrix for a table with an explicit layout (ABBYY
    convertTableLayoutAbbyy output): words assign to the column box
    containing their midpoint and to the first row whose bound is at
    or below their center."""
    cols = table["columns"]
    bounds = table["row_bounds"]
    bbox = table["bbox"]
    grid = [["" for _ in cols] for _ in bounds]
    for line in page.lines:
        for w in line.words:
            cx = (w.bbox.left + w.bbox.right) / 2
            cy = (w.bbox.top + w.bbox.bottom) / 2
            if not (bbox.left <= cx <= bbox.right
                    and bbox.top <= cy <= bbox.bottom):
                continue
            col = next(
                (j for j, c in enumerate(cols) if c[0] <= cx < c[2]),
                None)
            row = next(
                (i for i, b in enumerate(bounds) if cy <= b), None)
            if col is None or row is None:
                continue
            grid[row][col] = (grid[row][col] + " " + w.text).strip()
    return grid


def extract_table_rows(page: OcrPage, bbox: Bbox,
                       columns: list[Bbox] | None = None) -> list[list[str]]:
    """Cell text matrix for a table region: lines inside the region are
    rows (grouped by top proximity); words assign to the column
    containing their midpoint (extractTables.js semantics)."""
    if columns is None:
        columns = make_table_columns(page, bbox)
    lines = [
        l for l in page.lines if calc_box_overlap(l.bbox, bbox) > 0.5]
    rows: list[dict] = []
    for line in sorted(lines, key=lambda l: l.bbox.top):
        for row in rows:
            if abs(line.bbox.top - row["avgTop"]) <= 10:
                row["lines"].append(line)
                row["avgTop"] = sum(
                    l.bbox.top for l in row["lines"]) / len(row["lines"])
                break
        else:
            rows.append({"avgTop": line.bbox.top, "lines": [line]})

    out = []
    for row in rows:
        cells = [[] for _ in columns]
        words = [
            w for line in row["lines"] for w in line.words]
        for w in sorted(words, key=lambda w: w.bbox.left):
            mid = (w.bbox.left + w.bbox.right) / 2
            for ci, col in enumerate(columns):
                if col.left <= mid <= col.right:
                    cells[ci].append(w.text)
                    break
        out.append([" ".join(c) for c in cells])
    return out


def render_table_markdown(cell_matrix: list[list[str]],
                          escape: bool = False) -> str:
    """Markdown pipe table (writeMarkdown.js renderMarkdownTable).
    ``escape`` applies the markdown-special + pipe escaping the
    reference applies when formatting is on (writeMarkdown.js:70)."""
    if not cell_matrix:
        return ""
    if escape:
        from ..export.markdown import _escape_markdown

        cell_matrix = [
            [_escape_markdown(c).replace("|", "\\|") for c in row]
            for row in cell_matrix]
    n_cols = max(len(r) for r in cell_matrix)
    out = []
    for r, row in enumerate(cell_matrix):
        padded = list(row) + [""] * (n_cols - len(row))
        out.append("| " + " | ".join(padded) + " |\n")
        if r == 0:
            out.append("| " + " | ".join(["---"] * n_cols) + " |\n")
    return "".join(out)
