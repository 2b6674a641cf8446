"""Azure Document Intelligence JSON converter.

Semantics of /root/reference/js/import/convertDocAzureDocIntel.js:13-158:
``analyzeResult.pages[].lines/words`` with span-offset containment
assigning words to lines, 8-number polygons (unit scaling for non-pixel
documents), baseline slope from the line polygon bottom edge,
ascHeight = 3/5 line polygon height, page angle from the page record;
then pass3. ``analyzeResult.tables`` convert to explicit table layouts
(convertTableLayoutAzure, convertDocAzureDocIntel.js:160-254): column
boxes from the first row's cell polygons, table top/bottom from every
cell polygon, row bounds from each row's max cell bottom.
"""

from __future__ import annotations

import json

from ..functions.stats import js_round
from ..model import Bbox, OcrLine, OcrPage, OcrWord
from .shared import pass3


def convert_table_layout_azure(tables: list | None, pages_data: list,
                               page_dims: dict | None) -> dict:
    """analyzeResult.tables -> {page_idx: [table dict]}
    (convertTableLayoutAzure, convertDocAzureDocIntel.js:175-254):
    per table, column boxes come from the first row's cell polygons
    (left = x1, right = x2 of the top edge), the table's top/bottom
    from the min/max y over every cell polygon, and row bounds from
    each row's max cell-polygon bottom (y3/y4). Cell spans are not
    expanded — a spanning first-row cell simply yields one wide
    column, as in the reference."""
    result: dict[int, list[dict]] = {}
    for table_data in tables or []:
        regions = table_data.get("boundingRegions") or []
        page_number = regions[0].get("pageNumber") if regions else None
        if not page_number:
            continue
        page_idx = page_number - 1  # Azure is 1-indexed

        mult_w = mult_h = 1.0
        page_data = pages_data[page_idx] if page_idx < len(pages_data) \
            else None
        if page_data and page_dims and page_data.get("unit") != "pixel":
            mult_w = page_dims["width"] / page_data["width"]
            mult_h = page_dims["height"] / page_data["height"]

        cells_by_row: dict[int, list[dict]] = {}
        for cell in table_data.get("cells") or []:
            cells_by_row.setdefault(cell.get("rowIndex", 0), []).append(cell)
        first_row = sorted(cells_by_row.get(0, []),
                           key=lambda c: c.get("columnIndex", 0))

        table_top = float("inf")
        table_bottom = float("-inf")
        for cell in table_data.get("cells") or []:
            regs = cell.get("boundingRegions") or []
            poly = regs[0].get("polygon") if regs else None
            if not poly:
                continue
            ys = [y * mult_h for y in poly[1::2]]
            table_top = min(table_top, *ys)
            table_bottom = max(table_bottom, *ys)

        boxes = []
        for cell in first_row:
            regs = cell.get("boundingRegions") or []
            poly = regs[0].get("polygon") if regs else None
            if not poly:
                continue
            boxes.append((js_round(poly[0] * mult_w), js_round(table_top),
                          js_round(poly[2] * mult_w),
                          js_round(table_bottom)))

        row_bounds = []
        for r in range(table_data.get("rowCount") or 0):
            max_bottom = 0.0
            for cell in cells_by_row.get(r, []):
                regs = cell.get("boundingRegions") or []
                poly = regs[0].get("polygon") if regs else None
                if not poly:
                    continue
                bottom = max(poly[5], poly[7]) * mult_h
                if bottom > max_bottom:
                    max_bottom = bottom
            row_bounds.append(js_round(max_bottom))

        if boxes:
            result.setdefault(page_idx, []).append({
                "bbox": Bbox(boxes[0][0], js_round(table_top),
                             boxes[-1][2], js_round(table_bottom)),
                "columns": boxes,
                "row_bounds": row_bounds,
                "method": "azure",
            })
    return result


def convert_doc_azure_docintel(ocr_str: str,
                               page_dims: dict | None = None) -> list[OcrPage]:
    data = json.loads(ocr_str)
    result = data.get("analyzeResult") or {}
    pages_data = result.get("pages")
    if not pages_data:
        raise ValueError("Invalid Azure Document Intelligence format: "
                         "missing pages data.")

    pages = []
    for n, page_data in enumerate(pages_data):
        if not page_data.get("width") or not page_data.get("height"):
            raise ValueError("Failed to parse page dimensions.")
        dims = page_dims or {
            "width": page_data["width"], "height": page_data["height"]}
        page_obj = OcrPage(n, dict(dims))
        page_obj.textSource = "azure_doc_intel"

        words = page_data.get("words") or []
        lines = page_data.get("lines") or []

        mult_x = mult_y = 1.0
        if page_data.get("unit") != "pixel":
            if not page_dims:
                raise ValueError(
                    "Page dimensions must be provided for non-pixel units.")
            mult_x = page_dims["width"] / page_data["width"]
            mult_y = page_dims["height"] / page_data["height"]

        def scaled(poly):
            return [
                v * (mult_x if idx % 2 == 0 else mult_y)
                for idx, v in enumerate(poly)]

        # Words indexed by span offset once per page: the
        # line-to-word span match was O(lines x words), a quadratic
        # blowup on dense pages at corpus scale. The bisect range
        # finds candidates by offset; collected indices are re-sorted
        # so line_words keeps the original words-array order exactly.
        import bisect

        word_offs = []
        word_meta = []  # (offset, end, original index)
        for wi, word in enumerate(words):
            ws = word.get("span") or {}
            off = ws.get("offset", 0)
            word_offs.append((off, wi))
        word_offs.sort()
        sorted_offs = [o for o, _ in word_offs]
        for off, wi in word_offs:
            ws = words[wi].get("span") or {}
            word_meta.append((off, off + ws.get("length", 0), wi))

        for line_data in lines:
            line_idx = []
            for span in line_data.get("spans") or []:
                s_off = span.get("offset", 0)
                s_end = s_off + span.get("length", 0)
                lo = bisect.bisect_left(sorted_offs, s_off)
                hi = bisect.bisect_right(sorted_offs, s_end)
                # per-span hits in original words-array order — the
                # exact sequence the linear scan produced
                line_idx.extend(sorted(
                    wi for off, end, wi in word_meta[lo:hi]
                    if off >= s_off and end <= s_end))
            if not line_idx:
                continue
            line_words = [words[wi] for wi in line_idx]

            polys = [scaled(w["polygon"]) for w in line_words]
            all_x = [v for p in polys for v in p[0::2]]
            all_y = [v for p in polys for v in p[1::2]]
            line_bbox = Bbox(min(all_x), min(all_y), max(all_x), max(all_y))
            line_obj = OcrLine(page_obj, line_bbox, [0.0, 0.0])

            for j, (word_data, poly) in enumerate(zip(line_words, polys)):
                content = (word_data.get("content") or "").strip()
                if not content:
                    continue
                xs = poly[0::2]
                ys = poly[1::2]
                wid = f"word_{n + 1}_{len(page_obj.lines) + 1}_{j + 1}"
                word_obj = OcrWord(
                    line_obj, wid, word_data["content"],
                    Bbox(min(xs), min(ys), max(xs), max(ys)))
                word_obj.conf = js_round(
                    (word_data.get("confidence") or 0) * 100)
                line_obj.words.append(word_obj)

            if line_obj.words:
                lp = scaled(line_data["polygon"])
                tl = (lp[0], lp[1])
                tr = (lp[2], lp[3])
                br = (lp[4], lp[5])
                bl = (lp[6], lp[7])
                if br[0] != bl[0]:
                    line_obj.baseline[0] = (br[1] - bl[1]) / (br[0] - bl[0])
                line_height = ((br[1] - tr[1]) + (bl[1] - tl[1])) / 2
                line_obj.baseline[1] = (
                    -line_height / 4 - (line_obj.bbox.bottom - bl[1]))
                asc_height = line_height * 3 / 5
                if asc_height > 0:
                    line_obj.ascHeight = asc_height
                page_obj.lines.append(line_obj)

        page_obj.angle = page_data.get("angle") or 0
        pass3(page_obj)
        pages.append(page_obj)

    tables_by_page = convert_table_layout_azure(
        result.get("tables"), pages_data, page_dims)
    for n, page_obj in enumerate(pages):
        page_obj.tables = tables_by_page.get(n, [])

    return pages
