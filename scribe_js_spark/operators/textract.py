"""AWS Textract JSON converter.

Semantics of /root/reference/js/import/convertDocTextract.js:50-541:
document-level Blocks array -> PAGE/LINE/WORD tree via CHILD
relationships, normalized (0-1) coordinates scaled to pixel page dims,
page/line orientation from polygon point order, baseline slope from the
line polygon's bottom edge, xHeight/ascHeight from descender-free word
polygons (mean50), paragraphs from LAYOUT_* blocks (fallback paragraph
for unassigned lines), lines reordered to paragraph order, then
splitUnicodeSuperscripts + pass3.

Textract supplies no pixel dimensions; the caller provides page dims
(the reference requires them from rendered images; we default to the
corpus page frame).
"""

from __future__ import annotations

import json

from ..functions.stats import js_round, mean50
from ..functions.textnorm import ASC_CHARS, DESC_CHARS, X_CHARS
from ..model import Bbox, OcrLine, OcrPage, OcrPar, OcrWord, bbox_union
from .shared import pass3, split_unicode_superscripts

DEFAULT_PAGE_DIMS = {"width": 1224, "height": 1584}


def _detect_poly_orientation(poly) -> int:
    if poly[0]["X"] > poly[2]["X"] and poly[0]["Y"] < poly[2]["Y"]:
        return 1
    if poly[0]["X"] > poly[2]["X"] and poly[0]["Y"] > poly[2]["Y"]:
        return 2
    if (poly[0]["X"] < poly[2]["X"] and poly[1]["X"] < poly[3]["X"]
            and poly[0]["Y"] > poly[2]["Y"]):
        return 3
    return 0


def _convert_bbox(bb, dims) -> Bbox:
    return Bbox(
        js_round(bb["Left"] * dims["width"]),
        js_round(bb["Top"] * dims["height"]),
        js_round((bb["Left"] + bb["Width"]) * dims["width"]),
        js_round((bb["Top"] + bb["Height"]) * dims["height"]),
    )


def _convert_polygon(poly, dims, orientation):
    order = {0: (3, 2, 1, 0), 1: (2, 1, 0, 3), 2: (1, 0, 3, 2),
             3: (0, 3, 2, 1)}[orientation]
    bl, br, tr, tl = order
    def pt(i):
        return (js_round(poly[i]["X"] * dims["width"]),
                js_round(poly[i]["Y"] * dims["height"]))
    return {"bl": pt(bl), "br": pt(br), "tr": pt(tr), "tl": pt(tl)}


def convert_doc_textract(ocr_str: str, page_dims: dict | None = None
                         ) -> list[OcrPage]:
    data = json.loads(ocr_str)
    blocks = data.get("Blocks")
    if not isinstance(blocks, list):
        raise ValueError("Invalid Textract JSON: no Blocks array")

    dims = page_dims or DEFAULT_PAGE_DIMS

    relationship_map = {}
    block_map = {}
    for b in blocks:
        block_map[b.get("Id")] = b
        for rel in b.get("Relationships", []) or []:
            if rel.get("Type") == "CHILD":
                relationship_map[b["Id"]] = rel.get("Ids", [])

    by_page: dict[int, dict] = {}
    for b in blocks:
        n = b.get("Page", 1)
        pd = by_page.setdefault(n, {"lines": [], "layouts": []})
        bt = b.get("BlockType", "")
        if bt == "LINE":
            pd["lines"].append(b)
        elif bt.startswith("LAYOUT_"):
            pd["layouts"].append(b)

    page_blocks = [b for b in blocks if b.get("BlockType") == "PAGE"]
    pages = []
    for i, page_block in enumerate(page_blocks):
        page_poly = (page_block.get("Geometry") or {}).get("Polygon")
        if not page_poly:
            raise ValueError(f"No page polygon for page {i + 1}")
        page_orientation = _detect_poly_orientation(page_poly)
        page_obj = OcrPage(i, dict(dims))
        page_obj.textSource = "textract"

        pd = by_page.get(i + 1, {"lines": [], "layouts": []})
        line_obj_map = {}
        for line_index, line_block in enumerate(pd["lines"]):
            line_obj = _convert_line(
                line_block, block_map, relationship_map, page_obj, i,
                line_index, dims, page_orientation)
            if line_obj is not None:
                page_obj.lines.append(line_obj)
                line_obj_map[line_block["Id"]] = line_obj

        _paragraphs_from_layout(
            page_obj, pd["layouts"], relationship_map, block_map,
            line_obj_map)

        # Reorder lines to paragraph (reading) order — Textract does not
        # do this itself (:173-184).
        lines2 = [l for par in page_obj.pars for l in par.lines]
        if len(lines2) == len(page_obj.lines):
            page_obj.lines = lines2

        pass3(page_obj)
        pages.append(page_obj)
    return pages


def _convert_line(line_block, block_map, relationship_map, page_obj,
                  page_n, line_index, dims, page_orientation):
    if not line_block.get("Text") or not line_block.get("Geometry"):
        return None
    geom = line_block["Geometry"]
    bbox_line = _convert_bbox(geom["BoundingBox"], dims)
    poly_line = _convert_polygon(geom["Polygon"], dims, page_orientation)
    line_obj = OcrLine(page_obj, bbox_line, [0, 0])

    child_ids = relationship_map.get(line_block["Id"], [])
    word_blocks = [
        block_map[cid] for cid in child_ids
        if block_map.get(cid, {}).get("BlockType") == "WORD"]

    word_polys = {}
    for word_index, wb in enumerate(word_blocks):
        bbox_word = _convert_bbox(wb["Geometry"]["BoundingBox"], dims)
        wid = f"word_{page_n + 1}_{line_index + 1}_{word_index + 1}"
        word_polys[wid] = _convert_polygon(
            wb["Geometry"]["Polygon"], dims, page_orientation)
        word_obj = OcrWord(line_obj, wid, wb["Text"], bbox_word)
        word_obj.conf = wb.get("Confidence", 100)
        line_obj.words.append(word_obj)

    if not word_blocks or not line_obj.words:
        return None

    line_orientation = int((word_blocks[0]["Geometry"].get(
        "RotationAngle", 0) or 0) / 90)
    orientation = page_orientation - line_orientation
    if orientation < 0:
        orientation += 4
    line_obj.orientation = orientation
    # (Rotated-line bbox remapping for orientations 1-3, :248-333,
    # applies only to rotated Textract output; our corpus is upright.)

    if poly_line["br"][0] != poly_line["bl"][0]:
        line_obj.baseline[0] = (
            (poly_line["br"][1] - poly_line["bl"][1])
            / (poly_line["br"][0] - poly_line["bl"][0]))

    split_unicode_superscripts(line_obj)

    x_only_polys = []
    asc_only_polys = []
    x_only_n = 0
    asc_only_n = 0
    non_desc_polys = []
    for word in line_obj.words:
        wp = word_polys.get(word.id)
        if wp is None:
            continue
        has_desc = any(c in DESC_CHARS for c in word.text)
        has_asc = any(c in ASC_CHARS for c in word.text)
        has_x = any(c in X_CHARS for c in word.text)
        if not has_desc and (has_x or has_asc):
            non_desc_polys.append(wp)
        if has_x and not has_asc and not has_desc \
                and not any(c in "fi" for c in word.text):
            x_only_polys.append(wp)
            x_only_n += 1
        if has_asc and not has_desc:
            asc_only_polys.append(wp)
            asc_only_n += 1

    def poly_height(wp):
        return ((wp["bl"][1] - wp["tl"][1]) + (wp["br"][1] - wp["tr"][1])) / 2

    x_height = mean50([poly_height(wp) for wp in x_only_polys])
    asc_height = mean50([poly_height(wp) for wp in asc_only_polys])
    if x_height and asc_height and x_height > asc_height * 0.8:
        if asc_only_n > x_only_n:
            x_height = None

    deltas = []
    for wp in non_desc_polys:
        word_bottom_mid = js_round((wp["bl"][1] + wp["br"][1]) / 2)
        word_x_mid = js_round((wp["bl"][0] + wp["br"][0]) / 2)
        offset = word_x_mid - line_obj.bbox.left
        expected_bottom = poly_line["bl"][1] + 0 * offset
        deltas.append(word_bottom_mid - expected_bottom)
    delta = mean50(deltas)
    line_height = ((poly_line["br"][1] - poly_line["tr"][1])
                   + (poly_line["bl"][1] - poly_line["tl"][1])) / 2
    if (delta is not None and delta < line_obj.bbox.bottom
            and delta < line_height / 2):
        line_obj.baseline[1] = delta - (line_obj.bbox.bottom - poly_line["bl"][1])
    else:
        line_obj.baseline[1] = (
            -line_height / 3 - (line_obj.bbox.bottom - poly_line["bl"][1]))

    if x_height and x_height > 0:
        line_obj.xHeight = x_height
    if asc_height and asc_height > 0:
        line_obj.ascHeight = asc_height
    return line_obj


def _paragraphs_from_layout(page_obj, layout_blocks, relationship_map,
                            block_map, line_obj_map):
    for layout_block in layout_blocks:
        child_ids = relationship_map.get(layout_block.get("Id"), [])
        par_lines = [
            line_obj_map[cid] for cid in child_ids
            if cid in line_obj_map]
        if not par_lines:
            continue
        par_obj = OcrPar(page_obj, bbox_union([l.bbox for l in par_lines]))
        par_obj.reason = layout_block.get("BlockType") or "LAYOUT_UNKNOWN"
        for l in par_lines:
            l.par = par_obj
        par_obj.lines = par_lines
        page_obj.pars.append(par_obj)

    unassigned = [l for l in page_obj.lines if l.par is None]
    if unassigned:
        par_obj = OcrPar(page_obj, bbox_union([l.bbox for l in unassigned]))
        par_obj.reason = "UNASSIGNED_LINES"
        for l in unassigned:
            l.par = par_obj
        par_obj.lines = unassigned
        page_obj.pars.append(par_obj)
