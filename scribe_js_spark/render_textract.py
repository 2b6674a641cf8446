"""AWS Textract JSON renderer for the fixture layout model.

Emits the block structure convert_doc_textract consumes (and
detectOcrFormat sniffs via "DetectDocumentTextModelVersion",
importOCR.js:45): PAGE blocks with polygons, LAYOUT_TEXT blocks per
paragraph (CHILD -> LINE ids), LINE blocks (CHILD -> WORD ids), WORD
blocks with normalized geometry and Confidence.
"""

from __future__ import annotations

import json

from .fixtures import DESC_H


def _norm_box(l, t, r, b, w, h):
    return {
        "Left": l / w, "Top": t / h,
        "Width": (r - l) / w, "Height": (b - t) / h,
    }


def _norm_poly(l, t, r, b, w, h):
    return [
        {"X": l / w, "Y": t / h}, {"X": r / w, "Y": t / h},
        {"X": r / w, "Y": b / h}, {"X": l / w, "Y": b / h},
    ]


def _word_band(word, baseline_y):
    """Char-class-aware vertical extent (same scheme as the ABBYY and
    char-level hOCR renderers)."""
    text = word["text"]
    top = word["top"] if any(
        c not in "acemnorsuvwxzgjpqy" for c in text) else baseline_y - 19
    bottom = baseline_y + DESC_H if any(c in "gjpqy" for c in text) \
        else baseline_y
    return top, bottom


def render_textract(model: dict) -> str:
    blocks = []
    blocks_meta = {"DetectDocumentTextModelVersion": "1.0"}
    next_id = [0]

    def bid() -> str:
        next_id[0] += 1
        return f"blk-{next_id[0]:06d}"

    for page_n, page in enumerate(model["pages"]):
        w, h = page["width"], page["height"]
        page_id = bid()
        page_block = {
            "BlockType": "PAGE", "Id": page_id, "Page": page_n + 1,
            "Geometry": {
                "BoundingBox": _norm_box(0, 0, w, h, w, h),
                "Polygon": _norm_poly(0, 0, w, h, w, h),
            },
            "Relationships": [{"Type": "CHILD", "Ids": []}],
        }
        blocks.append(page_block)
        for par in page["pars"]:
            layout_id = bid()
            layout_block = {
                "BlockType": "LAYOUT_TEXT", "Id": layout_id,
                "Page": page_n + 1,
                "Geometry": {"BoundingBox": _norm_box(
                    min(wd["left"] for ln in par["lines"] for wd in ln["words"]),
                    min(wd["top"] for ln in par["lines"] for wd in ln["words"]),
                    max(wd["right"] for ln in par["lines"] for wd in ln["words"]),
                    max(wd["bottom"] for ln in par["lines"] for wd in ln["words"]),
                    w, h)},
                "Relationships": [{"Type": "CHILD", "Ids": []}],
            }
            blocks.append(layout_block)
            for line in par["lines"]:
                y = line["baseline_y"]
                line_id = bid()
                bands = [_word_band(wd, y) for wd in line["words"]]
                lt = min(b[0] for b in bands)
                lb = max(b[1] for b in bands)
                ll = min(wd["left"] for wd in line["words"])
                lr = max(wd["right"] for wd in line["words"])
                line_block = {
                    "BlockType": "LINE", "Id": line_id, "Page": page_n + 1,
                    "Text": " ".join(wd["text"] for wd in line["words"]),
                    "Geometry": {
                        "BoundingBox": _norm_box(ll, lt, lr, lb, w, h),
                        "Polygon": _norm_poly(ll, lt, lr, lb, w, h),
                    },
                    "Relationships": [{"Type": "CHILD", "Ids": []}],
                }
                blocks.append(line_block)
                layout_block["Relationships"][0]["Ids"].append(line_id)
                page_block["Relationships"][0]["Ids"].append(line_id)
                for wd, (wt, wb) in zip(line["words"], bands):
                    word_id = bid()
                    blocks.append({
                        "BlockType": "WORD", "Id": word_id,
                        "Page": page_n + 1,
                        "Text": wd["text"],
                        "Confidence": wd["conf"],
                        "Geometry": {
                            "BoundingBox": _norm_box(
                                wd["left"], wt, wd["right"], wb, w, h),
                            "Polygon": _norm_poly(
                                wd["left"], wt, wd["right"], wb, w, h),
                        },
                    })
                    line_block["Relationships"][0]["Ids"].append(word_id)

    return json.dumps({**blocks_meta, "Blocks": blocks})
