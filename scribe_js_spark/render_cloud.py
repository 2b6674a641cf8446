"""Google Document AI and Azure Document Intelligence renderers for the
fixture layout model (detected via importOCR.js:53-63 key signatures).
"""

from __future__ import annotations

import json

from .fixtures import ASC_H, DESC_H


def render_google_docai(model: dict) -> str:
    pages_out = []
    full_text_parts: list[str] = []
    offset = 0
    for page in model["pages"]:
        tokens = []
        lines = []
        paragraphs = []
        for par in page["pars"]:
            par_start = offset
            for line in par["lines"]:
                y = line["baseline_y"]
                line_start = offset
                for w_i, w in enumerate(line["words"]):
                    text = w["text"]
                    sep = " " if w_i < len(line["words"]) - 1 else "\n"
                    start = offset
                    full_text_parts.append(text + sep)
                    offset += len(text) + len(sep)
                    tokens.append({
                        "layout": {
                            "textAnchor": {"textSegments": [{
                                "startIndex": str(start),
                                "endIndex": str(offset)}]},
                            "confidence": w["conf"] / 100.0,
                            "boundingPoly": {"vertices": [
                                {"x": w["left"], "y": y - ASC_H},
                                {"x": w["right"], "y": y - ASC_H},
                                {"x": w["right"], "y": y + DESC_H},
                                {"x": w["left"], "y": y + DESC_H}]},
                        },
                    })
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                lines.append({
                    "layout": {
                        "textAnchor": {"textSegments": [{
                            "startIndex": str(line_start),
                            "endIndex": str(offset)}]},
                        "boundingPoly": {"vertices": [
                            {"x": l, "y": y - ASC_H},
                            {"x": r, "y": y - ASC_H},
                            {"x": r, "y": y + DESC_H},
                            {"x": l, "y": y + DESC_H}]},
                    },
                })
            paragraphs.append({
                "layout": {"textAnchor": {"textSegments": [{
                    "startIndex": str(par_start),
                    "endIndex": str(offset)}]}},
            })
        pages_out.append({
            "dimension": {"width": page["width"], "height": page["height"],
                          "unit": "pixels"},
            "tokens": tokens, "lines": lines, "paragraphs": paragraphs,
        })
    return json.dumps({"text": "".join(full_text_parts), "pages": pages_out})


def render_azure_docintel(model: dict) -> str:
    pages_out = []
    for page in model["pages"]:
        words_out = []
        lines_out = []
        offset = 0
        for par in page["pars"]:
            for line in par["lines"]:
                y = line["baseline_y"]
                line_offset = offset
                for w_i, w in enumerate(line["words"]):
                    text = w["text"]
                    words_out.append({
                        "content": text,
                        "confidence": w["conf"] / 100.0,
                        "span": {"offset": offset, "length": len(text)},
                        "polygon": [
                            w["left"], y - ASC_H, w["right"], y - ASC_H,
                            w["right"], y + DESC_H, w["left"], y + DESC_H],
                    })
                    offset += len(text) + 1
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                lines_out.append({
                    "spans": [{"offset": line_offset,
                               "length": offset - line_offset - 1}],
                    "polygon": [l, y - ASC_H, r, y - ASC_H,
                                r, y + DESC_H, l, y + DESC_H],
                })
        pages_out.append({
            "pageNumber": len(pages_out) + 1,
            "unit": "pixel", "angle": 0,
            "width": page["width"], "height": page["height"],
            "words": words_out, "lines": lines_out,
        })
    tables_out = []
    for n, page in enumerate(model["pages"]):
        for tbl in page.get("azure_tables", []):
            cells = []
            for cell in tbl["cells"]:
                l, t, r, b = cell["box"]
                cells.append({
                    "rowIndex": cell["row"],
                    "columnIndex": cell["col"],
                    **({"columnSpan": cell["span"]}
                       if cell.get("span") else {}),
                    "content": cell.get("content", ""),
                    "boundingRegions": [{
                        "pageNumber": n + 1,
                        "polygon": [l, t, r, t, r, b, l, b]}],
                })
            ls = min(c["box"][0] for c in tbl["cells"])
            ts = min(c["box"][1] for c in tbl["cells"])
            rs = max(c["box"][2] for c in tbl["cells"])
            bs = max(c["box"][3] for c in tbl["cells"])
            tables_out.append({
                "rowCount": tbl["row_count"],
                "columnCount": tbl["col_count"],
                "boundingRegions": [{
                    "pageNumber": n + 1,
                    "polygon": [ls, ts, rs, ts, rs, bs, ls, bs]}],
                "cells": cells,
            })
    return json.dumps({
        "createdDateTime": "2026-01-01T00:00:00Z",
        "modelId": "prebuilt-read",
        "analyzeResult": {"apiVersion": "2023-07-31", "pages": pages_out,
                          **({"tables": tables_out} if tables_out else {})},
    })
