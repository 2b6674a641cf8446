"""Google Vision JSON renderer for the fixture layout model.

Emits the ``responses[]`` shape (one response per page, sorted by
context.pageNumber — importOCR.js:126-133) with
``fullTextAnnotation.pages[0].blocks[].paragraphs[].words[].symbols``,
vertex boxes and detectedBreak LINE_BREAK markers at line ends.
"""

from __future__ import annotations

import json

from .fixtures import DESC_H


def _verts(l, t, r, b):
    return {"vertices": [
        {"x": l, "y": t}, {"x": r, "y": t},
        {"x": r, "y": b}, {"x": l, "y": b}]}


def _word_band(word, baseline_y):
    text = word["text"]
    top = word["top"] if any(
        c not in "acemnorsuvwxzgjpqy" for c in text) else baseline_y - 19
    bottom = baseline_y + DESC_H if any(c in "gjpqy" for c in text) \
        else baseline_y
    return top, bottom


def render_google_vision(model: dict) -> str:
    responses = []
    for page_n, page in enumerate(model["pages"]):
        blocks = []
        for par in page["pars"]:
            all_words = [w for ln in par["lines"] for w in ln["words"]]
            par_box = _verts(
                min(w["left"] for w in all_words),
                min(w["top"] for w in all_words),
                max(w["right"] for w in all_words),
                max(w["bottom"] for w in all_words))
            words_out = []
            for line in par["lines"]:
                y = line["baseline_y"]
                for w_i, w in enumerate(line["words"]):
                    wt, wb = _word_band(w, y)
                    symbols = []
                    x = w["left"]
                    cw = (w["right"] - w["left"]) / max(len(w["text"]), 1)
                    for c_i, ch in enumerate(w["text"]):
                        sym = {
                            "text": ch,
                            "boundingBox": _verts(
                                round(x), wt, round(x + cw), wb),
                        }
                        if (c_i == len(w["text"]) - 1
                                and w_i == len(line["words"]) - 1):
                            sym["property"] = {
                                "detectedBreak": {"type": "LINE_BREAK"}}
                        symbols.append(sym)
                        x += cw
                    words_out.append({
                        "boundingBox": _verts(w["left"], wt, w["right"], wb),
                        "symbols": symbols,
                        "confidence": w["conf"] / 100.0,
                    })
            blocks.append({
                "blockType": "TEXT",
                "paragraphs": [{
                    "boundingBox": par_box, "words": words_out}],
            })
        responses.append({
            "context": {"pageNumber": page_n + 1},
            "fullTextAnnotation": {
                "text": "", "pages": [{
                    "width": page["width"], "height": page["height"],
                    "blocks": blocks}],
            },
        })
    return json.dumps({"responses": responses})
