"""Plain-text -> OCR model converter.

Semantics of /root/reference/js/import/convertPageText.js: each
non-empty input line becomes one paragraph, word-wrapped into synthetic
lines on a letter-size page (612x792) with 20px horizontal margins,
14pt type and 14.4px line pitch; blank lines advance the cursor; the
page breaks when the cursor passes the bottom margin.

The reference measures words with real Times New Roman metrics
(convertPageText.js:36-55, via opentype). Geometry here only drives
word wrapping — reflowed-text output is invariant to wrap points since
lines of a paragraph re-join with spaces — so this port uses a
deterministic fixed-advance table (0.5em per char) instead of shipping
a font file. Coordinates are therefore *consistent* but not identical
to the reference's; text output is identical.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round
from ..model import Bbox, OcrLine, OcrPage, OcrPar, OcrWord

FONT_FAMILY = "Times New Roman"
FONT_SIZE = 14
LINE_HEIGHT = 14.4
MARGIN_VERTICAL = 30
MARGIN_HORIZONTAL = 20
# Fixed-advance stand-in for font metrics (see module docstring).
CHAR_ADVANCE_EM = 0.5
ASCENDER_RATIO = 0.891  # Times New Roman ascender/unitsPerEm (public AFM)
DESCENDER_RATIO = 0.216


def _text_width(text: str, size: float) -> float:
    return len(text) * size * CHAR_ADVANCE_EM


def _split_tokens(line: str):
    """Split into alternating word/whitespace tokens
    (convertPageText.js:61-88)."""
    tokens = []
    current = ""
    in_ws = False
    for ch in line:
        ch_ws = bool(re.match(r"\s", ch))
        if ch_ws != in_ws:
            if current:
                tokens.append((current, in_ws))
                current = ""
            in_ws = ch_ws
        current += ch
    if current:
        tokens.append((current, in_ws))
    return tokens


def convert_doc_text(text_str: str, page_dims: dict | None = None) -> list[OcrPage]:
    page_index = 0
    asc_h = ASCENDER_RATIO * FONT_SIZE
    desc_h = DESCENDER_RATIO * FONT_SIZE

    lines = re.split(r"\r?\n", text_str)
    if page_dims is None:
        page_dims = {"width": 612, "height": 792}

    page_obj = OcrPage(page_index, page_dims)
    page_obj.textSource = "text"
    pages = [page_obj]

    if not lines or all(not l.strip() for l in lines):
        return pages

    available_width = page_dims["width"] - MARGIN_HORIZONTAL * 2
    current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    def new_page():
        nonlocal page_index, page_obj, current_y
        page_index += 1
        page_obj = OcrPage(page_index, page_dims)
        page_obj.textSource = "text"
        pages.append(page_obj)
        current_y = MARGIN_VERTICAL + LINE_HEIGHT / 2

    def flush_par(par_lines, par_right):
        if not par_lines:
            return
        par_bbox = Bbox(
            MARGIN_HORIZONTAL, par_lines[0].bbox.top,
            par_right, par_lines[-1].bbox.bottom)
        par_obj = OcrPar(page_obj, par_bbox)
        par_obj.lines = list(par_lines)
        for ln in par_lines:
            ln.par = par_obj
        page_obj.pars.append(par_obj)

    for line_text in lines:
        if not line_text.strip():
            current_y += LINE_HEIGHT
            if current_y + FONT_SIZE > page_dims["height"] - MARGIN_VERTICAL:
                new_page()
            continue

        tokens = _split_tokens(line_text)
        par_lines: list[OcrLine] = []
        par_right = MARGIN_HORIZONTAL

        idx = 0
        while idx < len(tokens):
            if current_y + FONT_SIZE > page_dims["height"] - MARGIN_VERTICAL:
                flush_par(par_lines, par_right)
                par_lines = []
                par_right = MARGIN_HORIZONTAL
                new_page()

            baseline = [0, desc_h]
            line_top = js_round(current_y - asc_h)
            line_bottom = js_round(current_y + desc_h)
            current_x = float(MARGIN_HORIZONTAL)
            width_so_far = 0.0
            line_obj = OcrLine(
                page_obj,
                Bbox(MARGIN_HORIZONTAL, line_top, MARGIN_HORIZONTAL, line_bottom),
                baseline, asc_h, None)

            last_consumed = idx
            for j in range(idx, len(tokens)):
                tok_text, tok_ws = tokens[j]
                tok_width = _text_width(tok_text, FONT_SIZE)
                if tok_ws:
                    if not line_obj.words and width_so_far + tok_width > available_width:
                        break
                    current_x += tok_width
                    width_so_far += tok_width
                    last_consumed = j + 1
                else:
                    if line_obj.words and width_so_far + tok_width > available_width:
                        break
                    word_bbox = Bbox(
                        js_round(current_x), line_top,
                        js_round(current_x + tok_width), line_bottom)
                    wid = (f"word_{page_index + 1}_{len(page_obj.lines) + 1}"
                           f"_{len(line_obj.words) + 1}")
                    word_obj = OcrWord(line_obj, wid, tok_text, word_bbox)
                    word_obj.conf = 100
                    word_obj.style.font = FONT_FAMILY
                    line_obj.words.append(word_obj)
                    current_x += tok_width
                    width_so_far += tok_width
                    last_consumed = j + 1

            if not line_obj.words:
                tok_text, tok_ws = tokens[idx]
                if not tok_ws:
                    tok_width = _text_width(tok_text, FONT_SIZE)
                    word_bbox = Bbox(
                        js_round(current_x), line_top,
                        js_round(current_x + tok_width), line_bottom)
                    wid = (f"word_{page_index + 1}_{len(page_obj.lines) + 1}"
                           f"_{len(line_obj.words) + 1}")
                    word_obj = OcrWord(line_obj, wid, tok_text, word_bbox)
                    word_obj.conf = 100
                    word_obj.style.font = FONT_FAMILY
                    line_obj.words.append(word_obj)
                    current_x += tok_width
                    last_consumed = idx + 1
                else:
                    break

            if line_obj.words:
                line_obj.bbox = Bbox(
                    line_obj.words[0].bbox.left, line_top,
                    js_round(current_x), line_bottom)
                page_obj.lines.append(line_obj)
                par_lines.append(line_obj)
                par_right = max(par_right, line_obj.bbox.right)
                current_y += LINE_HEIGHT
                idx = last_consumed

        flush_par(par_lines, par_right)

    return pages
