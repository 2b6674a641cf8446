"""Layer-merge operator: insert words/lines from a new page into an
existing page (the reference's combineOCRPage,
/root/reference/js/modifyOCR.js:15-188):

- a new line joins the existing line whose y-overlap >= 0.5 with the
  best x-overlap (or nearest x when no candidate has x-overlap);
- the match is rejected as cross-column when the x gap exceeds both 2x
  the nearest vertical gap and 5% of the page width (:104);
- matched words insert at the correct x position within the line, and
  new ids get a deterministic suffix (the reference appends random
  alphanumerics; we append positional suffixes for replay determinism);
- unmatched lines insert next to the closest line by the weighted
  x + 3*y distance metric;
- short matched lines (<300px) take the page-median baseline slope.

Plus build_combined_pages: the per-page OCR-vs-native chooser around
the ocrAddsNewText gate (recognizeConvert.js buildCombinedLayer).
"""

from __future__ import annotations

import math

from ..model import OcrPage, update_line_bbox
from .compare import ocr_adds_new_text


def combine_ocr_page(page_a: OcrPage, page_b: OcrPage,
                     edit_word_ids: bool = True) -> None:
    """Merge page_a's lines into page_b (mutates page_b)."""
    for line_new in page_a.lines:
        if not line_new.words:
            continue

        match = None
        match_x_overlap = 0.0
        match_x_dist = 1e6
        closest_i = 0
        closest_metric = 1e6
        after_closest = True
        y_dist_min = 1e6

        nb = line_new.bbox
        for line_i, line in enumerate(page_b.lines):
            if not line.words or line.orientation != 0:
                continue
            lb = line.bbox
            left = max(lb.left, nb.left)
            top = max(lb.top, nb.top)
            right = min(lb.right, nb.right)
            bottom = min(lb.bottom, nb.bottom)
            width = right - left
            height = bottom - top
            y_overlap = 0 if height < 0 else height / (nb.bottom - nb.top)

            if y_overlap >= 0.5:
                x_overlap = 0 if width < 0 else width / (nb.right - nb.left)
                if x_overlap > match_x_overlap:
                    match_x_overlap = x_overlap
                    match = line
                elif x_overlap == 0 and match_x_overlap == 0:
                    x_dist = min(abs(lb.right - nb.left), abs(lb.left - nb.right))
                    if x_dist < match_x_dist:
                        match_x_dist = x_dist
                        match = line
            elif match is None:
                x_overlap = 0 if width < 0 else width / (nb.right - nb.left)
                x_dist = 0 if x_overlap > 0 else min(
                    abs(lb.right - nb.left), abs(lb.left - nb.right))
                y_dist = 0 if y_overlap > 0 else min(
                    abs(lb.bottom - nb.top), abs(lb.top - nb.bottom))
                if y_dist < y_dist_min:
                    y_dist_min = y_dist
                total = x_dist + y_dist * 3
                if total < closest_metric:
                    closest_metric = total
                    closest_i = line_i
                    after_closest = nb.bottom > lb.bottom

        # Cross-column rejection (:104).
        if (match is not None and match_x_overlap == 0
                and match_x_dist > 2 * y_dist_min
                and page_b.dims["width"] * 0.05 < match_x_dist):
            match = None

        if match is not None:
            words = match.words
            for j, word_new in enumerate(line_new.words):
                word_new.line = match
                k = 0
                word_index = 0
                while True:
                    word_index = k
                    word = words[k]
                    k += 1
                    if not (word.bbox.right < word_new.bbox.left
                            and k < len(words)):
                        break
                if edit_word_ids:
                    word_new.id = f"{word.id}_m{j + 1}"
                if word_new.bbox.left > word.bbox.left:
                    words.insert(word_index + 1, word_new)
                else:
                    words.insert(word_index, word_new)
            if match.bbox.right - match.bbox.left < 300:
                match.baseline[0] = math.tan(page_b.angle * math.pi / 180)
            update_line_bbox(match)
        else:
            if edit_word_ids:
                for j, word_new in enumerate(line_new.words):
                    word_new.id = f"{word_new.id}_m{j + 1}"
            line_new.page = page_b
            insert_at = closest_i + 1 if after_closest else closest_i
            page_b.lines.insert(insert_at, line_new)


def build_combined_pages(native_pages: list, ocr_pages: list,
                         ocr_page_mask: list | None = None,
                         gate_applies: bool = True) -> list[dict]:
    """Per-page OCR-vs-native chooser (buildCombinedLayer,
    recognizeConvert.js:72-100): keep the OCR page unless the gate
    finds it adds nothing the native layer lacks. Returns one decision
    record per page: {page_n, chosen: 'ocr'|'native', keep_ocr}."""
    n = max(len(native_pages), len(ocr_pages))
    out = []
    for i in range(n):
        nat = native_pages[i] if i < len(native_pages) else None
        ocr_page = ocr_pages[i] if i < len(ocr_pages) else None
        masked = ocr_page_mask[i] if ocr_page_mask else True
        if masked and ocr_page is not None:
            keep_ocr = not (gate_applies and nat is not None
                            and not ocr_adds_new_text(nat, ocr_page))
            chosen = "ocr" if keep_ocr else "native"
        else:
            keep_ocr = False
            chosen = "native" if nat is not None else "ocr"
        out.append({"page_n": i, "chosen": chosen, "keep_ocr": keep_ocr})
    return out
