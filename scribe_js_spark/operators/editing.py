"""Model-editing verbs and small page operators.

Ports of the reference's editing utilities:
- calc_conf (/root/reference/js/utils/ocrUtils.js:11-23)
- split_ocr_word / merge_ocr_words / check_ocr_words_adjacent
  (ocrUtils.js:47-136) — char-metric-backed split points; styleRuns are
  not modeled (uniform-style words), so the style-run bookkeeping arms
  are inert here
- reorder_ocr_page (/root/reference/js/modifyOCR.js:195-237) — layout
  priority boxes reorder/exclude lines by bbox overlap
"""

from __future__ import annotations

from ..functions.stats import calc_box_overlap
from ..model import OcrLine, OcrPage, OcrWord, bbox_union


def calc_conf(pages: list[OcrPage], conf_thresh_high: int = 85) -> dict:
    total = 0
    high = 0
    for page in pages:
        for line in page.lines:
            for w in line.words:
                total += 1
                if w.conf > conf_thresh_high:
                    high += 1
    return {"total": total, "highConf": high}


def split_ocr_word(word: OcrWord, split_index: int) -> tuple[OcrWord, OcrWord]:
    """Split a word at a character index. With valid char metrics the
    bboxes come from char unions; otherwise the split point is
    estimated proportionally (the reference estimates via font advance
    widths; a proportional estimate is the metric-free equivalent)."""
    word_a = word.clone()
    word_b = word.clone()

    valid_chars = (word.chars is not None
                   and "".join(c.text for c in word.chars) == word.text)
    if word_a.chars and word_b.chars:
        word_a.chars = word_a.chars[:split_index]
        word_b.chars = word_b.chars[split_index:]
        if valid_chars:
            word_a.bbox = bbox_union([c.bbox for c in word_a.chars])
            word_b.bbox = bbox_union([c.bbox for c in word_b.chars])
    if not valid_chars:
        width = word.bbox.right - word.bbox.left
        frac = split_index / max(len(word.text), 1)
        split_x = word.bbox.left + width * frac
        word_a.bbox.right = split_x
        word_b.bbox.left = split_x

    word_a.text = word.text[:split_index]
    word_b.text = word.text[split_index:]
    word_a.id = f"{word.id}a"
    word_b.id = f"{word.id}b"
    return word_a, word_b


def merge_ocr_words(words: list[OcrWord]) -> OcrWord:
    words = sorted(words, key=lambda w: w.bbox.left)
    merged = words[0].clone()
    merged.bbox.right = words[-1].bbox.right
    merged.text = "".join(w.text for w in words)
    if merged.chars is not None:
        merged.chars = [
            c for w in words for c in (w.chars or [])]
    return merged


def check_ocr_words_adjacent(words: list[OcrWord]) -> bool:
    """True when the words are consecutive within their line
    (ocrUtils.js:128-136)."""
    if not words:
        return False
    sorted_words = sorted(words, key=lambda w: w.bbox.left)
    line_words = sorted(words[0].line.words, key=lambda w: w.bbox.left)
    ids = [w.id for w in line_words]
    try:
        first = ids.index(sorted_words[0].id)
        last = ids.index(sorted_words[-1].id)
    except ValueError:
        return False
    return last - first == len(sorted_words) - 1


def reorder_ocr_page(page: OcrPage, layout_boxes: dict,
                     apply_exclude: bool = True) -> OcrPage:
    """Reorder/exclude lines by layout-region priority boxes
    (overlap > 0.5). ``layout_boxes``: id -> {coords: Bbox,
    type: 'order'|'exclude', order: int 0-99}. Returns the page with
    ``lines`` reordered (mutates in place, reference clones)."""
    if not layout_boxes:
        return page
    order = [100] * len(page.lines)
    for i, line in enumerate(page.lines):
        for obj in layout_boxes.values():
            if calc_box_overlap(line.bbox, obj["coords"]) > 0.5:
                if obj.get("type") == "order":
                    order[i] = obj.get("order", 100)
                elif obj.get("type") == "exclude" and apply_exclude:
                    order[i] = 101
    new_lines = []
    for priority in range(101):
        for i, o in enumerate(order):
            if o == priority:
                new_lines.append(page.lines[i])
    page.lines = new_lines
    return page
