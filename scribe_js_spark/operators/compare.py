"""Multi-engine OCR comparison / merge — the reference's joins.

All joins here are spatial interval joins on bounding boxes, per page:

- ``compare_ocr_page`` — stats mode of compareOCRPageImp
  (/root/reference/js/worker/compareOCRModule.js:513-1163): nested line
  loop with y-interval skip, word loop with x-interval skip and a
  10%/25% vertical core-trim (visual vs font-box coords), text equality
  after ligature/punct/case normalization; metrics total/correct/
  incorrect/missed/extra/correctLowConf/incorrectHighConf (:1130-1139).
  (The image-based conflict evaluation `evalWords` needs page rendering
  and is out of scope.)
- ``ocr_adds_new_text`` — keep/discard gate
  (/root/reference/js/recognizeConvert.js:32-58).
- ``build_consensus_page`` — N-engine voting
  (/root/reference/js/modifyOCR.js:266-360): assign comparator words to
  the base word they most overlap (>= 0.5), conf 100/80/50 by agreement,
  plurality replacement when >= 2 agree and the base is unmatched.
"""

from __future__ import annotations

import re
import unicodedata

from ..functions.stats import calc_box_overlap, js_round
from ..functions.textnorm import replace_ligatures
from ..model import OcrPage

# ocrAddsNewText thresholds (recognizeConvert.js:17-21)
OCR_NEW_CONF_MIN = 85
OCR_NEW_LINE_WORDS = 3
OCR_NEW_LINES_MIN = 2
OCR_NEW_NUMS_MIN = 10
OCR_NEW_CHARS_MIN = 100

_NON_WORD_RE = re.compile(r"[\W_]")
_PUNCT_BETWEEN_RE = re.compile(r"(^|\D)[\W_]($|\D)")


def _core_box(word):
    """Trim 10% (visual coords) or 25% (font-box coords) from
    top/bottom so edge-grazing boxes don't trigger comparisons
    (compareOCRModule.js:627-676)."""
    b = word.bbox
    h = b.bottom - b.top
    trim = 0.1 if word.visualCoords else 0.25
    return (b.left, b.top + js_round(h * trim),
            b.right, b.bottom - js_round(h * trim))


def compare_ocr_page(page_a: OcrPage, page_b: OcrPage,
                     ignore_punct: bool = False, ignore_cap: bool = False,
                     conf_thresh_high: int = 85,
                     conf_thresh_med: int = 75) -> dict:
    """Stats-mode comparison of candidate page A against ground-truth
    page B. Returns the EvalMetrics dict."""
    a_overlap: set = set()
    b_overlap: set = set()
    b_overlap_a_words: dict[str, list] = {}
    a_correct: set = set()
    b_correct: set = set()

    for line_a in page_a.lines:
        box_a = line_a.bbox
        for line_b in page_b.lines:
            box_b = line_b.bbox
            if box_a.top > box_b.bottom:
                continue
            if box_b.top > box_a.bottom:
                continue
            min_word_b = 0
            for word_a in line_a.words:
                if ignore_punct and not _NON_WORD_RE.sub("", word_a.text):
                    a_correct.add(word_a.id)
                a_l, a_t, a_r, a_b = _core_box(word_a)
                for l in range(min_word_b, len(line_b.words)):
                    word_b = line_b.words[l]
                    b_l, b_t, b_r, b_b = _core_box(word_b)
                    if a_l > b_r:
                        min_word_b += 1
                        continue
                    if b_l > a_r:
                        continue
                    if a_t > b_b or b_t > a_b:
                        continue

                    text_a = replace_ligatures(word_a.text)
                    text_b = replace_ligatures(word_b.text)
                    if ignore_punct:
                        text_a = _PUNCT_BETWEEN_RE.sub(r"\1\2", text_a)
                        text_b = _PUNCT_BETWEEN_RE.sub(r"\1\2", text_b)
                    if ignore_cap:
                        text_a = text_a.lower()
                        text_b = text_b.lower()

                    a_overlap.add(word_a.id)
                    b_overlap.add(word_b.id)
                    b_overlap_a_words.setdefault(word_b.id, []).append(word_a)

                    if text_a == text_b:
                        a_correct.add(word_a.id)
                        b_correct.add(word_b.id)

    a_all = {w.id for line in page_a.lines for w in line.words}
    b_all = {w.id for line in page_b.lines for w in line.words}
    if ignore_punct:
        for line in page_a.lines:
            for w in line.words:
                if not _NON_WORD_RE.sub("", w.text):
                    a_all.discard(w.id)
                    a_overlap.discard(w.id)
                    a_correct.discard(w.id)
        for line in page_b.lines:
            for w in line.words:
                if not _NON_WORD_RE.sub("", w.text):
                    b_all.discard(w.id)
                    b_overlap.discard(w.id)
                    b_correct.discard(w.id)

    correct = len(b_correct)
    incorrect = len(b_overlap) - correct

    correct_low_conf = 0
    incorrect_high_conf = 0
    for word_b_id, words_a in b_overlap_a_words.items():
        low = sum(1 for w in words_a if w.conf <= conf_thresh_med)
        high = sum(1 for w in words_a if w.conf > conf_thresh_high)
        if word_b_id in b_correct and low > 0:
            correct_low_conf += 1
        elif word_b_id not in b_correct and high > 0:
            incorrect_high_conf += 1

    return {
        "total": len(b_all),
        "correct": correct,
        "incorrect": incorrect,
        "missed": len(b_all) - len(b_overlap),
        "extra": len(a_all) - len(a_overlap),
        "correctLowConf": correct_low_conf,
        "incorrectHighConf": incorrect_high_conf,
    }


_DIACRITIC_RE = re.compile("[̀-ͯ]")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]")
_WORDY_RE = re.compile(r"^[a-z]{3,}$")
_VOWEL_RE = re.compile(r"[aeiouy]")
_NUM_RE = re.compile(r"^[0-9]{2,}$")


def _norm_tok(text: str) -> str:
    s = replace_ligatures(text).lower()
    s = unicodedata.normalize("NFKD", s)
    s = _DIACRITIC_RE.sub("", s)
    return _NON_ALNUM_RE.sub("", s)


def ocr_adds_new_text(native_page: OcrPage | None, ocr_page: OcrPage) -> bool:
    """Keep/discard gate (recognizeConvert.js:32-58)."""
    if native_page is None:
        return True
    native_stream = " ".join(
        t for t in (
            _norm_tok(w.text)
            for line in native_page.lines for w in line.words)
        if t)
    new_chars = 0
    new_nums = 0
    new_text_lines = 0
    for line in ocr_page.lines:
        line_new_words = 0
        for word in line.words:
            tok = _norm_tok(word.text)
            if (len(tok) < 2 or word.conf < OCR_NEW_CONF_MIN
                    or tok in native_stream):
                continue
            if _WORDY_RE.match(tok) and _VOWEL_RE.search(tok):
                new_chars += len(tok)
                line_new_words += 1
            elif _NUM_RE.match(tok):
                new_nums += 1
        if line_new_words >= OCR_NEW_LINE_WORDS:
            new_text_lines += 1
    return (new_text_lines >= OCR_NEW_LINES_MIN
            or new_nums >= OCR_NEW_NUMS_MIN
            or new_chars >= OCR_NEW_CHARS_MIN)


def build_consensus_page(base_page: OcrPage, comparator_pages: list,
                         conf_high: int = 100, conf_med: int = 80,
                         conf_low: int = 50, overlap_thresh: float = 0.5,
                         replace_min_agree: int = 2) -> dict:
    """N-engine voting over one page (modifyOCR.js:266-360). Mutates a
    conceptual copy: returns per-word decisions rather than cloning the
    tree (the Spark wrapper materializes the result columns)."""
    base_words = [w for line in base_page.lines for w in line.words]
    stats = {"total": 0, "high": 0, "medium": 0, "low": 0, "replaced": 0}
    decisions = []

    assignments = []
    for comp_page in comparator_pages:
        mapping: dict[str, list] = {}
        if comp_page is not None:
            for line in comp_page.lines:
                for c_word in line.words:
                    best_id = None
                    best_overlap = -1.0
                    for b_word in base_words:
                        o = calc_box_overlap(c_word.bbox, b_word.bbox)
                        if o > best_overlap and o >= overlap_thresh:
                            best_overlap = o
                            best_id = b_word.id
                    if best_id is not None:
                        mapping.setdefault(best_id, []).append(
                            (c_word.bbox.left, c_word.text))
        assignments.append(mapping)

    for b_word in base_words:
        stats["total"] += 1
        present = []
        matches = 0
        for mapping in assignments:
            arr = mapping.get(b_word.id)
            if not arr:
                continue
            text = "".join(t for _, t in sorted(arr, key=lambda x: x[0]))
            present.append(text)
            if text == b_word.text:
                matches += 1

        out_text = b_word.text
        if matches == len(comparator_pages):
            conf = conf_high
            stats["high"] += 1
        elif matches > 0:
            conf = conf_med
            stats["medium"] += 1
        else:
            conf = conf_low
            stats["low"] += 1
            counts: dict[str, int] = {}
            for t in present:
                counts[t] = counts.get(t, 0) + 1
            best_text = None
            best_count = 0
            tie = False
            for t, c in counts.items():
                if c > best_count:
                    best_count = c
                    best_text = t
                    tie = False
                elif c == best_count:
                    tie = True
            if best_text is not None and best_count >= replace_min_agree \
                    and not tie:
                out_text = best_text
                stats["replaced"] += 1
        decisions.append({
            "word_id": b_word.id, "text": out_text,
            "orig_text": b_word.text, "conf": conf,
        })

    return {"decisions": decisions, "stats": stats}
