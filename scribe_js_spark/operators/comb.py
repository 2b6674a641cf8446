"""Comb-mode multi-engine merge (the 'Tesseract Combined' flow).

Reimplements the ``mode === 'comb'`` branch of compareOCRPageImp
(/root/reference/js/worker/compareOCRModule.js:513-1050):

- per-line interval scan with word core-trim, identical to stats mode;
- 1-to-1 detection by box-edge sum, with the Legacy/LSTM split-bug
  counter-checks against the next 1-3 B words (:719-742);
- 2-/3-/4-to-1 box-sum matching in both directions (:744-800);
- Legacy -> LSTM char grafting when one Legacy word matches multiple
  LSTM words letter-for-letter: the LSTM words inherit bounding boxes
  sliced from the Legacy char boxes (:801-837);
- ``rejectWordLegacy`` (:407-421) and ``penalizeWord`` (:430-486)
  text heuristics; the final glyph-metric branch of penalizeWord needs
  opentype font metrics (rendering stack) and is out of scope;
- the replacement rules: text/style transfer, char erasure, id 'b'
  suffixing, the eg/ie skip list, and the majority-line asc/x-height
  adoption (:950-1040).

The image-based ``evalWords`` visual metric (:203-397) runs when the
caller supplies a binary ``page_image`` (see operators/evalwords.py —
both conflict sides are rendered at the word geometry and scored
against the scan, and the Legacy textAlt rescue :885-899 can fire).
Without an image both error metrics keep the reference's no-signal
value 1.0 and all decisions flow through the deterministic text
rules: rejectWordLegacy, textAlt agreement, word count/letter
penalties, and the documented LSTM-prior fallback
(`legacyLSTMComb && hocrAError > 0.5` -> LSTM wins conflicts, which is
the reference's stated behavior when the Legacy word cannot be
visually confirmed).
"""

from __future__ import annotations

import copy
import re

from ..functions.stats import js_round
from ..functions.textnorm import replace_ligatures
from ..model import Bbox, OcrPage

_NUM_BETWEEN_RE = re.compile(r"[a-z]\d[a-z]", re.I)
_II_BETWEEN_RE = re.compile(r"[a-hj-z]ii[a-hj-z]", re.I)
_NON_NUM_PCT_RE = re.compile(r"[^0-9]%")
_II_RE = re.compile(r"ii")
_SINGLE_M_RE = re.compile(r"^m$")
_BRACKET_START_RE = re.compile(r"^\].")
_LETTER_RE = re.compile(r"[a-z]", re.I)
_NON_WORD_RE = re.compile(r"\W")

#: evalWords visual metric is unavailable without rendering; 1.0 is the
#: reference's "no overlap signal" value.
EVAL_UNAVAILABLE = 1.0


def reject_word_legacy(legacy_text: str, lstm_text: str) -> bool:
    """Patterns so implausible in Tesseract Legacy output they are
    auto-rejected (compareOCRModule.js:407-421)."""
    replace_num = bool(_NUM_BETWEEN_RE.search(legacy_text)) and not \
        _NUM_BETWEEN_RE.search(lstm_text)
    replace_ii = bool(_II_BETWEEN_RE.search(legacy_text)) and not \
        _II_BETWEEN_RE.search(lstm_text)
    return replace_num or replace_ii


def penalize_word(word_objs: list) -> float:
    """Ad-hoc language-plausibility penalty (compareOCRModule.js:430-486).
    The final noise-character branch (two-letter word whose glyph widths
    overlap implausibly) needs opentype glyph metrics and is omitted."""
    word_str = "".join(w.text for w in word_objs)
    penalty = 0.0
    if _NON_NUM_PCT_RE.search(word_str):
        penalty += 0.05
    if _II_RE.search(word_str):
        penalty += 0.05
    if _SINGLE_M_RE.match(word_str):
        penalty += 0.05
    if _NUM_BETWEEN_RE.search(word_str):
        penalty += 0.05
    if _BRACKET_START_RE.match(word_str):
        penalty += 0.05
    return penalty


def _core_box(word):
    b = word.bbox
    h = b.bottom - b.top
    trim = 0.1 if word.visualCoords else 0.25
    return (b.left, b.top + js_round(h * trim),
            b.right, b.bottom - js_round(h * trim))


def _box_sum_match(left_ref, left_cand, right_ref, right_cand, span):
    """|dl| + |dr| < span * 0.1 — the reference's box-edge-sum test."""
    return abs(left_cand - left_ref) + abs(right_cand - right_ref) \
        < span * 0.1


def _union_bbox(boxes) -> Bbox:
    return Bbox(min(b.left for b in boxes), min(b.top for b in boxes),
                max(b.right for b in boxes), max(b.bottom for b in boxes))


def _graft_legacy_chars(words_a_arr, words_b_arr):
    """Legacy -> LSTM char graft (compareOCRModule.js:801-837): when one
    Legacy word with char boxes corresponds to 2-4 LSTM words with the
    same total letter count, slice the Legacy chars across the LSTM
    words and rebuild each LSTM bbox from its char slice."""
    words_a_text = "".join(w.text for w in words_a_arr)
    words_b_text = "".join(w.text for w in words_b_arr)
    a0 = words_a_arr[0]
    if not (len(words_a_arr) == 1 and a0.chars
            and len(a0.chars) == len(words_a_text)
            and len(words_a_text) == len(words_b_text)):
        return words_b_arr
    match = words_a_text == words_b_text
    b0_len = len(words_b_arr[0].text)
    b1_len = len(words_b_arr[1].text)
    match1 = a0.text[:b0_len] == words_b_arr[0].text
    match2 = a0.text[b0_len:b0_len + b1_len] == words_b_arr[1].text
    if not (match or (len(words_b_arr) == 2 and (match1 or match2))):
        return words_b_arr
    out = [w.clone() for w in words_b_arr]
    offset = 0
    for w in out:
        n = len(w.text)
        w.chars = [type(c)(c.text, c.bbox.copy())
                   for c in a0.chars[offset:offset + n]]
        offset += n
    if not match:
        for w in out:
            for i, c in enumerate(w.chars):
                c.text = w.text[i]
    for w in out:
        if w.chars:
            w.bbox = _union_bbox([c.bbox for c in w.chars])
    return out


def comb_merge_page(page_a: OcrPage, page_b: OcrPage, *,
                    legacy_lstm_comb: bool = False,
                    eval_conflicts: bool = True,
                    use_bbox_b: bool = False,
                    page_image=None) -> OcrPage:
    """Merge page B (e.g. Tesseract LSTM) into a clone of page A (e.g.
    Tesseract Legacy), following compareOCRPageImp comb mode. Returns
    the merged page; inputs are not mutated.

    ``page_image`` (uint8 numpy bitmap, 255 = paper) enables the
    image-based evalWords metric (compareOCRModule.js:203) for
    conflicts: each side's text is rendered at the word geometry and
    scored against the scan crop, and the Legacy textAlt rescue
    (:885-899) runs when both primary readings score > 0.5. Without an
    image both error metrics keep the no-signal value 1.0 and the
    documented LSTM-prior fallback decides."""
    page = copy.deepcopy(page_a)
    for line in page.lines:
        for w in line.words:
            w.conf = 0.0

    for line_a in page.lines:
        line_words_edited = 0
        line_b_replace = None
        for line_b in page_b.lines:
            if line_a.bbox.top > line_b.bbox.bottom:
                continue
            if line_b.bbox.top > line_a.bbox.bottom:
                continue
            min_word_b = 0
            k = -1
            while k + 1 < len(line_a.words):
                k += 1
                word_a = line_a.words[k]
                a_l, a_t, a_r, a_b = _core_box(word_a)
                l = min_word_b - 1
                while l + 1 < len(line_b.words):
                    l += 1
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
                    if text_a == text_b:
                        word_a.conf = 100.0
                        if use_bbox_b:
                            word_a.bbox = word_b.bbox.copy()
                            word_a.visualCoords = True
                            word_a.chars = (
                                [type(c)(c.text, c.bbox.copy())
                                 for c in word_b.chars]
                                if word_b.chars else None)
                        continue

                    word_a.conf = 0.0
                    box_a, box_b = word_a.bbox, word_b.bbox
                    one_to_one = _box_sum_match(
                        box_a.left, box_b.left, box_a.right, box_b.right,
                        box_a.right - box_a.left)

                    word_b_next = line_b.words[l + 1] \
                        if l + 1 < len(line_b.words) else None
                    word_b_next2 = line_b.words[l + 2] \
                        if l + 2 < len(line_b.words) else None
                    word_b_next3 = line_b.words[l + 3] \
                        if l + 3 < len(line_b.words) else None
                    # LSTM split-bug counter-checks (:719-742)
                    if one_to_one and legacy_lstm_comb:
                        for nxt in (word_b_next3, word_b_next2, word_b_next):
                            if nxt and len(nxt.text) > 2 and _box_sum_match(
                                    box_a.left, box_b.left,
                                    box_a.right, nxt.bbox.right,
                                    nxt.bbox.right - box_a.left):
                                one_to_one = False

                    two_to_one = False
                    words_a_arr: list = []
                    words_b_arr: list = []
                    if not one_to_one:
                        if box_a.right < box_b.right:
                            word_a_next = line_a.words[k + 1] \
                                if k + 1 < len(line_a.words) else None
                            if word_a_next and _box_sum_match(
                                    box_b.left, box_a.left, box_b.right,
                                    word_a_next.bbox.right,
                                    word_a_next.bbox.right - box_a.left):
                                two_to_one = True
                                words_a_arr = [word_a, word_a_next]
                                words_b_arr = [word_b]
                                word_a_next.conf = 0.0
                        else:
                            for tail, nexts in (
                                (word_b_next3,
                                 [word_b_next, word_b_next2, word_b_next3]),
                                (word_b_next2, [word_b_next, word_b_next2]),
                                (word_b_next, [word_b_next]),
                            ):
                                if two_to_one or not tail:
                                    continue
                                if _box_sum_match(
                                        box_a.left, box_b.left, box_a.right,
                                        tail.bbox.right,
                                        tail.bbox.right - box_a.left):
                                    two_to_one = True
                                    words_a_arr = [word_a]
                                    words_b_arr = [word_b] + nexts
                            if two_to_one and legacy_lstm_comb:
                                words_b_arr = _graft_legacy_chars(
                                    words_a_arr, words_b_arr)

                    if not one_to_one and not two_to_one:
                        continue

                    a_err = 1.0
                    b_err = 1.0
                    a_alt_err = 1.0
                    if not eval_conflicts:
                        b_err = 0.0
                    elif one_to_one:
                        if legacy_lstm_comb and reject_word_legacy(
                                word_a.text, word_b.text):
                            b_err = 0.0
                        elif legacy_lstm_comb and word_a.textAlt \
                                and word_a.textAlt == word_b.text:
                            b_err = 0.0
                        else:
                            if page_image is not None:
                                from .evalwords import eval_words

                                clone = word_a.clone()
                                clone.text = word_b.text
                                m_a, m_b = eval_words(
                                    [word_a], [clone], page_image)
                            else:
                                m_a = m_b = EVAL_UNAVAILABLE
                            a_err = m_a + penalize_word([word_a])
                            b_err = m_b + penalize_word([word_b])
                            if legacy_lstm_comb and reject_word_legacy(
                                    word_a.text, word_b.text):
                                b_err = 0.0
                            # textAlt rescue (:885-899): when both
                            # primary readings fail visually, try the
                            # raw Legacy classifier choice; it must
                            # score < 0.5 AND beat both by >= 0.1
                            if page_image is not None \
                                    and legacy_lstm_comb \
                                    and a_err > 0.5 and b_err > 0.5 \
                                    and word_a.textAlt \
                                    and word_a.textAlt != word_b.text:
                                from .evalwords import eval_words

                                alt = word_a.clone()
                                alt.text = word_a.textAlt
                                m_alt, _ = eval_words(
                                    [alt], [], page_image)
                                a_alt_err = m_alt + penalize_word([alt])
                                if a_alt_err >= 0.5 \
                                        or (a_err - a_alt_err) < 0.1 \
                                        or (b_err - a_alt_err) < 0.1:
                                    a_alt_err = 1.0
                    else:
                        words_a_text = "".join(w.text for w in words_a_arr)
                        words_b_text = "".join(w.text for w in words_b_arr)
                        if legacy_lstm_comb and reject_word_legacy(
                                words_a_text, words_b_text):
                            b_err = 0.0
                        else:
                            if page_image is not None:
                                from .evalwords import eval_words

                                m_a, m_b = eval_words(
                                    words_a_arr, words_b_arr,
                                    page_image)
                            else:
                                m_a = m_b = EVAL_UNAVAILABLE
                            a_err = (m_a
                                     + (len(words_a_arr) - 1) * 0.025
                                     + penalize_word(words_a_arr))
                            b_err = (m_b
                                     + (len(words_b_arr) - 1) * 0.025
                                     + penalize_word(words_b_arr))
                            if words_a_text == words_b_text:
                                no_letter = (
                                    any(not _LETTER_RE.search(w.text)
                                        for w in words_a_arr)
                                    or any(not _LETTER_RE.search(w.text)
                                           for w in words_b_arr))
                                if no_letter:
                                    a_err += (len(words_a_arr) - 1) * 0.05
                                    b_err += (len(words_b_arr) - 1) * 0.05
                            if legacy_lstm_comb and reject_word_legacy(
                                    words_a_text, words_b_text):
                                b_err = 0.0

                    if (b_err < a_err and b_err < a_alt_err) or (
                            legacy_lstm_comb and a_err > 0.5
                            and a_alt_err > 0.5):
                        skip = _NON_WORD_RE.sub("", word_a.text) in (
                            "eg", "ie")
                        if skip:
                            continue
                        if one_to_one:
                            line_words_edited += 1
                            line_b_replace = line_b
                            word_a.text = word_b.text
                            # Erase char data: LSTM boxes are unreliable
                            word_a.chars = None
                            if word_b.style.smallCaps:
                                word_a.style.smallCaps = True
                        else:
                            reps = [w.clone() for w in words_b_arr]
                            line_words_edited += len(reps)
                            line_b_replace = line_b
                            for x in reps:
                                if legacy_lstm_comb:
                                    for attr in type(x.style).__slots__:
                                        setattr(x.style, attr,
                                                getattr(word_a.style, attr))
                                x.conf = 0.0
                                x.chars = None
                                x.line = line_a
                                x.id += "b"
                            line_a.words[k:k + len(words_a_arr)] = reps
                            k += len(reps) - 1
                            break
                    elif word_a.textAlt and a_alt_err < 0.5 \
                            and a_alt_err < a_err:
                        line_words_edited += 1
                        if len(word_a.text) != len(word_a.textAlt):
                            word_a.chars = None
                        word_a.text = word_a.textAlt

        # Majority of line A replaced -> adopt line B's height metrics
        if line_b_replace and line_words_edited > len(line_a.words) * 0.5:
            line_a.ascHeight = line_b_replace.ascHeight
            line_a.xHeight = line_b_replace.xHeight

    return page
