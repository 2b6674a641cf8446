"""Reading-order paragraph assignment.

Rule-by-rule port of the reference's heuristics
(/root/reference/js/utils/reflowPars.js:14-360): rolling 5-line window
medians (exact ``quantile`` = sorted-index median, not interpolation),
with recorded break ``reason`` strings identical to the reference's so
debug output is comparable.

JS quirks that affect behavior are replicated explicitly:
- ``lineSpaceArr[0] = line.bbox.bottom - null`` -> the first entry equals
  the raw bottom coordinate (JS number-null arithmetic).
- Out-of-range array reads are ``undefined``; arithmetic with undefined is
  NaN and every NaN comparison is false — modeled via ``_at`` returning
  None and None-propagating comparisons.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import quantile
from ..model import Bbox, OcrPage, OcrPar, bbox_union

_BULLET_RE = re.compile(r"^([•◦▪▫●○◼◻➢«»]|((i+|\d+|[a-z])(\.|\))))$")
_TERMINAL_RE = re.compile(r"[.!?:]$")
_LOWER_START_RE = re.compile(r"[a-z]")
# JS \w is ASCII-only ([A-Za-z0-9_]); Python \w would also match Han
# and accented letters, changing the lowerConnection rule for CJK text.
_WORD_END_RE = re.compile(r"[A-Za-z0-9_]")


def _at(arr, i):
    if i is None or i < 0 or i >= len(arr):
        return None
    return arr[i]


def assign_paragraphs(page: OcrPage, angle: float) -> None:
    ends_early_prev = False
    starts_late_prev = False
    bullet_prev = False
    letter_end_prev = False

    new_par = True
    reason = "first line"

    sin_a = math.sin(angle * (math.pi / 180))
    cos_a = math.cos(angle * (math.pi / 180))

    par_arr: list[OcrPar] = []

    line_left = []
    line_right = []
    line_width = []
    line_center = []
    line_space = []

    y2_prev = None
    for line in page.lines:
        if y2_prev is None:
            # JS: bottom - null === bottom
            line_space.append(line.bbox.bottom)
        else:
            line_space.append(line.bbox.bottom - y2_prev)
        x1r = line.bbox.left * cos_a - sin_a * line.bbox.bottom
        x2r = line.bbox.right * cos_a - sin_a * line.bbox.bottom
        line_left.append(x1r)
        line_right.append(x2r)
        line_width.append(line.bbox.right - line.bbox.left)
        line_center.append((x1r + x2r) / 2)
        y2_prev = line.bbox.bottom

    lines = page.lines

    def calc_expected(idx: int):
        window = 5
        cur_bottom = lines[idx].bbox.bottom
        lines_prev = [
            j for j in range(max(0, idx - window), idx)
            if lines[j].bbox.bottom <= cur_bottom
        ]
        lines_next = [
            j for j in range(idx + 1, min(len(lines), idx + window + 1))
            if lines[j].bbox.bottom >= cur_bottom
        ]
        n_next = len(lines_next)
        n_prev = min(window - n_next, len(lines_prev))
        comp = []
        if n_prev:
            comp.extend(range(idx - n_prev, idx))
        if n_next:
            comp.extend(lines_next)
        if not comp:
            return None
        lm = quantile([line_left[x] for x in comp], 0.5)
        rm = quantile([line_right[x] for x in comp], 0.5)
        wm = quantile([line_width[x] for x in comp], 0.5)
        sm = quantile([line_space[x] for x in comp], 0.5)
        if lm is None or rm is None or wm is None or sm is None:
            return None
        return lm, rm, wm, sm

    for h in range(len(lines)):
        line = lines[h]
        ends_early_int = False
        starts_late = False

        if h > 0 and line.orientation != lines[h - 1].orientation:
            new_par = True
            reason = "orientation change"

        first_text = line.words[0].text if line.words else ""
        last_text = line.words[-1].text if line.words else ""

        bullet = bool(_BULLET_RE.match(first_text))
        if bullet and first_text == "v.":
            bullet = False
        is_real_list_item = bullet
        if is_real_list_item and h > 0:
            prev_line = lines[h - 1]
            prev_last = prev_line.words[-1].text if prev_line.words else ""
            if not _TERMINAL_RE.search(prev_last):
                is_real_list_item = False
            else:
                prev_text = "".join(w.text for w in prev_line.words)
                if prev_text.rfind("(") > prev_text.rfind(")"):
                    is_real_list_item = False

        lower_start = bool(_LOWER_START_RE.match(first_text[:1]))
        letter_end = bool(_WORD_END_RE.match(last_text[-1:] or " "))
        lower_connection = lower_start and letter_end_prev

        if is_real_list_item and h > 0:
            new_par = True
            reason = "bullet/list item"

        first_word_sup = bool(line.words) and line.words[0].style.sup
        if first_word_sup and h > 0:
            new_par = True
            reason = "superscript/footnote"

        par_line_indices = []
        if par_arr and par_arr[-1].lines:
            cur_par_lines = par_arr[-1].lines
            # Reference uses page.lines.indexOf(line); lines are unique objects.
            id_map = {id(l): i for i, l in enumerate(lines)}
            par_line_indices = [id_map[id(l)] for l in cur_par_lines]

            if len(cur_par_lines) > 2 and not bullet_prev:
                par_left_median = quantile(
                    [line_left[x] for x in par_line_indices], 0.5)
                par_width_median = quantile(
                    [line_width[x] for x in par_line_indices], 0.5)
                left_change_thresh = max((par_width_median or 0) * 0.05, 50)
                l_h = _at(line_left, h)
                l_h1 = _at(line_left, h - 1)
                l_hn = _at(line_left, h + 1)
                if (
                    par_left_median and par_width_median and l_h
                    and l_h1 is not None
                    and abs(l_h - l_h1) > left_change_thresh
                    and abs(l_h - par_left_median) > left_change_thresh
                    and l_hn is not None
                    and abs(l_hn - par_left_median) > left_change_thresh
                ):
                    new_par = True
                    reason = "left change"

        expected = calc_expected(h)

        if not expected:
            new_par = True
            reason = "default value (unable to calculate)"
        else:
            left_median, right_median, width_median, space_median = expected

            par_in_progress = par_arr[-1] if par_arr else None
            par_first_line_left = (
                line_left[par_line_indices[0]] if par_line_indices else None
            )
            l_h = line_left[h]
            l_h1 = _at(line_left, h - 1)
            l_hn = _at(line_left, h + 1)

            continues_prev_indent = bool(
                par_in_progress
                and len(par_in_progress.lines) >= 2
                and l_h1 is not None
                and abs(l_h - l_h1) < width_median * 0.025
                and par_first_line_left is not None
                and par_first_line_left < l_h - width_median * 0.025
            )
            continues_at_same_indent = bool(
                par_in_progress
                and len(par_in_progress.lines) >= 1
                and h - 1 >= 0
                and par_in_progress.lines[-1] is lines[h - 1]
                and l_h1 is not None
                and abs(l_h - l_h1) < width_median * 0.025
            )
            indented = bool(
                left_median
                and (h + 1) < len(lines)
                and l_h > left_median + width_median * 0.025
                and l_hn is not None and l_h > l_hn
                and not continues_prev_indent
                and not continues_at_same_indent
            )

            c_h = line_center[h]
            c_h1 = _at(line_center, h - 1)
            c_hn = _at(line_center, h + 1)

            # JS `[].every(...)` is vacuously true; for h > 0 the current
            # paragraph always has lines, so the empty case only arises at
            # h == 0 where c_h1 is None and every consumer is gated off.
            if c_h1 is None:
                center_aligned_prev = len(par_line_indices) == 0
            else:
                center_aligned_prev = all(
                    abs(line_center[x] - c_h1) < width_median * 0.0125
                    for x in par_line_indices
                )

            truly_center_aligned_prev = False
            if center_aligned_prev and par_line_indices:
                if len(par_line_indices) > 1:
                    w_h1 = _at(line_width, h - 1)
                    truly_center_aligned_prev = w_h1 is not None and any(
                        abs(line_width[x] - w_h1) > width_median * 0.05
                        for x in par_line_indices
                    )
                elif len(par_line_indices) == 1:
                    prev_idx = par_line_indices[0]
                    shared_center = abs(line_center[prev_idx] - c_h) < width_median * 0.0125
                    width_differs = abs(line_width[prev_idx] - line_width[h]) > width_median * 0.05
                    truly_center_aligned_prev = shared_center and width_differs

            center_aligned = bool(c_h1) and abs(c_h1 - c_h) < width_median * 0.0125
            center_aligned_next = bool(c_hn) and abs(c_hn - c_h) < width_median * 0.0125
            center_aligned_start = (not center_aligned_prev) and (not center_aligned) and center_aligned_next
            center_aligned_end = center_aligned_prev and not center_aligned

            if par_line_indices and c_h1 and (center_aligned_start or center_aligned_end):
                w_h1 = _at(line_width, h - 1)
                width_variation_prev = (
                    len(par_line_indices) > 1
                    and w_h1 is not None
                    and any(abs(line_width[x] - w_h1) > width_median * 0.05
                            for x in par_line_indices)
                )
                r_h1 = _at(line_right, h - 1)
                r_hn = _at(line_right, h + 1)
                width_variation = bool(r_h1) and abs(line_right[h] - r_h1) > width_median * 0.05
                width_variation_next = bool(r_hn) and abs(line_right[h] - r_hn) > width_median * 0.05
                left_change = bool(l_h1) and abs(l_h1 - l_h) > width_median * 0.025
                right_change = bool(r_h1) and abs(r_h1 - line_right[h]) > width_median * 0.025
                if (left_change and right_change and width_variation_prev
                        and width_variation and width_variation_next):
                    new_par = True
                    reason = "alignment change"

            indented_weak = l_h1 is not None and l_h > l_h1 + 1
            s_h1 = _at(line_space, h - 1)
            line_space_weak = (
                s_h1 is not None and s_h1 > 0
                and line_space[h] > 1.1 * s_h1
            )

            next_first_word = (
                lines[h + 1].words[0]
                if h + 1 < len(lines) and lines[h + 1].words
                else None
            )
            r_h1 = _at(line_right, h - 1)
            ends_early_int = bool(
                right_median - line_right[h] > width_median * 0.1
                and bool(r_h1)
                and (r_h1 - line_right[h]) > width_median * 0.1
                and next_first_word is not None
                and (next_first_word.bbox.right - next_first_word.bbox.left)
                < (right_median - line_right[h])
            )
            starts_late = bool(
                l_h > left_median + width_median * 0.2
                and bool(l_h1)
                and l_h - l_h1 > width_median * 0.2
            )

            if ends_early_prev and not lower_connection and (line_space_weak or indented_weak):
                new_par = True
                reason = "prev line ends early"
            elif starts_late_prev and not lower_connection and not center_aligned_prev:
                new_par = True
                reason = "prev line starts late"
            elif indented and not bullet_prev and not lower_connection and not truly_center_aligned_prev:
                new_par = True
                reason = "indentation"
            elif h == 1 and line_space[h] > 1.5 * space_median:
                new_par = True
                reason = "large space (first line)"

        line_height = line.bbox.bottom - line.bbox.top
        if line_space[h] and line_space[h] < line_height * -1:
            new_par = True
            reason = "new column"

        s_h1 = _at(line_space, h - 1)
        s_hn = _at(line_space, h + 1)
        line_space_increase = s_h1 is not None and s_h1 > 0 and line_space[h] > 1.5 * s_h1
        line_space_decrease = s_hn is not None and s_hn > 0 and line_space[h] > 1.5 * s_hn
        if line_space_increase or line_space_decrease:
            new_par = True
            reason = "large space (relative)"

        bbox = line.bbox
        bbox_prev = lines[h - 1].bbox if h - 1 >= 0 else None

        height = bbox.bottom - bbox.top
        width = bbox.right - bbox.left
        height_rot = height * cos_a - sin_a * width
        if line_space[h] and line_space[h] > 3 * height_rot:
            new_par = True
            reason = "large space (absolute)"

        if bbox_prev and (bbox_prev.right < bbox.left or bbox_prev.left > bbox.right) \
                and (bbox_prev.bottom < bbox.top or bbox_prev.top > bbox.bottom):
            new_par = True
            reason = "no overlap"

        if new_par:
            par = OcrPar(page, Bbox(0, 0, 0, 0))
            par.reason = reason
            par_arr.append(par)
            reason = ""

        par_arr[-1].lines.append(line)

        ends_early_prev = ends_early_int and not new_par
        starts_late_prev = starts_late
        bullet_prev = bullet
        letter_end_prev = letter_end
        new_par = False

    for par_obj in par_arr:
        for line_obj in par_obj.lines:
            line_obj.par = par_obj
        par_obj.bbox = bbox_union([l.bbox for l in par_obj.lines])

    page.pars = par_arr
