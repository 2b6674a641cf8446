"""Exact scalar statistics used throughout the extraction pipeline.

These deliberately reimplement the reference's exact (non-interpolated)
definitions — byte-identical output depends on them, so Spark's
``percentile_approx`` must NOT be substituted where one of these feeds an
emitted value (SURVEY.md §2.7):

- ``quantile``: sorted-array index ``floor(n*q)``
  (/root/reference/js/utils/miscUtils.js:106-118)
- ``mean50``: interquartile mean over indices
  ``floor(n/4)-1 .. ceil(3n/4)-1`` (miscUtils.js:139-151)
- ``round3``/``round6``: JS ``Math.round(x*1eK)/1eK`` — note JS
  Math.round is round-half-up (towards +inf), unlike Python's
  banker's rounding (miscUtils.js:276-287)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence


def quantile(arr: Sequence[float], ntile: float) -> Optional[float]:
    """``sorted(arr)[floor(len(arr)*ntile)]``; None for empty input."""
    if not arr:
        return None
    mid = math.floor(len(arr) * ntile)
    arr1 = sorted(arr)
    if mid >= len(arr1):
        mid = len(arr1) - 1
    return arr1[mid]


def mean50(arr: Sequence[float]) -> Optional[float]:
    """Interquartile mean; None for empty input."""
    if not arr:
        return None
    per25 = math.floor(len(arr) / 4) - 1
    per75 = math.ceil(len(arr) * 3 / 4) - 1
    nums = sorted(arr)
    # JS slice(per25, per75+1): negative start counts from the end only
    # for slice(); the reference always passes per25 >= -1, and
    # slice(-1, k) returns at most the last element. Replicate the exact
    # JS behavior for small arrays.
    start = per25 if per25 >= 0 else max(len(nums) + per25, 0)
    nums_middle = nums[start : per75 + 1]
    if not nums_middle:
        return None
    return sum(nums_middle) / len(nums_middle)


def js_round(x: float) -> int:
    """JS ``Math.round``: half-up toward +infinity (-0.5 -> 0)."""
    return math.floor(x + 0.5)


def round3(x: float) -> float:
    return math.floor(x * 1e3 + 0.5) / 1e3


def round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def calc_box_overlap(box_a, box_b) -> float:
    """Fraction of boxA's area contained in boxB (miscUtils.js:27-42)."""
    left = max(box_a.left, box_b.left)
    top = max(box_a.top, box_b.top)
    right = min(box_a.right, box_b.right)
    bottom = min(box_a.bottom, box_b.bottom)
    width = right - left
    height = bottom - top
    if width < 0 or height < 0:
        return 0.0
    area_a = (box_a.bottom - box_a.top) * (box_a.right - box_a.left)
    if area_a == 0:
        return 0.0
    return (width * height) / area_a


def calc_horizontal_overlap(box_a, box_b) -> float:
    """Fraction of boxA's width contained in boxB (miscUtils.js:49-60)."""
    left = max(box_a.left, box_b.left)
    right = min(box_a.right, box_b.right)
    width_overlap = right - left
    if width_overlap < 0:
        return 0.0
    width_a = box_a.right - box_a.left
    if width_a == 0:
        return 0.0
    return width_overlap / width_a
