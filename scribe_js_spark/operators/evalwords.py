"""Image-based word evaluation — the visual half of the comb merge.

Port of evalWords (/root/reference/js/worker/compareOCRModule.js:
203-397): crop the page's binary image at the words' union box, render
each hypothesis text into its word bbox, and score the per-pixel
symmetric difference over the union of ink pixels, discounting a
mismatch that directly follows a match by half (the reference's
``lastMatch`` run smoothing, :289-305). Lower is better; 0 = perfect
overlap; the caller treats > 0.5 as "not lined up at all".

Deviations from the reference, by design:

- rendering uses the repo's deterministic 5x7 dot-matrix glyph set
  (render_fonts.py — the same shapes embedded in written PDFs), one
  integer cell per character across the word bbox, instead of a
  HarfBuzz/opentype canvas stack; fixture page images are produced by
  the same rasterizer, so the metric is exact where the reference's
  is approximate;
- the diff runs over the single-channel bitmap, not the RGBA byte
  stream (the reference iterates canvas ImageData, so its smoothing
  spans channel quadruplets);
- rotation is handled upstream (page deskew), so ``evalWords``'s
  angle shear terms are omitted.

The page image convention matches the reference's binary canvas:
uint8, 255 = paper, anything else = ink.
"""

from __future__ import annotations

from ..render_fonts import _rows_for_codepoint


def draw_word(img, text: str, bbox, dx: int = 0, dy: int = 0) -> None:
    """Render ``text`` into ``bbox`` (shifted by the crop origin
    ``dx, dy``) on a white canvas: one cell per character, each glyph's
    lit 5x7 dots scaled to integer blocks."""
    h_img, w_img = img.shape
    n = max(len(text), 1)
    left = int(bbox.left) - dx
    top = int(bbox.top) - dy
    bw = int(bbox.right) - int(bbox.left)
    bh = int(bbox.bottom) - int(bbox.top)
    for i, ch in enumerate(text):
        rows = _rows_for_codepoint(ord(ch))
        if not rows:
            continue
        cl = left + (i * bw) // n
        cw = left + ((i + 1) * bw) // n - cl
        for r, bits in enumerate(rows[:7]):
            y0 = top + (r * bh) // 7
            y1 = top + ((r + 1) * bh) // 7
            if y1 <= 0 or y0 >= h_img:
                continue
            c = 0
            while c < 5:
                if bits & (1 << (4 - c)):
                    c2 = c
                    while c2 < 5 and bits & (1 << (4 - c2)):
                        c2 += 1
                    x0 = cl + (c * cw) // 5
                    x1 = cl + (c2 * cw) // 5
                    img[max(y0, 0):min(y1, h_img),
                        max(x0, 0):min(x1, w_img)] = 0
                    c = c2
                else:
                    c += 1


def raster_words(words, crop_left: int, crop_top: int,
                 width: int, height: int):
    """White canvas with every word's text drawn into its bbox."""
    import numpy as np

    img = np.full((height, width), 255, dtype=np.uint8)
    for w in words:
        draw_word(img, w.text, w.bbox, crop_left, crop_top)
    return img


def raster_page_image(words, width: int, height: int):
    """Full-page binary image of ``words`` — the fixture-side producer
    of the 'actual' scan (drawWordActual's source)."""
    return raster_words(words, 0, 0, width, height)


def _diff_metric(actual, expected) -> float:
    """diff/total with the 0.5 discount after a run of matches
    (:289-305). 1.0 when no ink exists on either side."""
    total = 0
    diff = 0.0
    last_match = False
    for a, e in zip(actual.ravel(), expected.ravel()):
        a_ink = a != 255
        e_ink = e != 255
        if a_ink or e_ink:
            total += 1
            if not (a_ink and e_ink):
                diff += 0.5 if last_match else 1.0
                last_match = False
            else:
                last_match = True
    return diff / total if total else 1.0


def _diff_metric_fast(actual, expected) -> float:
    """Vectorized :func:`_diff_metric` (identical result). lastMatch
    carries across paper pixels — only ink pixels update it — so the
    discount is computed over the ink-only subsequence."""
    import numpy as np

    a_ink = actual.ravel() != 255
    e_ink = expected.ravel() != 255
    either = a_ink | e_ink
    both = a_ink & e_ink
    total = int(either.sum())
    if total == 0:
        return 1.0
    seq_both = both[either]
    prev_match = np.empty_like(seq_both)
    prev_match[0] = False
    prev_match[1:] = seq_both[:-1]
    mismatch = ~seq_both
    n_half = int((mismatch & prev_match).sum())
    n_full = int(mismatch.sum()) - n_half
    return (n_full + 0.5 * n_half) / total


def eval_words(words_a, words_b, page_image) -> tuple[float, float]:
    """(metricA, metricB): render each candidate set into the union
    crop of the actual page image and score the symmetric pixel
    difference. ``words_b`` may be empty (metricB = 1)."""
    both = list(words_a) + list(words_b)
    if not both:
        return 1.0, 1.0
    h_img, w_img = page_image.shape
    left = max(0, min(int(w.bbox.left) for w in both) - 1)
    top = max(0, min(int(w.bbox.top) for w in both) - 1)
    right = min(w_img, max(int(w.bbox.right) for w in both) + 1)
    bottom = min(h_img, max(int(w.bbox.bottom) for w in both) + 1)
    if right <= left or bottom <= top:
        return 1.0, 1.0
    actual = page_image[top:bottom, left:right]
    width, height = right - left, bottom - top
    exp_a = raster_words(words_a, left, top, width, height)
    metric_a = _diff_metric_fast(actual, exp_a)
    metric_b = 1.0
    if words_b:
        exp_b = raster_words(words_b, left, top, width, height)
        metric_b = _diff_metric_fast(actual, exp_b)
    return metric_a, metric_b
