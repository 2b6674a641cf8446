"""Per-page OCR-routing gates + extended PageStats counters.

Reimplements /root/reference/js/pdf/ocrPageSelection.js:1-113 (the gate
predicates and selectOcrPages/computeRequiresOCR) and the PageStats
counters from parsePdfDoc.js:518-810:

- broken-ToUnicode fonts (>= 3 and >= 50% of CMap entries map to the
  PUA or U+FFFD) and the longest consecutive broken-glyph run;
- visible readable chars and the body-band (10-90% height) subset;
- image placements merged from band-sliced strips, the largest single
  placement as a page-area fraction, and line-shaped image strips not
  already covered by native text (imageTextCandidates);
- filled non-rectangular glyph-height vector paths
  (pathTextCandidates).

Type3 filler-glyph discounting (parsePdfDoc.js:523-534) rides the
CharProc content hashes the font layer records per charCode
(fonts.py `_hash_type3_charprocs`).
"""

from __future__ import annotations

IMAGE_AREA_MIN = 0.02
PATH_TEXT_MIN = 8
IMAGE_TEXT_MIN = 8
BROKEN_RUN_MIN = 3
BROKEN_TEXT_MIN = 100
TEXT_CANDIDATE_IMAGE_MIN = 0.1
FULL_PAGE_IMAGE_MIN = 0.95
INVIS_OCR_MIN = 100
READABLE_TEXT_MIN = 100
BODY_TEXT_MIN = 100
PATH_TEXT_H_MIN = 3
PATH_TEXT_H_MAX = 80

def broken_to_unicode_font(font) -> bool:
    """Font whose ToUnicode CMap maps mostly to the PUA / U+FFFD
    (parsePdfDoc.js:518-551). Type3 `.notdef` filler glyphs — one
    outline stamped across >= 3 charCodes by subset producers — are
    excluded from both counts so producer padding is not mistaken for
    brokenness (parsePdfDoc.js:523-534)."""
    if font is None or not getattr(font, "to_unicode", None):
        return False
    cached = getattr(font, "broken_cached", None)
    if cached is not None:
        return cached
    filler_hashes: set = set()
    glyph_hash = getattr(font, "type3_glyph_hash", None)
    if getattr(font, "type3", False) and glyph_hash:
        hash_count: dict = {}
        for cc in font.to_unicode:
            h = glyph_hash.get(cc)
            if h is not None:
                hash_count[h] = hash_count.get(h, 0) + 1
        filler_hashes = {h for h, n in hash_count.items() if n >= 3}
    mapped = 0
    broken = 0
    for cc, s in font.to_unicode.items():
        if filler_hashes and glyph_hash.get(cc) in filler_hashes:
            continue
        mapped += 1
        if not s:
            continue
        cp = ord(s[0])
        if 0xE000 <= cp <= 0xF8FF or cp == 0xFFFD:
            broken += 1
    is_broken = broken >= 3 and broken >= mapped * 0.5
    try:
        font.broken_cached = is_broken
    except AttributeError:
        pass
    return is_broken


def merge_placements(placements) -> list[tuple]:
    """Reassemble band-sliced images: one picture drawn as dozens of
    contiguous horizontal strips (parsePdfDoc.js:722-748). Input/output
    tuples are (left, bottom, right, top) in points, y-up."""
    cols: dict = {}
    for p in placements:
        left, bottom, right, top = p
        key = (round(left * 2), round((right - left) * 2))
        cols.setdefault(key, []).append([left, bottom, right, top])
    merged = []
    for group in cols.values():
        group.sort(key=lambda g: -g[3])  # by top, descending
        cur = group[0]
        for nxt in group[1:]:
            if cur[1] - nxt[3] <= 1.5:
                if nxt[1] < cur[1]:
                    cur[1] = nxt[1]
            else:
                merged.append(tuple(cur))
                cur = nxt
        merged.append(tuple(cur))
    return merged


def page_stats_extended(chars, paths, placements, w_pts: float,
                        h_pts: float, scale: float) -> dict:
    """The PageStats record (parsePdfDoc.js:632-841)."""
    page_h_px = h_pts * scale
    body_top = page_h_px * 0.1
    body_bottom = page_h_px * 0.9

    printable = printable_vis = control = 0
    visible_all = 0
    longest_broken = broken_run = 0
    visible_readable = 0
    body_readable = 0
    for ch in chars:
        is_broken_font = broken_to_unicode_font(ch.font)
        for u in ch.text:
            cp = ord(u)
            if cp < 32 or 0xFFF0 <= cp <= 0xFFFF:
                control += 1
            elif u != " ":
                printable += 1
                if not ch.invisible:
                    printable_vis += 1
                    visible_all += 1
        if is_broken_font:
            broken_run += 1
            if broken_run > longest_broken:
                longest_broken = broken_run
            continue
        broken_run = 0
        if ch.invisible or not ch.text:
            continue
        cp = ord(ch.text[0])
        if not ((33 <= cp <= 127)
                or (cp >= 161 and not (0xE000 <= cp <= 0xF8FF))):
            continue
        visible_readable += 1
        if body_top <= ch.y <= body_bottom:
            body_readable += 1

    merged = merge_placements(placements)
    page_area = w_pts * h_pts or 1.0
    largest = 0.0
    for left, bottom, right, top in merged:
        frac = abs((right - left) * (top - bottom)) / page_area
        if frac > largest:
            largest = frac
    largest = round(largest * 10000) / 10000

    # line-shaped image strips without native-text coverage
    image_text_candidates = 0
    for left, bottom, right, top in merged:
        w = abs(right - left)
        h = abs(top - bottom)
        if not (PATH_TEXT_H_MIN <= h <= PATH_TEXT_H_MAX):
            continue
        if w < h * 4:
            continue
        px_left = left * scale
        px_right = right * scale
        px_top = (h_pts - top) * scale
        px_bottom = (h_pts - bottom) * scale
        covered = 0.0
        for ch in chars:
            cx = ch.x + ch.width / 2
            if cx < px_left or cx > px_right:
                continue
            ch_top = ch.y - ch.fontSize * 0.8
            ch_bottom = ch.y + ch.fontSize * 0.2
            overlap = min(ch_bottom, px_bottom) - max(ch_top, px_top)
            if overlap < (ch_bottom - ch_top) * 0.5:
                continue
            covered += ch.width
        if covered >= (px_right - px_left) * 0.3:
            continue
        image_text_candidates += 1

    # filled, non-rectangular, glyph-height vector paths
    path_text_candidates = 0
    for path in paths:
        if not path.fill:
            continue
        min_y, max_y = float("inf"), float("-inf")
        has_curve = False
        for c in path.commands:
            if c[0] == "C":
                has_curve = True
                for y in (c[2], c[4], c[6]):
                    min_y = min(min_y, y)
                    max_y = max(max_y, y)
            elif c[0] in ("M", "L"):
                min_y = min(min_y, c[2])
                max_y = max(max_y, c[2])
        h = max_y - min_y
        if not (PATH_TEXT_H_MIN <= h <= PATH_TEXT_H_MAX):
            continue
        all_rect = not has_curve
        if all_rect:
            sub: list = []
            subpaths = []
            for c in path.commands:
                if c[0] == "M":
                    if sub:
                        subpaths.append(sub)
                    sub = [(c[1], c[2])]
                elif c[0] == "L":
                    sub.append((c[1], c[2]))
            if sub:
                subpaths.append(sub)
            for pts in subpaths:
                if not (4 <= len(pts) <= 5):
                    all_rect = False
                    break
                for si in range(len(pts)):
                    x1, y1 = pts[si]
                    x2, y2 = pts[(si + 1) % len(pts)]
                    if abs(x2 - x1) > 0.01 and abs(y2 - y1) > 0.01:
                        all_rect = False
                        break
                if not all_rect:
                    break
        if all_rect:
            continue
        path_text_candidates += 1

    return {
        "largestImageFrac": largest,
        "invisibleTextChars": printable - printable_vis,
        "visibleChars": visible_all,
        "visibleReadableChars": visible_readable,
        "bodyReadableChars": body_readable,
        "printableVis": printable_vis,
        "control": control,
        "pathTextCandidates": path_text_candidates,
        "imageTextCandidates": image_text_candidates,
        "longestBrokenRun": longest_broken,
        "pageSize": [round(w_pts), round(h_pts)],
    }


# ------------------------------------------------------------- gates


def is_full_page_image(s) -> bool:
    return s["largestImageFrac"] >= FULL_PAGE_IMAGE_MIN


def has_readable_text(s) -> bool:
    return s["visibleReadableChars"] >= READABLE_TEXT_MIN


def is_scan_page(s) -> bool:
    return is_full_page_image(s) and not has_readable_text(s)


def has_existing_ocr_layer(s) -> bool:
    return is_full_page_image(s) and s["invisibleTextChars"] >= INVIS_OCR_MIN


def has_broken_font_run(s) -> bool:
    return s["longestBrokenRun"] >= BROKEN_RUN_MIN


def may_have_baked_text(s) -> bool:
    return (s["largestImageFrac"] >= TEXT_CANDIDATE_IMAGE_MIN
            or s["pathTextCandidates"] >= PATH_TEXT_MIN
            or s["imageTextCandidates"] >= IMAGE_TEXT_MIN)


def is_empty(s) -> bool:
    return (s["visibleChars"] == 0 and s["invisibleTextChars"] == 0
            and s["largestImageFrac"] < IMAGE_AREA_MIN)


def has_real_text(s) -> bool:
    return s["bodyReadableChars"] >= BODY_TEXT_MIN


def is_scan_or_unreadable(s) -> bool:
    return not has_real_text(s) and (
        is_full_page_image(s)
        or s["longestBrokenRun"] >= BROKEN_TEXT_MIN)


def select_ocr_pages(page_stats: list, pdf_type: str | None = "image",
                     ocr_pages: str = "autoShallow",
                     use_pdf_text_ocr_main: bool = False) -> list[bool]:
    """Which pages to OCR (ocrPageSelection.js:86-106)."""
    n = len(page_stats)
    if ocr_pages == "all":
        return [True] * n
    if ocr_pages == "none":
        return [False] * n
    deep = ocr_pages in ("autoDeep", "auto")

    if pdf_type == "text":
        ocr_whole_doc = False
    elif pdf_type == "ocr":
        ocr_whole_doc = not use_pdf_text_ocr_main
    else:
        ocr_whole_doc = True

    out = []
    for s in page_stats:
        if ocr_whole_doc:
            out.append(True)
            continue
        if not s:
            out.append(False)
            continue
        if deep:
            if has_broken_font_run(s):
                out.append(True)
            elif is_scan_page(s):
                out.append(not use_pdf_text_ocr_main
                           if has_existing_ocr_layer(s) else True)
            else:
                out.append(may_have_baked_text(s))
            continue
        if not is_scan_or_unreadable(s):
            out.append(False)
        elif has_existing_ocr_layer(s):
            out.append(not use_pdf_text_ocr_main)
        else:
            out.append(True)
    return out


def compute_requires_ocr(page_stats: list) -> bool:
    return any(
        s and (may_have_baked_text(s) or has_broken_font_run(s)
               or is_scan_page(s))
        for s in page_stats)
