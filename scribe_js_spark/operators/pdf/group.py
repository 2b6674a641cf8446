"""Chars -> lines -> words grouping for PDF text layers.

Semantics of the reference's groupCharsIntoPage
(/root/reference/js/pdf/parsePdfDoc.js:1972-3287), core rule set:

(i)    orientation normalization to virtual-horizontal (:2062-2080)
(ii)   rotation-aware perpendicular distance from the mean text
       direction (:2082-2108)
(iii)  stream-order line-cut state machine: space gating (:2134-2158),
       leading-marker (:2227), no-overlap band cut (:2241), y-jump >
       0.7*maxFont or 1.5*minFont (:2246), backward-x > 2*maxFont
       (:2250), forward-x > 4*maxFont (:2253), moderate-y similar-size
       (:2258), size-ratio > 1.75 (:2265), persistent size change with
       3-char lookahead (:2271), baseline drift (:2286)
(vii)  word split at spaces with kerning-artifact suppression (:2534),
       em-dash-after-terminal (:2565), bold/italic change (:2582),
       font-family change unless adjacent (:2588), gap > 0.15*fontSize
       (:2604), baseline shift > 0.25 (:2608), backward jump (:2613),
       2x ornament (:2622), 5+ dot leaders (:2626)
(viii) x-sort words (:2640), small-caps merge (:2645), CJK per-char
       words (:2672)
(xii)  line bbox from non-sup chars via font ascent/descent (:2961),
       baseline slope from the direction vector (:2992)
(xiv)  page angle = asin(mean50(slopes)) (:3253)
(xv)   assignParagraphs (:3281)

(iv)   orphan single-char merge: same-size punctuation + drop caps
       (:2317-2397)
(v)    out-of-order reference-marker reattach (:2462-2520)
(ix)   superscript word detection (:2721-2744) and drop-cap word
       detection (:2795-2806)
(x)    fake small caps (:2915-2959) -> smallCaps style + large size
(xi)   underline matching from vector paths (:3141-3174)
(xiii) styleRuns: per-char bold/italic deltas (:3223-3242)
(xvi)  inline-math exemptions: reducedScript / radicalRadicand /
       builtUpMath (pageHasMath-gated) + inline symbol boundaries
       (:2185-2222), exempting the cut rules exactly as the reference
       maps them (:2240-2290)
"""

from __future__ import annotations

import math
import re

from ...functions.stats import js_round, mean50, round3, round6
from ...functions.textnorm import (LIGATURE_MAP, calc_lang,
                                   replace_ligatures)

# len(replace_ligatures(t)) without building the substituted string —
# the styleRuns offset scan below calls it once per char.
_LIG_LEN = {k: len(v) for k, v in LIGATURE_MAP.items()}


def _lig_len(t: str) -> int:
    if len(t) == 1:
        return _LIG_LEN.get(t, 1)
    return sum(_LIG_LEN.get(c, 1) for c in t)
from ...model import Bbox, OcrChar, OcrLine, OcrPage, OcrWord
from ..paragraphs import assign_paragraphs
from .colorfn import rgb_to_hex
from .paths import color_to_rgb

_TERMINAL_RE = re.compile(r"[.!?]")
_BULLET_CHARS = set("•◦▪▫●○◼◻➢‣·")
_ALNUM_RE = re.compile(r"[A-Za-z0-9]")
_UPPER_RE = re.compile(r"[A-Z]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_LOWER_RE = re.compile(r"[a-z]")
_SC_SHAPE_RE = re.compile(r"[A-Z].?[A-Z]")
_REF_MARKER_RE = re.compile(r"^[0-9,]+$|^[®*†‡§]+$")
_FN_MARKER_RE = re.compile(r"^FN\d{1,3}$")
# ^[√∛∜]$ as a set-membership test (only single-char texts can match).
_RADICAL_CHARS = frozenset("√∛∜")
# Fonts used essentially only for mathematics (parsePdfDoc.js:151)
MATH_FONT_RE = re.compile(
    r"^(?:CM(?:MI|SY|EX)|lm(?:mi|sy|ex)|MS[AB]M|EUF[MB]|EUS[MB]|RSFS|"
    r"MT(?:MI|SY|EX))|MathJax|[A-Za-z]*Math\b", re.I)
# Unicode near-exclusive to mathematics (parsePdfDoc.js:155)
MATH_CHAR_RE = re.compile(
    "[ℂℏℑℕ℘ℚℜℝℤℵ∀-⋿⟀-⟯⦀-⧿⨀-⫿\U0001D400-\U0001D7FF]")
_SYMBOL_FONT_RE = re.compile(
    r"^(?:Webdings|Wingdings|ZapfDingbats|Dingbats|Symbol|SymbolMT|"
    r"Quivira)(?:[-\s].*)?$", re.I)

# Font-name regex verdicts memoized by name string: a page has a
# handful of distinct fonts but the grouping loop re-tests per char
# pair, which made these regexes a top profile entry. Bounded so a
# pathological corpus cannot grow executor memory without limit.
_symbol_font_memo: dict = {}
_math_font_memo: dict = {}


def _is_symbol_font(name) -> bool:
    v = _symbol_font_memo.get(name)
    if v is None:
        if len(_symbol_font_memo) > 4096:
            _symbol_font_memo.clear()
        v = _symbol_font_memo[name] = bool(_SYMBOL_FONT_RE.match(name or ""))
    return v


def is_math_font(name) -> bool:
    v = _math_font_memo.get(name)
    if v is None:
        if len(_math_font_memo) > 4096:
            _math_font_memo.clear()
        v = _math_font_memo[name] = bool(MATH_FONT_RE.search(name or ""))
    return v


def group_chars_into_page(chars, n: int, page_dims: dict,
                          underline_rects: list | None = None,
                          page_has_math: bool = False) -> OcrPage:
    page_obj = OcrPage(n, page_dims)
    page_obj.textSource = "pdf"
    if not chars:
        return page_obj

    page_w = page_dims["width"]
    page_h = page_dims["height"]

    # (i) orientation normalization to virtual-horizontal coordinates.
    for ch in chars:
        if ch.orientation == 1:
            ch.x, ch.y = ch.y, page_w - ch.x
        elif ch.orientation == 2:
            ch.x, ch.y = page_w - ch.x, page_h - ch.y
        elif ch.orientation == 3:
            ch.x, ch.y = page_h - ch.y, ch.x

    # (ii) perpendicular distance from the mean orientation-0 direction.
    avg_dx = avg_dy = 0.0
    n0 = 0
    for ch in chars:
        if ch.orientation == 0:
            avg_dx += ch.dirX
            avg_dy += ch.dirY
            n0 += 1
    if n0 > 0:
        mag = math.hypot(avg_dx, avg_dy)
        if mag > 0:
            avg_dx /= mag
            avg_dy /= mag
    if n0 == 0 or (avg_dx == 0 and avg_dy == 0):
        avg_dx, avg_dy = 1.0, 0.0

    # Precompute hot per-char scalars once (the cut loop below touches
    # each several times; attribute access dominated the profile).
    n_chars = len(chars)
    cys_list = [0.0] * n_chars
    for idx, ch in enumerate(chars):
        cys_list[idx] = (-ch.x * avg_dy + ch.y * avg_dx
                         if ch.orientation == 0 else ch.y)
    # Parallel scalar arrays for the cut loop: each char is touched
    # several times per iteration and Python attribute access dominated
    # the wall-clock profile. Font-level regex verdicts collapse to one
    # lookup per distinct font object.
    texts = [None] * n_chars
    fss = [0.0] * n_chars
    xs = [0.0] * n_chars
    ys = [0.0] * n_chars
    rights = [0.0] * n_chars
    sizes = [0.0] * n_chars   # max(fontSize, width)
    oris = [0] * n_chars
    fams = [None] * n_chars
    bolds = [False] * n_chars
    itals = [False] * n_chars
    ascents = [0.0] * n_chars
    descents = [0.0] * n_chars
    sym_flags = [False] * n_chars
    rad_flags = [False] * n_chars
    mathf_flags = [False] * n_chars
    _font_info: dict = {}
    for idx, ch in enumerate(chars):
        t = ch.text
        fs = ch.fontSize
        w = ch.width
        texts[idx] = t
        fss[idx] = fs
        xs[idx] = ch.x
        ys[idx] = ch.y
        rights[idx] = ch.x + w
        sizes[idx] = fs if fs > w else w
        oris[idx] = ch.orientation
        rad_flags[idx] = t in _RADICAL_CHARS
        f = ch.font
        fid = id(f)
        info = _font_info.get(fid)
        if info is None:
            info = _font_info[fid] = (
                f.family_name, f.bold, f.italic,
                _is_symbol_font(f.family_name), is_math_font(f.base_name),
                f.ascent, f.descent)
        fams[idx] = info[0]
        bolds[idx] = info[1]
        itals[idx] = info[2]
        sym_flags[idx] = info[3]
        if page_has_math:
            mathf_flags[idx] = info[4]
        ascents[idx] = info[5]
        descents[idx] = info[6]

    # (iii) stream-order line cuts (index-based; lines materialize to
    # char lists right after the loop).
    lines_idx = []
    current = [0]
    anchor_y = cys_list[0]
    anchor_fs = fss[0]
    body_y = None if texts[0] == " " else cys_list[0]
    body_size = 0.0 if texts[0] == " " else fss[0]

    for i in range(1, n_chars):
        ch_fs = fss[i]
        ch_y = cys_list[i]

        if texts[i] == " ":
            last_ns = -1
            for j in range(len(current) - 1, -1, -1):
                if texts[current[j]] != " ":
                    last_ns = current[j]
                    break
            if last_ns >= 0:
                ns_fs = fss[last_ns]
                sp_max = ch_fs if ch_fs > ns_fs else ns_fs
                if abs(ch_fs - ns_fs) > sp_max * 0.1:
                    sp_gap = abs(ch_y - cys_list[last_ns])
                    sp_min = ch_fs if ch_fs < ns_fs else ns_fs
                    if sp_gap > sp_max * 0.7 or sp_gap > sp_min * 1.5:
                        lines_idx.append(current)
                        current = [i]
                        anchor_y = ch_y
                        anchor_fs = ch_fs
                        body_y = None
                        body_size = 0.0
                        continue
            current.append(i)
            continue

        p = i - 1
        if texts[p] == " ":
            for j in range(len(current) - 1, -1, -1):
                if texts[current[j]] != " ":
                    p = current[j]
                    break

        prev_fs = fss[p]
        y_gap = abs(ch_y - cys_list[p])
        x_gap = xs[i] - rights[p]
        ch_size = sizes[i]
        prev_size = sizes[p]
        max_font = ch_size if ch_size > prev_size else prev_size
        min_font = ch_size if ch_size < prev_size else prev_size
        font_ratio = ch_fs / prev_fs if prev_fs else 1.0

        leading_marker = (
            anchor_fs < ch_fs * 0.85
            and -max_font * 0.3 < x_gap < max_font * 0.8
            and y_gap < max_font * 0.8)

        # Inline-math exemptions (parsePdfDoc.js:2185-2222): narrow
        # escapes so a few off-baseline glyphs within one visual line
        # are not torn onto their own lines.
        inline_symbol_boundary = (
            (sym_flags[i] or sym_flags[p]) and y_gap < max_font * 0.5
            and -max_font * 0.2 < x_gap < max_font)
        # a script/fraction part set smaller than the body whose box
        # still intersects the anchor band
        reduced_script = (
            ch_fs < anchor_fs * 0.85
            and ch_y - ch_fs * 0.8 < anchor_y + anchor_fs * 0.2
            and ch_y + ch_fs * 0.2 > anchor_y - anchor_fs * 0.8)
        has_radical = rad_flags[p] or rad_flags[i]
        radical_radicand = (
            has_radical and 0.8 < font_ratio < 1.25
            and -max_font * 0.2 < x_gap < max_font * 0.5
            and y_gap < max_font * 1.1)
        built_up_math = False
        if page_has_math:
            math_context = (
                mathf_flags[i] or mathf_flags[p]
                or has_radical
                or ch_fs < anchor_fs * 0.85
                or prev_fs < anchor_fs * 0.85
                or (0.8 < font_ratio < 1.25
                    and abs(ch_y - anchor_y) < anchor_fs * 0.35))
            built_up_math = (
                math_context
                and abs(ch_y - anchor_y) < anchor_fs * 1.3
                and -anchor_fs * 1.5 < x_gap < max_font * 4)
        inline_math = reduced_script or radical_radicand or built_up_math

        is_cut = False
        if oris[i] != oris[p]:
            is_cut = True
        elif (body_size > 0 and not leading_marker and not built_up_math
              and ch_fs < body_size * 0.85
              and (ch_y - body_y > body_size * 0.4
                   or ch_y - body_y < -body_size * 0.9)):
            is_cut = True
        elif (y_gap > max_font * 0.7 or y_gap > min_font * 1.5) \
                and not inline_math and not leading_marker:
            is_cut = True
        elif x_gap < -max_font * 2 and not built_up_math:
            is_cut = True
        elif x_gap > max_font * 4:
            is_cut = True
        elif (not inline_math and not leading_marker
              and 0.8 < font_ratio < 1.25
              and (x_gap < -max_font * 0.1 or x_gap > max_font * 0.5
                   or y_gap > min_font * 0.5)
              and y_gap > (min_font * 0.2 if x_gap > max_font
                           else min_font * 0.3)):
            is_cut = True
        elif (not inline_symbol_boundary and not built_up_math
              and y_gap > min_font * 0.1
              and (font_ratio > 1.75 or font_ratio < 1 / 1.75)
              and (x_gap < -max_font * 0.1 or x_gap > max_font * 0.5)):
            is_cut = True
        elif (not inline_symbol_boundary and not built_up_math
              and y_gap > min_font * 0.1
              and (font_ratio < 0.8 or font_ratio > 1.25)):
            persist = 0
            target = ch_fs if ch_fs < prev_fs else prev_fs
            for j in range(i + 1, n_chars):
                if persist >= 3:
                    break
                if texts[j] == " ":
                    continue
                if abs(fss[j] - target) < target * 0.15:
                    persist += 1
                else:
                    break
            if persist >= 3:
                is_cut = True

        if (not is_cut and not built_up_math
                and anchor_fs * 0.8 <= ch_fs <= anchor_fs * 1.25
                and abs(ch_y - anchor_y) > anchor_fs * 0.3
                and x_gap > max_font * 0.5):
            is_cut = True

        if is_cut:
            lines_idx.append(current)
            current = [i]
            anchor_y = ch_y
            anchor_fs = ch_fs
            body_y = ch_y
            body_size = ch_fs
        else:
            current.append(i)
            if ch_fs >= anchor_fs * 0.8:
                anchor_y = ch_y
            if texts[i] != " " and (body_size == 0
                                    or ch_fs >= body_size * 0.95):
                body_size = body_size if body_size > ch_fs else ch_fs
                body_y = ch_y
    if current:
        lines_idx.append(current)
    # Lines stay as index lists through the merge/reattach/word-split
    # phases; char objects materialize at the construction step.
    lines = lines_idx

    # (iv) orphan single-char merge (parsePdfDoc.js:2317-2397): chars
    # emitted far from their neighbors in stream order strand as
    # single-char lines. Case (a): same-size punctuation (same font,
    # baseline-adjacent); case (b): drop caps (same font, >2x larger,
    # top-aligned, single uppercase letter). The orphan is inserted at
    # its x-position so word splitting groups it spatially.
    line_extents = []
    for line_chs in lines:
        min_x, max_right, max_fs = math.inf, -math.inf, 0.0
        for j in line_chs:
            if xs[j] < min_x:
                min_x = xs[j]
            if rights[j] > max_right:
                max_right = rights[j]
            if fss[j] > max_fs:
                max_fs = fss[j]
        line_extents.append([min_x, max_right, max_fs])
    li = len(lines) - 1
    while li >= 0:
        if len(lines[li]) != 1:
            li -= 1
            continue
        o = lines[li][0]
        o_fs = fss[o]
        orphan_right = rights[o]
        orphan_top = ys[o] - ascents[o] * o_fs
        merged = False
        for lj in range(len(lines)):
            if merged or lj == li:
                continue
            target = lines[lj]
            ext = line_extents[lj]
            slack = max(o_fs, ext[2]) * 0.1
            if orphan_right < ext[0] - slack or xs[o] > ext[1] + slack:
                continue
            for j in target:
                if fams[o] != fams[j]:
                    continue
                ch_fs2 = fss[j]
                max_font = max(o_fs, ch_fs2)
                min_font_o = min(o_fs, ch_fs2)
                same_size = abs(o_fs - ch_fs2) < max_font * 0.1
                x_adj = (orphan_right >= xs[j] - max_font * 0.1
                         and xs[o] <= rights[j] + max_font * 0.1)
                do_merge = False
                if same_size and x_adj \
                        and abs(ys[o] - ys[j]) < max_font * 0.5:
                    do_merge = True  # (a) same-size punctuation
                elif (not same_size and o_fs > ch_fs2 * 2
                        and _UPPER_RE.search(texts[o]) and x_adj):
                    ch_top = ys[j] - ascents[j] * ch_fs2
                    if abs(orphan_top - ch_top) < min_font_o * 0.25:
                        do_merge = True  # (b) drop cap, top-aligned
                if do_merge:
                    insert_idx = len(target)
                    for k, tc in enumerate(target):
                        if xs[tc] > xs[o]:
                            insert_idx = k
                            break
                    target.insert(insert_idx, o)
                    ext[0] = min(ext[0], xs[o])
                    ext[1] = max(ext[1], orphan_right)
                    ext[2] = max(ext[2], o_fs)
                    del lines[li]
                    del line_extents[li]
                    merged = True
                    break
        li -= 1

    # (v) out-of-order reference-marker reattach (:2462-2520): some
    # generators emit a page's superscript markers as a trailing block;
    # each strands as its own reduced-size line inside a band a
    # full-size line occupies. Only marker-shaped content moves.
    def _line_anchor(line_chs):
        max_size, family = 0.0, None
        for j in line_chs:
            if texts[j] != " " and fss[j] > max_size:
                max_size = fss[j]
                family = fams[j]
        if max_size == 0:
            return None
        band_ys = []
        left_x, right_x = math.inf, -math.inf
        for j in line_chs:
            if texts[j] == " ":
                continue
            if fss[j] >= max_size * 0.8:
                band_ys.append(cys_list[j])
            if xs[j] < left_x:
                left_x = xs[j]
            if rights[j] > right_x:
                right_x = rights[j]
        if not band_ys:
            return None
        band_ys.sort()
        return {"fs": max_size, "family": family,
                "baseline": band_ys[len(band_ys) // 2],
                "left": left_x, "right": right_x}

    anchors = [_line_anchor(lc) for lc in lines]
    li = len(lines) - 1
    while li >= 0:
        frag = [j for j in lines[li] if texts[j] != " "]
        frag_text = "".join(texts[j] for j in frag)
        is_fn = bool(_FN_MARKER_RE.match(frag_text))
        if (0 < len(frag) <= 6
                and (_REF_MARKER_RE.match(frag_text) or is_fn)):
            frag_size, frag_family = 0.0, None
            frag_left, frag_baseline = math.inf, 0.0
            for j in frag:
                if fss[j] > frag_size:
                    frag_size = fss[j]
                    frag_family = fams[j]
                if xs[j] < frag_left:
                    frag_left = xs[j]
                frag_baseline = cys_list[j]
            best, best_dist = -1, math.inf
            for lj in range(len(lines)):
                if lj == li:
                    continue
                host = anchors[lj]
                if not host:
                    continue
                # superscript-scaled for its host (FN markers stay
                # near body size)
                if is_fn:
                    if (frag_size < host["fs"] * 0.7
                            or frag_size > host["fs"] * 1.15):
                        continue
                elif (frag_size >= host["fs"] * 0.85
                        or frag_size < host["fs"] * 0.4):
                    continue
                if host["family"] != frag_family:
                    continue
                drop = host["baseline"] - frag_baseline
                if drop < -host["fs"] * 0.1 or drop > host["fs"] * 0.8:
                    continue
                if frag_left < host["left"] - host["fs"] * 0.5:
                    continue
                if frag_left > host["right"] + host["fs"]:
                    continue
                if abs(drop) < best_dist:
                    best_dist = abs(drop)
                    best = lj
            if best >= 0:
                target = lines[best]
                insert_idx = len(target)
                for k, tc in enumerate(target):
                    if xs[tc] > frag_left:
                        insert_idx = k
                        break
                target[insert_idx:insert_idx] = lines[li]
                anchors[best] = _line_anchor(target)
                del lines[li]
                del anchors[li]
        li -= 1

    # (vii)-(viii) word splitting per line (index-based; words become
    # char lists right before construction).
    for line_chars in lines:
        n_line = len(line_chars)
        words_initial = []
        cur_word = []
        for i in range(n_line):
            c = line_chars[i]
            c_text = texts[c]
            if c_text == " ":
                if cur_word:
                    next_ns = -1
                    for j in range(i + 1, n_line):
                        if texts[line_chars[j]] != " ":
                            next_ns = line_chars[j]
                            break
                    if next_ns >= 0:
                        p = cur_word[-1]
                        visual_gap = xs[next_ns] - rights[p]
                        adjacency_tol = fss[p] * 0.15
                        positive_tol = max(fss[p] * 0.01,
                                           (rights[c] - xs[c]) * 0.1)
                        if (-adjacency_tol <= visual_gap < positive_tol
                                and texts[p] != ","):
                            continue
                    words_initial.append(cur_word)
                    cur_word = []
                continue

            if cur_word:
                p = cur_word[-1]
                p_text = texts[p]
                gap = xs[c] - rights[p]
                c_fs = fss[c]
                p_fs = fss[p]
                fs_min = c_fs if c_fs < p_fs else p_fs
                split = False
                if c_text == "—" and _TERMINAL_RE.search(p_text):
                    words_initial.append(cur_word)
                    words_initial.append([c])
                    cur_word = []
                    continue
                if (len(cur_word) == 1 and p_text in _BULLET_CHARS
                        and _ALNUM_RE.match(c_text)):
                    words_initial.append(cur_word)
                    cur_word = [c]
                    continue
                if ((bolds[c] != bolds[p] or itals[c] != itals[p])
                        and not (c_text in ",.;:!?)]}”’"
                                 and gap <= fs_min * 0.15)
                        and not ((c_text in "—–" or p_text in "—–")
                                 and gap <= fs_min * 0.15)):
                    split = True
                elif fams[c] != fams[p] and gap > fs_min * 0.15:
                    split = True
                elif p_text == "”" and _ALPHA_RE.match(c_text):
                    split = True
                elif gap > c_fs * 0.15:
                    split = True
                elif fs_min > 0 and abs(ys[c] - ys[p]) > fs_min * 0.25:
                    split = True
                elif gap < -c_fs * 0.5 and xs[c] < xs[p]:
                    split = True
                elif gap < -fs_min * 0.1 and fs_min > 0 and c_fs > p_fs * 1.1:
                    split = True
                elif fs_min > 0 and (c_fs if c_fs > p_fs else p_fs) >= fs_min * 2:
                    split = True
                elif c_text == "." and p_text != ".":
                    dots = 0
                    for j in range(i, n_line):
                        if texts[line_chars[j]] == ".":
                            dots += 1
                        else:
                            break
                    if dots >= 5:
                        split = True
                if split:
                    words_initial.append(cur_word)
                    cur_word = []
            cur_word.append(c)
        if cur_word:
            words_initial.append(cur_word)
        if not words_initial:
            continue

        words_initial.sort(key=lambda w: xs[w[0]])

        # small-caps merge (:2645-2669)
        words_merged = []
        wi = 0
        while wi < len(words_initial):
            curr = words_initial[wi]
            nxt = words_initial[wi + 1] if wi + 1 < len(words_initial) else None
            if (len(curr) == 1 and _UPPER_RE.match(texts[curr[0]]) and nxt
                    and _UPPER_RE.match(texts[nxt[0]])
                    and fams[curr[0]] == fams[nxt[0]]
                    and fss[nxt[0]] < fss[curr[0]] * 0.95
                    and abs(ys[nxt[0]] - ys[curr[0]])
                    / min(fss[nxt[0]], fss[curr[0]]) < 0.15):
                last = curr[-1]
                gap = xs[nxt[0]] - rights[last]
                if gap <= fss[nxt[0]] * 0.3:
                    words_merged.append(curr + nxt)
                    wi += 2
                    continue
            words_merged.append(curr)
            wi += 1

        # CJK per-char words (:2672)
        words_final = []
        for widxs in words_merged:
            wtext = "".join(texts[j] for j in widxs)
            if calc_lang(wtext) == "chi_sim":
                words_final.extend([[j] for j in widxs])
            else:
                words_final.append(widxs)
        if not words_final:
            continue

        # Drop-cap word detection (:2795-2806): a single-char word >2x
        # the next word's size with a lower baseline (the letter spans
        # multiple visual lines). Detected before superscript scanning
        # so the oversized glyph doesn't anchor the body baseline.
        dropcap_flags = [False] * len(words_final)
        for wi2 in range(len(words_final) - 1):
            wc = words_final[wi2]
            nc = words_final[wi2 + 1]
            if len(wc) != 1 or not nc:
                continue
            if (fss[wc[0]] > fss[nc[0]] * 2
                    and ys[wc[0]] > ys[nc[0]]):
                dropcap_flags[wi2] = True

        # (ix) superscript word detection — whole-word variant of the
        # reference's boundary scan (:2721-2744: sizeDelta < -0.05 and
        # baselineDelta < -0.25 relative to adjacent full-size text; the
        # baseline-shift word split above has already isolated the
        # raised run into its own word). Drop-cap words are excluded
        # from the body anchor and never flagged (:2819).
        body_fs = max(
            (fss[j]
             for wi2, w in enumerate(words_final)
             if not dropcap_flags[wi2] for j in w), default=0.0)
        body_ys = [
            ys[j]
            for wi2, w in enumerate(words_final)
            if not dropcap_flags[wi2] for j in w
            if fss[j] >= body_fs * 0.95]
        body_baseline = min(body_ys) if body_ys else None
        sup_flags = []
        for wi2, widxs in enumerate(words_final):
            fs = fss[widxs[0]]
            is_sup = bool(
                not dropcap_flags[wi2]
                and body_baseline is not None
                and body_fs > 0
                and fs < body_fs * 0.85
                and (body_baseline - ys[widxs[0]]) > fs * 0.25)
            sup_flags.append(is_sup)

        # Fake small caps (:2915-2959): mixed font sizes inside an
        # all-uppercase word on one baseline mark the smaller chars as
        # small-caps lowercase; the run extends to following uniform
        # small-size uppercase words until a size step breaks it.
        sc_alt = [False] * len(words_final)
        sc_large = [0.0] * len(words_final)
        sc_title = [False] * len(words_final)
        sc_active = False
        sc_base = 0.0
        for wi2, widxs in enumerate(words_final):
            if sup_flags[wi2] or len(widxs) < 2:
                continue
            max_fs = max(fss[j] for j in widxs)
            min_fs = min(fss[j] for j in widxs)
            mixed = max_fs > 0 and min_fs < max_fs * 0.95
            if mixed:
                all_text = "".join(texts[j] for j in widxs)
                if (not _LOWER_RE.search(all_text)
                        and _UPPER_RE.search(all_text)):
                    large = next(
                        (j for j in widxs
                         if fss[j] >= max_fs * 0.95), None)
                    small = next(
                        (j for j in widxs
                         if fss[j] <= min_fs * 1.05), None)
                    delta = (abs(ys[small] - ys[large]) / min_fs
                             if large is not None and small is not None
                             and min_fs else 0.0)
                    if delta < 0.15:
                        sc_alt[wi2] = True
                        sc_large[wi2] = max_fs
                        first_alpha = next(
                            (j for j in widxs
                             if _UPPER_RE.match(texts[j])), None)
                        if first_alpha is not None \
                                and fss[first_alpha] >= max_fs * 0.95:
                            sc_title[wi2] = True
                        sc_active = True
                        sc_base = max_fs
            elif sc_active:
                fs1 = fss[widxs[0]]
                fs2 = fss[widxs[1]]
                fmin = min(fs1, fs2)
                sdelta = (fs2 - fs1) / fmin if fmin > 0 else 0.0
                if math.isfinite(sdelta) and sdelta > 0.05:
                    sc_active = False
                else:
                    sc_alt[wi2] = True
                    sc_large[wi2] = sc_base

        # (xii) line bbox from chars via font ascent/descent.
        # Rounded device boxes computed once per char (hot path);
        # box_of is index-parallel, and c.box stays assigned for any
        # downstream reader.
        floor = math.floor
        box_of = {}
        all_idx = []
        non_sup_idx = []
        for w, is_sup in zip(words_final, sup_flags):
            for j in w:
                y = ys[j]
                fs = fss[j]
                b = (
                    floor(xs[j] + 0.5),
                    floor(y - ascents[j] * fs + 0.5),
                    floor(rights[j] + 0.5),
                    floor(y - descents[j] * fs + 0.5),
                )
                box_of[j] = b
                chars[j].box = b
                all_idx.append(j)
                if not is_sup:
                    non_sup_idx.append(j)
        bbox_idx = non_sup_idx or all_idx
        line_left = min(box_of[j][0] for j in bbox_idx)
        line_right = max(box_of[j][2] for j in bbox_idx)
        line_top = min(box_of[j][1] for j in bbox_idx)
        line_bottom = max(box_of[j][3] for j in bbox_idx)

        baseline_y = ys[bbox_idx[0]]
        baseline_offset = js_round(baseline_y - line_bottom)
        asc_height = fss[all_idx[0]] * 0.6

        sum_dx = sum(chars[j].dirX for j in all_idx)
        sum_dy = sum(chars[j].dirY for j in all_idx)
        mag = math.hypot(sum_dx, sum_dy)
        baseline_slope = 0.0
        orientation = oris[all_idx[0]]
        if mag > 0:
            ndx = sum_dx / mag
            ndy = sum_dy / mag
            if orientation == 1:
                baseline_slope = round6(-ndx)
            elif orientation == 2:
                baseline_slope = round6(-ndy)
            elif orientation == 3:
                baseline_slope = round6(ndx)
            elif abs(ndx) > 0.01:
                baseline_slope = round6(ndy)

        line_obj = OcrLine(
            page_obj, Bbox(line_left, line_top, line_right, line_bottom),
            [baseline_slope, baseline_offset], asc_height, None)
        line_obj.orientation = orientation

        for wi2, widxs in enumerate(words_final):
            wtext = replace_ligatures("".join(texts[j] for j in widxs))
            if wtext.strip() == "":
                continue
            word_left = box_of[widxs[0]][0]
            word_right = box_of[widxs[-1]][2]
            word_top = min(box_of[j][1] for j in widxs)
            word_bottom = max(box_of[j][3] for j in widxs)
            wid = f"word_{n + 1}_{len(page_obj.lines) + 1}_{wi2 + 1}"
            word_obj = OcrWord(
                line_obj, wid, wtext,
                Bbox(word_left, word_top, word_right, word_bottom))
            word_obj.conf = 100
            word_obj.lang = calc_lang(wtext)
            word_obj.visualCoords = False
            fa = next(
                (j for j in widxs if _ALNUM_RE.match(texts[j])), widxs[0])
            first_alnum = chars[fa]
            word_obj.style.font = fams[fa]
            word_obj.style.bold = bolds[fa]
            word_obj.style.italic = itals[fa]
            word_obj.style.size = round3(fss[fa])
            # Color + opacity from the first alphanumeric char
            # (parsePdfDoc.js:3104-3112): fill color -> '#rrggbb',
            # invisible (Tr 3) -> opacity 0, else the ExtGState /ca.
            color_rgb = color_to_rgb(first_alnum.textColor)
            if color_rgb:
                word_obj.style.color = rgb_to_hex(color_rgb)
            if first_alnum.invisible:
                word_obj.style.opacity = 0.0
            else:
                word_obj.style.opacity = first_alnum.alpha
            # Faux-bold state (NativeTextWord entry, :3092-3096)
            if (first_alnum.renderMode in (1, 2)
                    and first_alnum.strokeWidth > 0):
                word_obj.renderMode = first_alnum.renderMode
                word_obj.strokeWidth = round3(first_alnum.strokeWidth)
            # Marked-content id -> struct-tree linkage (the per-word
            # signal the layout pass resolves, parsePdfDoc.js:3073)
            word_obj.mcid = next(
                (chars[j].mcid for j in widxs
                 if chars[j].mcid is not None), None)
            word_obj.style.sup = sup_flags[wi2]
            if dropcap_flags[wi2]:
                word_obj.style.dropcap = True
                word_obj.style.size = round3(fss[widxs[0]])
            # Fake small caps -> real smallCaps style when the word is
            # uppercase-shaped; size restored to the large-char size
            # (:3133-3139)
            if sc_alt[wi2] and not _LOWER_RE.search(wtext) \
                    and _SC_SHAPE_RE.search(wtext):
                word_obj.style.smallCaps = True
                if sc_large[wi2] > 0:
                    word_obj.style.size = round3(sc_large[wi2])

            # styleRuns (:3223-3242): per-char bold/italic deltas inside
            # a word whose first char matches the word style (ligature-
            # expanded offsets). Font smallCaps flags are not modeled by
            # PdfFont, so runs carry bold/italic deltas only.
            c0 = widxs[0]
            if (bolds[c0] == word_obj.style.bold
                    and itals[c0] == word_obj.style.italic):
                runs = []
                text_offset = _lig_len(texts[c0])
                for ci in range(1, len(widxs)):
                    pj = widxs[ci - 1]
                    cj = widxs[ci]
                    if bolds[cj] != bolds[pj] or itals[cj] != itals[pj]:
                        delta = {}
                        if bolds[cj] != word_obj.style.bold:
                            delta["bold"] = bolds[cj]
                        if itals[cj] != word_obj.style.italic:
                            delta["italic"] = itals[cj]
                        runs.append({"i": text_offset, "style": delta})
                    text_offset += _lig_len(texts[cj])
                if runs:
                    word_obj.styleRuns = runs

            # Underline detection (parsePdfDoc.js:3141-3174): a thin
            # horizontal bar overlapping the word, sitting just below
            # the baseline, pinned within the line's text extent, and
            # not clashing with the text color.
            if underline_rects:
                baseline_y_word = ys[widxs[0]]
                fs = fss[widxs[0]]
                char_color = chars[widxs[0]].textColor
                overhang = fs * 0.5
                for rect in underline_rects:
                    if not (rect["right"] > word_left
                            and rect["left"] < word_right
                            and baseline_y_word - fs * 0.1 <= rect["y"]
                            <= baseline_y_word + fs * 0.35
                            and rect["left"] >= line_left - overhang
                            and rect["right"] <= line_right + overhang):
                        continue
                    if rect.get("color") and char_color:
                        rect_rgb = color_to_rgb(rect["color"])
                        char_rgb = color_to_rgb(char_color)
                        if rect_rgb and char_rgb:
                            rect_gray = (max(rect_rgb) - min(rect_rgb)
                                         < 0.1)
                            both_dark = (
                                all(v < 0.3 for v in rect_rgb)
                                and all(v < 0.3 for v in char_rgb))
                            if (not both_dark and not rect_gray
                                    and any(abs(a - b) > 0.1 for a, b
                                            in zip(rect_rgb, char_rgb))):
                                continue
                    word_obj.style.underline = True
                    rect["isUnderline"] = True
                    break

            word_obj.chars = [
                OcrChar(texts[j], Bbox(*box_of[j])) for j in widxs
            ]
            line_obj.words.append(word_obj)

        if line_obj.words:
            page_obj.lines.append(line_obj)

    # (xiv) page angle from orientation-0 baseline slopes.
    rises = [
        l.baseline[0] for l in page_obj.lines
        if l.orientation == 0 and abs(l.baseline[0]) < 0.3
    ]
    rise_median = mean50(rises) or 0
    page_obj.angle = math.asin(rise_median) * (180 / math.pi)

    # (xv) paragraphs.
    if page_obj.lines:
        assign_paragraphs(page_obj, page_obj.angle)

    return page_obj
