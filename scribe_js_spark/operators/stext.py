"""mupdf stext XML page converter.

Semantics of /root/reference/js/import/convertPageStext.js:24-701:
``dir=`` -> orientation (:58-67), ``<font>`` runs -> style
(bold/italic/small-caps from the face name, :361-374), words split on
space ``<char>`` elements (:83), superscript detection from
baseline+size deltas at font changes (:287-337), small-caps-by-resize
detection with title-case lowercasing (:581-592), char bboxes from
quad+origin (:390-419), baseline offset from the first non-superscript
char origin (:421-436, :501), line bbox recomputed from words (:627),
paragraphs = ``<block>`` elements (:635-659).

Note: stext pages do NOT run pass3 — mupdf output already carries real
Unicode (no OCR quote/dash/ligature fixing), matching the reference.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round, mean50, round6
from ..functions.textnorm import calc_lang, unescape_xml
from ..model import Bbox, OcrChar, OcrLine, OcrPage, OcrPar, OcrWord, bbox_union, update_line_bbox

_PAGE_DIMS_RE = re.compile(
    r"<page .+?width=['\"]([\d.-]+)['\"] height=['\"]([\d.-]+)['\"]")
_WORD_SPLIT_RE = re.compile(r"(?:<char[^>]*?c=['\"]\s+['\"]\s*/>)", re.I)
_CHAR_RE = re.compile(
    r"(<font[^>]+>\s*)|<char quad=['\"](\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)"
    r"(\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)(\s*[\d.-]+)"
    r"[^>]*?x=['\"]([\d.-]+)[^>]*?y=['\"]([\d.-]+)['\"]"
    r"([^>]*?c=['\"][^'\"]+['\"])\s*/>",
    re.I,
)
_BLOCK_OPEN_RE = re.compile(r"<block[^>]*?>", re.I)
_PRE_CHAR_RE = re.compile(r"[\s\S]*?(?=<char)")
_DIR_ATTR_RE = re.compile(r"dir=['\"](\s*[\d.-]+)(\s*[\d.-]+)")
_FONT_TAG_RE = re.compile(r"<font[^>]+")
_NAME_ATTR_RE = re.compile(r"name=['\"]([^'\"]*)")
_SIZE_ATTR_RE = re.compile(r"size=['\"]([^'\"]*)")
_FLAGS_ATTR_RE = re.compile(r"flags=['\"]([^'\"]*)")
_C_ATTR_RE = re.compile(r"c=['\"]([^'\"]*)")
_LINE_BBOX_RE = re.compile(
    r"bbox(?:es)?=['\"](\s*[\d.-]+)(\s*[\d.-]+)?(\s*[\d.-]+)?(\s*[\d.-]+)?")
_FONT_SUFFIX_RE = re.compile(r"-.+")
_SMALLCAPS_FONT_RE = re.compile(r"(small\W?cap)|(sc$)|(caps$)", re.I)
_ITALIC_FONT_RE = re.compile(r"italic|oblique", re.I)
_ITALIC_FONT_RE2 = re.compile(r"-\w*ital", re.I)
_ITALIC_FONT_RE3 = re.compile(r"-it$", re.I)
_BOLD_FONT_RE = re.compile(r"bold|black", re.I)
_ALNUM_START_RE = re.compile(r"[A-Za-z\d]")

# Per-font-name style verdicts memoized: a document uses a handful of
# font names but the converter re-derives style per font *change*.
_font_style_memo: dict = {}


def _font_style(name: str) -> tuple:
    v = _font_style_memo.get(name)
    if v is None:
        if len(_font_style_memo) > 4096:
            _font_style_memo.clear()
        v = _font_style_memo[name] = (
            bool(_SMALLCAPS_FONT_RE.search(name)),
            bool(_ITALIC_FONT_RE.search(name)
                 or _ITALIC_FONT_RE2.search(name)
                 or _ITALIC_FONT_RE3.search(name)),
            bool(_BOLD_FONT_RE.search(name)),
        )
    return v


def clean_family_name(family: str | None) -> str:
    """Strip subset prefix and face suffixes (miscUtils.js:609)."""
    if not family:
        return "Default"
    fam = re.sub(r"^[A-Z]{6}\+", "", family)
    fam = re.sub(r"-.*$", "", fam)
    return fam or "Default"


def _orient_char_bbox(orientation, g, origin, page_w, page_h,
                      _f=math.floor):
    # js_round inlined (Math.round = floor(x + 0.5)) and the
    # orientation quad remap fused with the bbox formulas so no
    # per-char quad dict is built: ``g`` is the raw 8-float quad
    # (ulx uly urx ury llx lly lrx lry in stream order) and each
    # branch composes the reference's remap + projection directly.
    # This runs once per <char> and dominated the converter's profile.
    if orientation == 0:
        return Bbox(
            _f(origin[0] + 0.5),
            _f(min(g[1], g[3]) + 0.5),
            _f(origin[0] + (g[2] - g[0]) + 0.5),
            _f(max(g[5], g[7]) + 0.5))
    if orientation == 1:
        return Bbox(
            _f(origin[1] + 0.5),
            _f(page_w - max(g[0], g[2]) + 0.5),
            _f(origin[1] + (g[3] - g[1]) + 0.5),
            _f(page_w - min(g[4], g[6]) + 0.5))
    if orientation == 2:
        return Bbox(
            _f(page_w - origin[0] + 0.5),
            _f(page_h - max(g[3], g[1]) + 0.5),
            _f(page_w - origin[0] + (g[4] - g[6]) + 0.5),
            _f(page_h - min(g[7], g[5]) + 0.5))
    if orientation == 3:
        return Bbox(
            _f(page_h - origin[1] + 0.5),
            _f(min(g[2], g[0]) + 0.5),
            _f(page_h - origin[1] + (g[5] - g[7]) + 0.5),
            _f(max(g[6], g[4]) + 0.5))
    return Bbox(
        _f(origin[0] + 0.5),
        _f(min(g[1], g[3]) + 0.5),
        _f(origin[0] + (g[2] - g[0]) + 0.5),
        _f(max(g[5], g[7]) + 0.5))


def convert_page_stext(ocr_str: str, n: int):
    m = _PAGE_DIMS_RE.search(ocr_str)
    if not m:
        raise ValueError("Page dimensions not found in stext.")
    page_dims = {"height": int(float(m.group(2))),
                 "width": int(float(m.group(1)))}
    page_obj = OcrPage(n, page_dims)
    page_obj.textSource = "stext"

    angle_rise_page = []
    lang_set = set()

    def convert_line(xml_line: str):
        xml_line = _BLOCK_OPEN_RE.sub("", xml_line, count=1)
        m_pre = _PRE_CHAR_RE.match(xml_line)
        if not m_pre or m_pre.group(0) == "":
            pre = _PRE_CHAR_RE.match(xml_line)
        pre = m_pre.group(0) if m_pre else None
        if not pre:
            return None

        dm = _DIR_ATTR_RE.search(pre)
        direction = [float(dm.group(1)), float(dm.group(2))] if dm else None

        orientation = 0
        if direction:
            if abs(direction[0]) < 0.5 and direction[1] >= 0.5:
                orientation = 1
            elif direction[0] <= -0.5 and abs(direction[1]) < 0.5:
                orientation = 2
            elif abs(direction[0]) < 0.5 and direction[1] <= -0.5:
                orientation = 3

        fm = _FONT_TAG_RE.search(pre)
        font_name = None
        font_size_line = 10.0
        if fm:
            nm = _NAME_ATTR_RE.search(fm.group(0))
            sm = _SIZE_ATTR_RE.search(fm.group(0))
            if nm:
                font_name = nm.group(1)
            if sm:
                font_size_line = float(sm.group(1))
        font_family_line = _FONT_SUFFIX_RE.sub("", font_name) if font_name else "Default"

        lb = _LINE_BBOX_RE.search(pre)
        if not lb:
            return None
        line_box_arr = [max(float(g), 0) for g in lb.groups() if g is not None]

        word_strs = _WORD_SPLIT_RE.split(xml_line)
        if word_strs and word_strs[-1].strip() == "</font>":
            word_strs.pop()
        word_strs = [w for w in word_strs if w.strip() != ""]
        if not word_strs:
            return None

        # Parse each word fragment into a sequence of font-change / char
        # records (reference wordCharOrFontArr, :168-235).
        word_items = []
        for ws in word_strs:
            items = []
            for cm in _CHAR_RE.finditer(ws):
                font_str = cm.group(1)
                if font_str is not None:
                    nm = _NAME_ATTR_RE.search(font_str)
                    sm = _SIZE_ATTR_RE.search(font_str)
                    if nm is not None and sm is not None:
                        items.append({
                            "name": nm.group(1), "size": float(sm.group(1))})
                    continue
                # Raw quad floats in stream order; the orientation
                # remap is fused into _orient_char_bbox.
                g = (float(cm.group(2)), float(cm.group(3)),
                     float(cm.group(4)), float(cm.group(5)),
                     float(cm.group(6)), float(cm.group(7)),
                     float(cm.group(8)), float(cm.group(9)))
                rest = cm.group(12) or ""
                fl = (_FLAGS_ATTR_RE.search(rest)
                      if "flags=" in rest else None)
                tx = _C_ATTR_RE.search(rest)
                items.append({
                    "quad": g,
                    "origin": (float(cm.group(10)), float(cm.group(11))),
                    "flags": int(fl.group(1)) if fl else None,
                    "text": tx.group(1) if tx else None,
                })
            word_items.append(items)

        # Drop trailing end-of-line font change (reference :186).
        if word_items and word_items[-1] and "name" in word_items[-1][-1]:
            word_items[-1].pop()

        bboxes, text_arr = [], []
        bold_arr, italic_arr, underline_arr = [], [], []
        smallcaps_arr, smallcaps_alt_arr, smallcaps_alt_tc_arr = [], [], []
        font_family_arr, font_size_arr, super_arr = [], [], []

        baseline_first_done = False
        baseline_first = []
        baseline_current = 0.0
        bold_current = False
        italic_current = False
        family_current = "Default"
        size_current_raw = 0.0
        size_current = 0.0
        super_current = False
        smallcaps_current = None
        smallcaps_current_alt = None

        for i in range(len(word_items)):
            text_word = []
            bboxes_word = []
            underline_word = []
            font_family = family_current or font_family_line or "Default"
            font_size_word = size_current or font_size_line or 10.0
            smallcaps_word = smallcaps_current or False
            smallcaps_word_alt = smallcaps_current_alt or False
            smallcaps_word_alt_tc = False
            bold_word = False
            italic_word = False

            if not word_items[i]:
                continue
            word_char_n = 0

            for j, item in enumerate(word_items[i]):
                if "name" in item:
                    size_prev_raw = size_current_raw
                    size_current_raw = item["size"]
                    second_letter = (
                        word_char_n > 0 and len(text_word) == 1
                        and bool(re.match(r"[A-Z]", text_word[0])))

                    baseline_next = None
                    for cand in (
                            word_items[i][j + 1:j + 2]
                            + (word_items[i + 1][:3]
                               if i + 1 < len(word_items) else [])):
                        if "origin" in cand:
                            baseline_next = cand["origin"][1]
                            break

                    font_size_min = min(size_current_raw, size_prev_raw)
                    baseline_delta = (
                        (baseline_next - baseline_current) / font_size_min
                        if (baseline_next is not None and font_size_min)
                        else float("nan"))
                    size_delta = (
                        (size_current_raw - size_prev_raw) / font_size_min
                        if font_size_min else float("nan"))

                    if (second_letter and size_current_raw < size_prev_raw
                            and size_prev_raw > 0 and baseline_next
                            and abs(baseline_delta) < 0.1):
                        smallcaps_current_alt = True
                        smallcaps_word_alt = True
                        smallcaps_word_alt_tc = True
                    elif (math.isfinite(baseline_delta)
                          and math.isfinite(size_delta)
                          and ((baseline_delta < -0.25 and size_delta < -0.05)
                               or (baseline_delta > 0.25 and size_delta > 0.05))):
                        if text_word:
                            text_arr.append(text_word)
                            bboxes.append(bboxes_word)
                            bold_arr.append(bold_word)
                            italic_arr.append(italic_word)
                            underline_arr.append(
                                sum(underline_word) / len(underline_word) > 0.5
                                if underline_word else False)
                            font_family_arr.append(font_family)
                            font_size_arr.append(
                                size_prev_raw if size_delta > 0 else font_size_word)
                            smallcaps_arr.append(smallcaps_word)
                            smallcaps_alt_arr.append(smallcaps_word_alt)
                            smallcaps_alt_tc_arr.append(smallcaps_word_alt_tc)
                            super_arr.append(size_delta > 0)
                            text_word = []
                            bboxes_word = []
                        if size_delta > 0:
                            if not baseline_first_done:
                                baseline_first.clear()
                            family_current = item["name"] or family_current
                            size_current = size_current_raw or size_current
                            font_size_word = size_current
                            font_family = family_current
                            if super_arr:
                                super_arr[-1] = True
                        if super_arr and not super_arr[-1] and baseline_first:
                            baseline_first_done = True
                        super_current = size_delta < 0
                    else:
                        size_current = size_current_raw or size_current
                        family_current = item["name"] or family_current
                        if not text_word:
                            font_size_word = size_current
                            font_family = family_current
                        if math.isfinite(size_delta) and abs(size_delta) > 0.05:
                            smallcaps_current_alt = False
                            if not text_word:
                                super_current = False
                                smallcaps_word_alt = False
                                smallcaps_word_alt_tc = False

                    if smallcaps_current_alt is None:
                        smallcaps_current_alt = (
                            smallcaps_alt_arr[-1] if smallcaps_alt_arr else None)
                    (smallcaps_current, italic_current,
                     bold_current) = _font_style(item["name"])
                    smallcaps_word = smallcaps_current
                    continue

                baseline_current = item["origin"][1]

                if word_char_n == 0 or (
                        word_char_n < 3
                        and _ALNUM_START_RE.match(item["text"] or "")):
                    bold_word = bold_current
                    italic_word = italic_current
                    word_char_n += 1

                bbox = _orient_char_bbox(
                    orientation, item["quad"], item["origin"],
                    page_dims["width"], page_dims["height"])

                if not super_current and not baseline_first:
                    if orientation == 1:
                        origin_y = page_dims["width"] - item["origin"][0]
                    elif orientation == 2:
                        origin_y = page_dims["height"] - item["origin"][1]
                    elif orientation == 3:
                        origin_y = item["origin"][0]
                    else:
                        origin_y = item["origin"][1]
                    baseline_first.extend([bbox.left, origin_y])

                if smallcaps_current_alt is None:
                    smallcaps_current_alt = (
                        smallcaps_alt_arr[-1] if smallcaps_alt_arr else None)

                text_word.append(item["text"])
                underline_word.append(item["flags"] == 2)
                bboxes_word.append(bbox)

            if not text_word:
                continue

            underline_arr.append(
                sum(underline_word) / len(underline_word) > 0.5
                if underline_word else False)
            text_arr.append(text_word)
            bboxes.append(bboxes_word)
            bold_arr.append(bold_word)
            italic_arr.append(italic_word)
            font_family_arr.append(font_family)
            font_size_arr.append(font_size_word)
            smallcaps_alt_arr.append(smallcaps_word_alt)
            smallcaps_arr.append(smallcaps_word)
            smallcaps_alt_tc_arr.append(smallcaps_word_alt_tc)
            # Superscripts are only one word long (:466-471).
            if super_current and super_arr and super_arr[-1]:
                super_arr[-1] = False
                super_current = False
            super_arr.append(super_current)
            if super_current:
                font_size_arr[-1] = size_current_raw

        if not bboxes:
            return None

        baseline_slope = 0.0
        if direction and not any(math.isnan(d) for d in direction):
            if orientation == 1:
                baseline_slope = -direction[0]
            elif orientation == 2:
                baseline_slope = -direction[1]
            elif orientation == 3:
                baseline_slope = direction[0]
            else:
                baseline_slope = direction[1]

        line_bbox = Bbox(*line_box_arr[:4])
        baseline_point = (
            (baseline_first[1] - line_bbox.bottom) if baseline_first else 0)
        baseline_point = baseline_point or 0
        baseline_out = [round6(baseline_slope), js_round(baseline_point)]
        line_obj = OcrLine(
            page_obj, line_bbox, baseline_out, font_size_line * 0.6, None)
        line_obj.orientation = orientation

        letters_kept = 0
        for i in range(len(text_arr)):
            word_text = unescape_xml("".join(text_arr[i]))
            if word_text.strip() == "":
                continue
            word_lang = calc_lang(word_text)
            lang_set.add(word_lang)
            wid = f"word_{n + 1}_{len(page_obj.lines) + 1}_{i + 1}"
            bboxes_i = bboxes[i]
            char_objs = []
            if word_lang == "chi_sim":
                for j, t in enumerate(text_arr[i]):
                    w = OcrWord(line_obj, f"{wid}_{j}", unescape_xml(t),
                                bboxes_i[j])
                    w.conf = 100
                    w.lang = word_lang
                    w.visualCoords = False
                    line_obj.words.append(w)
                    letters_kept += 1
                continue
            for j, t in enumerate(text_arr[i]):
                char_objs.append(OcrChar(unescape_xml(t), bboxes_i[j]))
            bbox = bbox_union(bboxes_i)
            if bbox.left < 0 and bbox.right < 0:
                continue
            word_obj = OcrWord(line_obj, wid, word_text, bbox)
            word_obj.style.size = font_size_arr[i]
            word_obj.lang = word_lang
            word_obj.chars = char_objs
            word_obj.visualCoords = False
            word_obj.conf = 100
            if (smallcaps_alt_arr[i]
                    and not re.search(r"[a-z]", word_obj.text)
                    and re.search(r"[A-Z].?[A-Z]", word_obj.text)):
                word_obj.style.smallCaps = True
                chars = word_obj.chars
                if smallcaps_alt_tc_arr[i]:
                    for c in chars[1:]:
                        c.text = c.text.lower()
                else:
                    for c in chars:
                        c.text = c.text.lower()
                word_obj.text = "".join(c.text for c in chars)
            elif smallcaps_arr[i]:
                word_obj.style.smallCaps = True
            if italic_arr[i]:
                word_obj.style.italic = True
            if bold_arr[i]:
                word_obj.style.bold = True
            word_obj.style.font = font_family_arr[i]
            word_obj.style.sup = super_arr[i]
            word_obj.style.underline = underline_arr[i]
            line_obj.words.append(word_obj)
            letters_kept += 1

        if letters_kept == 0:
            return None

        update_line_bbox(line_obj)
        page_obj.lines.append(line_obj)
        par_line_arr.append(line_obj)
        return baseline_slope

    par_line_arr: list = []

    def convert_par(xml_par: str) -> None:
        nonlocal par_line_arr
        par_line_arr = []
        for line_str in xml_par.split("</line>"):
            angle = convert_line(line_str)
            if (isinstance(angle, (int, float)) and not math.isnan(angle)
                    and abs(angle) < 0.3):
                angle_rise_page.append(angle)
        if not par_line_arr:
            return
        par_obj = OcrPar(page_obj, bbox_union([l.bbox for l in par_line_arr]))
        for l in par_line_arr:
            l.par = par_obj
        par_obj.lines = list(par_line_arr)
        page_obj.pars.append(par_obj)

    for par_str in ocr_str.split("</block>"):
        convert_par(par_str)

    rise_median = mean50(angle_rise_page) or 0
    page_obj.angle = math.asin(rise_median) * (180 / math.pi)

    return page_obj, lang_set
