"""ABBYY FineReader XML page converter.

Port-fresh implementation of the semantics in
/root/reference/js/import/convertPageAbbyy.js:30-474:

- page ``rotation`` -> page orientation (:40-49; note ABBYY defines page
  rotation as applied to the *image*, so it is inverted vs text),
- ``<charParams>`` char boxes, orientation-transformed (:252-280),
- line split into words on space chars / formatting changes
  (``abbyySplitRegex``, :19 — with the tab / blank-char / lone-period
  fixups :129-165),
- per-word italic/bold/underline/sup/smallcaps/dropcap from
  ``<formatting>`` (:194-234),
- baseline slope re-fit from char bottoms (:299-311 — ABBYY's own
  baseline attribute is untrusted :96-98),
- line bbox recomputed as the union of char boxes > 0 (:322-330),
- conf = 0 when any char ``suspicious`` else 100 (:390),

then the shared ``pass3``.
"""

from __future__ import annotations

import math
import re

from ..functions.stats import js_round, mean50, quantile, round6
from ..functions.textnorm import ASC_CHARS, X_CHARS, unescape_xml
from ..model import Bbox, OcrChar, OcrLine, OcrPage, OcrPar, OcrWord, bbox_union
from .shared import pass3

_TEXT_TAG_RE = re.compile(r"<text[^>]*>")
_ORIENT_ATTR_RE = re.compile(r"orientation=['\"](\w+)['\"]")
_PRE_CHARPARAMS_RE = re.compile(r"[\s\S]*?(?=<charParams)")
_FORMATTING_TAG_RE = re.compile(r"<formatting[^>]+")
_FF_ATTR_RE = re.compile(r"ff=['\"]([^'\"]*)")
_ISTAB_RE = re.compile(r"isTab=['\"](?:1|true)['\"][^>]*>[^<]+", re.I)
_BLANK_AFTER_FMT_RE = re.compile(
    r"(</formatting><formatting[^>]*>\s*)<charParams[^>]*>\s*</charParams>",
    re.I)
_BLANK_BEFORE_FMT_RE = re.compile(
    r"<charParams[^>]*>\s*</charParams>(\s*</formatting><formatting[^>]*>\s*)",
    re.I)
_LEADING_FMT_RE = re.compile(r"(<formatting[^>]+>\s*)", re.I)
_DROPCAP_RE = re.compile(r"<par dropCapCharsCount=['\"](\d*)", re.I)
_LINEBOX_RE = re.compile(
    r"<line baseline=['\"](\d*)['\"] l=['\"](\d*)['\"] t=['\"](\d*)['\"]"
    r" r=['\"](\d*)['\"] b=['\"](\d*)['\"]>",
    re.I,
)
_SPLIT_RE = re.compile(
    r"(?:<charParams[^>]*>\s*</charParams>)|(?:</formatting>\s*(?=<formatting))",
    re.I,
)
_CHAR_RE = re.compile(
    r"(<formatting[^>]+>\s*)?<charParams l=['\"](\d*)['\"] t=['\"](\d*)['\"]"
    r" r=['\"](\d*)['\"] b=['\"](\d*)['\"](?: suspicious=['\"](\w*)['\"])?[^>]*>"
    r"([^<]*)</charParams>",
    re.I,
)
_SUP_ATTR_RE = re.compile(r"superscript=['\"](1|true)", re.I)
_ITALIC_ATTR_RE = re.compile(r"italic=['\"](1|true)", re.I)
_BOLD_ATTR_RE = re.compile(r"bold=['\"](1|true)", re.I)
_UNDERLINE_ATTR_RE = re.compile(r"underline=['\"](1|true)", re.I)
_SMALLCAPS_ATTR_RE = re.compile(r"smallcaps=['\"](1|true)", re.I)
_WORD_CONTENT_RE = re.compile(r">([^<>]+?)(?=</charParams>)")

# Formatting-attr verdicts memoized by the leading formatting string —
# a document reuses a handful of formatting shapes but the converter
# re-tested five regexes per word.
_fmt_memo: dict = {}


def _fmt_flags(fmt: str) -> tuple:
    v = _fmt_memo.get(fmt)
    if v is None:
        if len(_fmt_memo) > 4096:
            _fmt_memo.clear()
        v = _fmt_memo[fmt] = (
            bool(_SUP_ATTR_RE.search(fmt)),
            bool(_ITALIC_ATTR_RE.search(fmt)),
            bool(_BOLD_ATTR_RE.search(fmt)),
            bool(_UNDERLINE_ATTR_RE.search(fmt)),
            bool(_SMALLCAPS_ATTR_RE.search(fmt)),
        )
    return v


def _orient_bbox(raw_l, raw_t, raw_r, raw_b, orientation, page_w, page_h,
                 _f=math.floor):
    # js_round inlined (Math.round = floor(x + 0.5)); once per charParams.
    if orientation == 0:
        return Bbox(_f(raw_l + 0.5), _f(raw_t + 0.5),
                    _f(raw_r + 0.5), _f(raw_b + 0.5))
    if orientation == 1:
        return Bbox(
            _f(raw_t + 0.5),
            _f(page_w - max(raw_r, raw_l) + 0.5),
            _f(raw_b + 0.5),
            _f(page_w - raw_l + 0.5),
        )
    if orientation == 2:
        return Bbox(
            _f(page_w - raw_r + 0.5),
            _f(page_h - raw_b + 0.5),
            _f(page_w - raw_l + 0.5),
            _f(page_h - raw_t + 0.5),
        )
    if orientation == 3:
        return Bbox(
            _f(page_h - raw_b + 0.5),
            _f(raw_l + 0.5),
            _f(page_h - raw_t + 0.5),
            _f(max(raw_r, raw_r) + 0.5),
        )
    return Bbox(_f(raw_l + 0.5), _f(raw_t + 0.5),
                _f(raw_r + 0.5), _f(raw_b + 0.5))


_TABLE_BLOCK_RE = re.compile(
    r"<block blockType=[\"']Table[\s\S]+?(?:</block>\s*)", re.I)
_TABLE_COORDS_RE = re.compile(
    r"<block blockType=['\"]Table['\"][^>]*?l=['\"](\d+)['\"]"
    r" t=['\"](\d+)['\"] r=['\"](\d+)['\"] b=['\"](\d+)['\"]", re.I)
_ROW_RE = re.compile(r"<row[\s\S]+?(?:</row>\s*)")
_CELL_RE = re.compile(r"<cell[\s\S]+?(?:</cell>\s*)", re.I)
_CELL_WIDTH_RE = re.compile(r"width=['\"](\d+)['\"]")
_COORDS4_RE = re.compile(
    r"l=['\"](\d+)['\"] t=['\"](\d+)['\"] r=['\"](\d+)['\"]"
    r" b=['\"](\d+)['\"]", re.I)


def convert_table_layout_abbyy(ocr_str: str) -> list[dict]:
    """Table layout from ABBYY ``blockType="Table"`` blocks
    (convertTableLayoutAbbyy, convertPageAbbyy.js:480-632): column
    boxes from the first non-colSpan row's cell widths; when the widths
    don't sum to the table width (ABBYY sometimes emits bad widths),
    columns are rebuilt from the cells' content coordinates (min left /
    max right per column, midpoints between neighbors, row-spanning
    observations filtered). Row bounds are each row's max content
    bottom."""
    tables = []
    for table_str in _TABLE_BLOCK_RE.findall(ocr_str):
        m = _TABLE_COORDS_RE.search(table_str)
        if not m:
            continue
        tl, tt, tr, tb = (int(v) for v in m.groups())
        rows = _ROW_RE.findall(table_str)
        if not rows:
            continue
        first_row = (rows[1] if len(rows) > 1 and "colSpan" in rows[0]
                     else rows[0])
        first_cells = _CELL_RE.findall(first_row)
        if not first_cells:
            continue
        left_last = tl
        boxes = []
        for cell in first_cells:
            wm = _CELL_WIDTH_RE.search(cell)
            width = int(wm.group(1)) if wm else 0
            boxes.append((left_last, tt, left_last + width, tb))
            left_last += width
        if abs(left_last - tr) > 10:
            col_left: list[list[int]] = []
            col_right: list[list[int]] = []
            for row_str in rows:
                for k, cell in enumerate(_CELL_RE.findall(row_str)):
                    coords = [tuple(int(x) for x in g)
                              for g in _COORDS4_RE.findall(cell)]
                    if not coords:
                        continue
                    while len(col_left) <= k:
                        col_left.append([])
                        col_right.append([])
                    col_left[k].append(min(c[0] for c in coords))
                    col_right[k].append(max(c[2] for c in coords))
            col_left = [c for c in col_left if c]
            col_right = [c for c in col_right if c]
            col_left_min = [min(c) for c in col_left]
            col_right_max = []
            for j in range(len(col_right)):
                vals = (col_right[j] if j + 1 == len(col_right)
                        else [x for x in col_right[j]
                              if x < col_left_min[j + 1]])
                col_right_max.append(max(vals) if vals
                                     else float("-inf"))
            boxes = []
            for j in range(len(col_left)):
                if j == 0:
                    cell_left = tl
                elif not math.isfinite(col_right_max[j - 1]):
                    cell_left = js_round(col_left_min[j])
                else:
                    cell_left = js_round(
                        (col_left_min[j] + col_right_max[j - 1]) / 2)
                if j + 1 == len(col_left):
                    cell_right = tr
                elif not math.isfinite(col_right_max[j]):
                    cell_right = col_left_min[j + 1]
                else:
                    cell_right = js_round(
                        (col_left_min[j + 1] + col_right_max[j]) / 2)
                boxes.append((cell_left, tt, cell_right, tb))
        row_bounds = []
        for row_str in rows:
            max_bottom = 0
            for g in _COORDS4_RE.findall(row_str):
                b = int(g[3])
                if b > max_bottom:
                    max_bottom = b
            row_bounds.append(max_bottom)
        tables.append({
            "bbox": Bbox(tl, tt, tr, tb),
            "columns": boxes,
            "row_bounds": row_bounds,
            "method": "abbyy",
        })
    return tables


def convert_page_abbyy(ocr_str: str, n: int):
    page_attr = re.search(r"<page[^>]*>", ocr_str)
    width_m = re.search(r"width=['\"](\d+)['\"]", page_attr.group(0)) if page_attr else None
    height_m = re.search(r"height=['\"](\d+)['\"]", page_attr.group(0)) if page_attr else None
    rotation_m = re.search(r"rotation=['\"](\w+)['\"]", page_attr.group(0)) if page_attr else None

    if not width_m or not height_m:
        raise ValueError("Failed to parse page dimensions.")

    rotation = rotation_m.group(1) if rotation_m else None
    page_orientation = {"RotatedClockwise": 3, "RotatedUpsidedown": 2,
                        "RotatedCounterclockwise": 1}.get(rotation, 0)

    page_dims = {"height": int(height_m.group(1)), "width": int(width_m.group(1))}
    page_obj = OcrPage(n, page_dims)
    page_obj.textSource = "abbyy"
    page_obj.tables = convert_table_layout_abbyy(ocr_str)

    if not re.search(r"<charParams", ocr_str, re.I):
        return page_obj, set()

    angle_rise_page = []

    def convert_text(xml_text: str) -> None:
        text_attr = _TEXT_TAG_RE.search(xml_text)
        orient_m = (
            _ORIENT_ATTR_RE.search(text_attr.group(0))
            if text_attr else None
        )
        text_orientation = {"RotatedClockwise": 1, "RotatedUpsidedown": 2,
                            "RotatedCounterclockwise": 3}.get(
            orient_m.group(1) if orient_m else None, 0)
        orientation_final = (page_orientation + text_orientation) % 4

        def convert_line(xml_line: str):
            baseline_slopes = []
            baseline_first = []

            pre_char = _PRE_CHARPARAMS_RE.match(xml_line)
            fmt_tag = (
                _FORMATTING_TAG_RE.search(pre_char.group(0))
                if pre_char else None
            )
            font_name = None
            if fmt_tag:
                fm = _FF_ATTR_RE.search(fmt_tag.group(0))
                if fm:
                    font_name = fm.group(1)

            drop_cap = False
            dc = _DROPCAP_RE.search(xml_line)
            if dc and dc.group(1) and int(dc.group(1)) > 0:
                drop_cap = True

            lb = _LINEBOX_RE.search(xml_line)
            if not lb:
                return None
            line_box_attr = [int(g) for g in lb.groups()]

            # Tab chars become spaces so they split into separate words
            # (:129). Gated on containment: each re.sub copies the line
            # string, and most lines carry neither tabs nor mid-line
            # formatting switches.
            if "isTab" in xml_line:
                xml_line = _ISTAB_RE.sub("> ", xml_line)
            # Blank chars adjacent to formatting changes (:134-135).
            if "</formatting><formatting" in xml_line:
                xml_line = _BLANK_AFTER_FMT_RE.sub(r"\1", xml_line)
                xml_line = _BLANK_BEFORE_FMT_RE.sub(r"\1", xml_line)

            word_str_arr1 = _SPLIT_RE.split(xml_line)

            word_str_arr = []
            for piece in word_str_arr1:
                matches = _WORD_CONTENT_RE.findall(piece)
                if not matches:
                    continue
                if len(matches) == 1 and matches[0] == ".":
                    if word_str_arr and not _SUP_ATTR_RE.search(word_str_arr[-1]):
                        word_str_arr[-1] = word_str_arr[-1] + _LEADING_FMT_RE.sub(
                            "", piece, count=1)
                        continue
                word_str_arr.append(piece)

            if not word_str_arr:
                return None

            n_words = len(word_str_arr)
            bboxes: list[list[Bbox]] = [[] for _ in range(n_words)]
            texts = [""] * n_words
            char_objs: list[list[OcrChar]] = [[] for _ in range(n_words)]
            italic_arr = [False] * n_words
            bold_arr = [False] * n_words
            underline_arr = [False] * n_words
            sup_arr = [False] * n_words
            dropcap_arr = [False] * n_words
            smallcaps_arr = [False] * n_words
            word_susp = [False] * n_words

            for i, word_str in enumerate(word_str_arr):
                letter_arr = [m.groups() for m in _CHAR_RE.finditer(word_str)]
                if not letter_arr:
                    continue
                fmt = letter_arr[0][0]
                if fmt is not None:
                    sup_f, it_f, bd_f, ul_f, sc_f = _fmt_flags(fmt)
                    if drop_cap and i == 0:
                        dropcap_arr[i] = True
                    elif sup_f:
                        sup_arr[i] = True
                    else:
                        if it_f:
                            italic_arr[i] = True
                        if bd_f:
                            bold_arr[i] = True
                        if ul_f:
                            underline_arr[i] = True
                    if sc_f:
                        smallcaps_arr[i] = True
                elif i > 0 and not dropcap_arr[i - 1]:
                    italic_arr[i] = italic_arr[i - 1]
                    bold_arr[i] = bold_arr[i - 1]
                    underline_arr[i] = underline_arr[i - 1]
                    sup_arr[i] = sup_arr[i - 1]
                    smallcaps_arr[i] = smallcaps_arr[i - 1]

                drop_cap_fix = False
                if drop_cap and i == 1 and smallcaps_arr[i]:
                    smallcaps_arr[i] = False
                    drop_cap_fix = True

                for letter in letter_arr:
                    # Skip letters placed at coordinate 0 (:242).
                    if letter[1] == "0":
                        continue
                    raw_l, raw_t = int(letter[1]), int(letter[2])
                    raw_r, raw_b = int(letter[3]), int(letter[4])
                    bbox = _orient_bbox(
                        raw_l, raw_t, raw_r, raw_b, orientation_final,
                        page_dims["width"], page_dims["height"])
                    bboxes[i].append(bbox)

                    letter_susp = False
                    if letter[5] in ("1", "true"):
                        word_susp[i] = True
                        letter_susp = True

                    ch = letter[6]
                    if drop_cap_fix:
                        ch = ch.upper()
                    ch = unescape_xml(ch)

                    asc_char = ch in ASC_CHARS
                    x_char = ch in X_CHARS
                    if (asc_char or x_char) and not letter_susp and not drop_cap_fix \
                            and not (drop_cap and i == 0):
                        if not baseline_first:
                            baseline_first.extend([bbox.left, bbox.bottom])
                        else:
                            dx = bbox.left - baseline_first[0]
                            if dx != 0:
                                slope = (bbox.bottom - baseline_first[1]) / dx
                                if math.isfinite(slope):
                                    baseline_slopes.append(slope)

                    texts[i] += ch
                    char_objs[i].append(OcrChar(ch, bbox))

            all_boxes = [b for word_boxes in bboxes for b in word_boxes]
            calc_l = min((b.left for b in all_boxes if b.left > 0), default=math.inf)
            calc_t = min((b.top for b in all_boxes if b.top > 0), default=math.inf)
            calc_r = max((b.right for b in all_boxes if b.right > 0), default=-math.inf)
            calc_b = max((b.bottom for b in all_boxes if b.bottom > 0), default=-math.inf)

            baseline_slope = quantile(baseline_slopes, 0.5) or 0

            if baseline_first:
                baseline_point = baseline_first[1] - (
                    calc_b if math.isfinite(calc_b) else line_box_attr[4])
                if baseline_slope < 0:
                    baseline_point -= baseline_slope * (
                        baseline_first[0]
                        - (calc_l if math.isfinite(calc_l) else line_box_attr[1]))
            else:
                baseline_point = 0
            baseline_point = baseline_point or 0

            if all(math.isfinite(v) for v in (calc_l, calc_t, calc_r, calc_b)):
                line_bbox = Bbox(calc_l, calc_t, calc_r, calc_b)
            else:
                line_bbox = Bbox(
                    line_box_attr[1], line_box_attr[2],
                    line_box_attr[3], line_box_attr[4])

            baseline_out = [round6(baseline_slope), js_round(baseline_point)]
            line_obj = OcrLine(page_obj, line_bbox, baseline_out)
            line_obj.orientation = orientation_final

            letters_kept = 0
            for i in range(n_words):
                if texts[i].strip() == "":
                    continue
                lefts = [b.left for b in bboxes[i] if b.left > 0]
                rights = [b.right for b in bboxes[i] if b.right > 0]
                tops = [b.top for b in bboxes[i] if b.top > 0]
                bottoms = [b.bottom for b in bboxes[i] if b.bottom > 0]
                if not lefts or not rights or not tops or not bottoms:
                    continue
                bbox_word = Bbox(min(lefts), min(tops), max(rights), max(bottoms))
                wid = f"word_{n + 1}_{len(page_obj.lines) + 1}_{i + 1}"
                word_obj = OcrWord(line_obj, wid, texts[i], bbox_word)
                word_obj.chars = char_objs[i]
                word_obj.conf = 0 if word_susp[i] else 100
                if italic_arr[i]:
                    word_obj.style.italic = True
                if bold_arr[i]:
                    word_obj.style.bold = True
                if underline_arr[i]:
                    word_obj.style.underline = True
                word_obj.style.smallCaps = smallcaps_arr[i]
                if font_name:
                    word_obj.style.font = font_name
                if sup_arr[i]:
                    word_obj.style.sup = True
                elif dropcap_arr[i]:
                    word_obj.style.dropcap = True
                line_obj.words.append(word_obj)
                letters_kept += 1

            if letters_kept == 0:
                return None

            page_obj.lines.append(line_obj)
            par_line_arr.append(line_obj)
            return baseline_slope

        def convert_par(xml_par: str) -> None:
            nonlocal par_line_arr
            par_line_arr = []
            for line_str in xml_par.split("</line>"):
                angle = convert_line(line_str)
                if isinstance(angle, (int, float)) and not math.isnan(angle):
                    angle_rise_page.append(angle)
            if not par_line_arr:
                return
            par_bbox = bbox_union([l.bbox for l in par_line_arr])
            par_obj = OcrPar(page_obj, par_bbox)
            for l in par_line_arr:
                l.par = par_obj
            par_obj.lines = list(par_line_arr)
            page_obj.pars.append(par_obj)

        par_line_arr: list = []
        for par_str in xml_text.split("</par>"):
            convert_par(par_str)

    for text_str in ocr_str.split("</text>"):
        convert_text(text_str)

    rise_median = mean50(angle_rise_page) or 0
    page_obj.angle = math.asin(rise_median) * (180 / math.pi)

    lang_set = pass3(page_obj)
    return page_obj, lang_set
