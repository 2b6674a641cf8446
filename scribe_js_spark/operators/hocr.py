"""hOCR page converter.

Regex-driven parse matching /root/reference/js/import/convertPageHocr.js:22-386:
page bbox, ``ocr_line`` spans (with caption/header/textfloat coalesced, :73-75),
per-word bbox / ``x_wconf`` / lang / ``x_font``, char-level ``ocrx_cinfo`` mode
(:48), ``<sup>``/``ocr_dropcap`` tags (:271-277), Tesseract
``x_size/x_ascenders/x_descenders`` -> ascHeight/xHeight (:132-146),
CJK per-char word split (:215-220); then the shared pass2 + pass3.
"""

from __future__ import annotations

import re

from ..functions.textnorm import get_text_script, unescape_xml
from ..model import Bbox, OcrChar, OcrLine, OcrPage, OcrWord
from .shared import pass2, pass3

_PAGE_ELEM_RE = re.compile(r"<div class=[\"']ocr_page[\"'][^>]+", re.I)
_PAGE_BBOX_RE = re.compile(r"bbox \d+ \d+ (\d+) (\d+)", re.I)
_CINFO_MODE_RE = re.compile(r"ocrx_cinfo")

_LINE_RE = re.compile(
    r"<span class=[\"']ocr_line[\s\S]+?(?:</span>\s*){2}", re.I)
_LINE_RE_CHAR = re.compile(
    r"<span class=[\"']ocr_line[\s\S]+?(?:</span>\s*)(?:</em>\s*)?(?:</span>\s*){2}",
    re.I)
_WORD_RE = re.compile(r"<span class=[\"']ocrx_word[\s\S]+?(?:</span>\s*)", re.I)
_WORD_RE_CHAR = re.compile(
    r"<span class=[\"']ocrx_word[\s\S]+?(?:</span>\s*)(?:</em>\s*)?(?:</span>\s*){1}",
    re.I)
_CHAR_RE = re.compile(
    r"<span class=[\"']ocrx_cinfo[\"'] title='([^'\"]+)[\"']>([^<]*)</span>", re.I)
_PAR_RE = re.compile(r"<p class=[\"']ocr_par[\s\S]+?(?:</p>\s*)", re.I)

_TITLE_RE = re.compile(r"title=['\"]([^'\"]+)")
_BBOX_NUMS_RE = re.compile(
    r"bbox(?:es)?(\s+[\d.-]+)(\s+[\d.-]+)?(\s+[\d.-]+)?(\s+[\d.-]+)?")
_BASELINE_RE = re.compile(r"baseline(\s+[\d.-]+)(\s+[\d.-]+)")
_WCONF_RE = re.compile(r"(?:;|\s)x_wconf\s+(\d+)")
_SUP_OPEN_RE = re.compile(r"\s*<sup>", re.I)
_SUP_CLOSE_RE = re.compile(r"</sup>\s*", re.I)
_DROPCAP_SPAN_RE = re.compile(
    r"\s*<span class=['\"]ocr_dropcap['\"]>", re.I)
_ITALIC_STYLE_RE = re.compile(r"italic", re.I)
_BOLD_STYLE_RE = re.compile(r"bold", re.I)
_SMALLCAPS_STYLE_RE = re.compile(r"small-caps", re.I)
_EM_CLOSE_SPAN_RE = re.compile(r"</em>\s*</span>")
_PAR_LANG_RE = re.compile(r"^.+?lang=['\"]([^'\"]*)['\"]", re.I)
_ID_RE = re.compile(r"id=['\"]([^'\"]*)['\"]", re.I)
_LANG_RE = re.compile(r"lang=['\"]([^'\"]*)['\"]", re.I)
_FONT_RE = re.compile(r"^[^>]+?x_font\s*([^'\";]+)")
_STYLE_RE = re.compile(r"style=['\"]([^'\"]+)")
_SUP_RE = re.compile(r"<sup>", re.I)
_DROPCAP_RE = re.compile(r"<span class=['\"]ocr_dropcap['\"]>", re.I)
_TEXT_RE = re.compile(r">([^>]*)<")
_CHAR_BBOX_RE = re.compile(r"(\d+) (\d+) (\d+) (\d+)")

_X_SIZE_RE = re.compile(r"x_size\s+([\d.-]+)")
_X_ASC_RE = re.compile(r"x_ascenders\s+([\d.-]+)")
_X_DESC_RE = re.compile(r"x_descenders\s+([\d.-]+)")
_X_ASC_HEIGHT_RE = re.compile(r"x_asc_height\s+([\d.-]+)")
_X_X_HEIGHT_RE = re.compile(r"x_x_height\s+([\d.-]+)")
_X_FSIZE_RE = re.compile(r"(?:;|\s)x_fsize\s+(\d+)")

# Containment probes gating the whole-string rewrite subs (a sub copies
# the page string; a search only scans it).
_STRONG_PROBE = re.compile(r"<strong>|</strong>", re.I)
_EM_PROBE = re.compile(r"<em>|</em>", re.I)
_HTML_PROBE = re.compile(r"<html", re.I)
_CAPTION_PROBE = re.compile(r"ocr_caption", re.I)
_TEXTFLOAT_PROBE = re.compile(r"ocr_textfloat", re.I)
_HEADER_PROBE = re.compile(r"ocr_header", re.I)


def convert_page_hocr(ocr_str: str, n: int, page_dims: dict | None = None,
                      scribe_mode: bool = False):
    """Parse one hOCR page string into an OcrPage."""
    current_lang = "eng"

    if page_dims is None:
        page_elem = _PAGE_ELEM_RE.search(ocr_str)
        if page_elem:
            m = _PAGE_BBOX_RE.search(page_elem.group(0))
            if m:
                page_dims = {"height": int(m.group(2)), "width": int(m.group(1))}
    if page_dims is None:
        raise ValueError("Failed to parse page dimensions.")

    page_obj = OcrPage(n, page_dims)
    page_obj.textSource = "hocr"

    char_mode = bool(_CINFO_MODE_RE.search(ocr_str))
    line_re = _LINE_RE_CHAR if char_mode else _LINE_RE
    word_re = _WORD_RE_CHAR if char_mode else _WORD_RE

    # Strip bold/italics tags (virtually always wrong from Tesseract,
    # :65-66) and coalesce caption/textfloat/header into ocr_line
    # (:73-75). Each re.sub copies the whole page string, so gate every
    # one on a cheap containment probe — page strings are the hot-path
    # bytes and most pages carry none of these tags.
    for probe, pattern, repl, count in (
        (_STRONG_PROBE, r"</?strong>", "", 0),
        (_EM_PROBE, r"</?em>", "", 0),
        (_HTML_PROBE, r"<html[^>]*>", "<html>", 1),
        (_CAPTION_PROBE, r"(class=')ocr_caption", r"\1ocr_line", 0),
        (_TEXTFLOAT_PROBE, r"(class=')ocr_textfloat", r"\1ocr_line", 0),
        (_HEADER_PROBE, r"(class=')ocr_header", r"\1ocr_line", 0),
    ):
        if probe.search(ocr_str):
            ocr_str = re.sub(pattern, repl, ocr_str, flags=re.I, count=count)

    def convert_word(match_str: str, line_obj: OcrLine) -> None:
        # One lowercase pass gates the case-insensitive regexes below;
        # substring probes gate the case-sensitive ones (most words
        # carry none of the optional attributes, and this ran ~10
        # regexes per word in the profile).
        ms_low = match_str.lower()
        m_id = _ID_RE.search(match_str) if "id=" in ms_low else None
        word_id = (
            m_id.group(1)
            if m_id
            else f"word_{n + 1}_{len(page_obj.lines) + 1}_{len(line_obj.words) + 1}"
        )
        word_sup = "<sup>" in ms_low
        word_dropcap = ("ocr_dropcap" in ms_low
                        and bool(_DROPCAP_RE.search(match_str)))

        if word_sup:
            stripped = _SUP_OPEN_RE.sub("", match_str, count=1)
            stripped = _SUP_CLOSE_RE.sub("", stripped, count=1)
            m_text = _TEXT_RE.search(stripped)
        elif word_dropcap:
            stripped = _DROPCAP_SPAN_RE.sub("", match_str, count=1)
            m_text = _TEXT_RE.search(stripped)
        else:
            m_text = _TEXT_RE.search(match_str)
        if not m_text or not m_text.group(1):
            return
        word_text = unescape_xml(m_text.group(1))

        m_title = _TITLE_RE.search(match_str)
        if not m_title:
            return
        title_str = m_title.group(1)

        m_lang = _LANG_RE.search(match_str) if "lang=" in ms_low else None
        word_lang = m_lang.group(1) if m_lang else current_lang

        m_bbox = _BBOX_NUMS_RE.search(title_str)
        if not m_bbox:
            return
        nums = [float(g) for g in m_bbox.groups() if g is not None]
        word_box = Bbox(nums[0], nums[1], nums[2], nums[3])

        m_font = (_FONT_RE.search(match_str)
                  if "x_font" in match_str else None)
        font_name = m_font.group(1).strip() if m_font else None
        m_style = (_STYLE_RE.search(match_str)
                   if "style=" in match_str else None)
        style_str = m_style.group(1) if m_style else None
        m_conf = (_WCONF_RE.search(title_str)
                  if "x_wconf" in title_str else None)
        word_conf = int(m_conf.group(1)) if m_conf else 0

        word_obj = OcrWord(line_obj, word_id, word_text, word_box)
        word_obj.lang = word_lang
        if scribe_mode:
            m_fsize = _X_FSIZE_RE.search(title_str)
            if m_fsize and int(m_fsize.group(1)):
                word_obj.style.size = int(m_fsize.group(1))
        if style_str:
            if _ITALIC_STYLE_RE.search(style_str):
                word_obj.style.italic = True
            if _BOLD_STYLE_RE.search(style_str):
                word_obj.style.bold = True
            if _SMALLCAPS_STYLE_RE.search(style_str):
                word_obj.style.smallCaps = True
        if word_sup:
            word_obj.style.sup = True
        if font_name:
            word_obj.style.font = font_name
        word_obj.conf = word_conf
        line_obj.words.append(word_obj)

    def convert_word_char_level(match_str: str, line_obj: OcrLine) -> None:
        nonlocal current_lang
        ms_low = match_str.lower()
        m_title = _TITLE_RE.search(match_str)
        title_str = m_title.group(1) if m_title else None
        word_conf = 0
        if title_str and "x_wconf" in title_str:
            m_conf = _WCONF_RE.search(title_str)
            if m_conf:
                word_conf = int(m_conf.group(1))

        italic = ("</em>" in match_str
                  and bool(_EM_CLOSE_SPAN_RE.search(match_str)))
        m_id = _ID_RE.search(match_str) if "id=" in ms_low else None
        word_id = (
            m_id.group(1)
            if m_id
            else f"word_{n + 1}_{len(page_obj.lines) + 1}_{len(line_obj.words) + 1}"
        )
        m_lang = _LANG_RE.search(match_str) if "lang=" in ms_low else None
        word_lang_raw = m_lang.group(1) if m_lang else None
        m_font = (_FONT_RE.search(match_str)
                  if "x_font" in match_str else None)
        font_name = m_font.group(1).strip() if m_font else None

        letter_arr = list(_CHAR_RE.finditer(match_str))
        bboxes = []
        for lm in letter_arr:
            bm = _CHAR_BBOX_RE.search(lm.group(1))
            bboxes.append([int(g) for g in bm.groups()] if bm else None)

        word_lang = word_lang_raw or current_lang
        if word_lang in ("chi_sim", "chi_tra"):
            chars_txt = [lm.group(2) for lm in letter_arr]
            script = get_text_script(chars_txt)
            if script["han"] == 0:
                if current_lang not in ("chi_sim", "chi_tra"):
                    word_lang = current_lang
                elif script["latin"] > 0:
                    word_lang = "eng"

        char_objs = []
        text = ""
        for j, lm in enumerate(letter_arr):
            letter = unescape_xml(lm.group(2))
            if bboxes[j] is None:
                continue
            bbox = Bbox(*bboxes[j])
            if word_lang == "chi_sim":
                w = OcrWord(line_obj, f"{word_id}_{j}", letter, bbox)
                w.conf = word_conf
                w.lang = word_lang
                line_obj.words.append(w)
            else:
                char_objs.append(OcrChar(letter, bbox))
                text += letter

        if word_lang == "chi_sim":
            return
        text = text.strip()
        if text == "":
            return

        valid = [b for b in bboxes if b is not None]
        word_box = Bbox(
            min(b[0] for b in valid), min(b[1] for b in valid),
            max(b[2] for b in valid), max(b[3] for b in valid),
        )
        word_obj = OcrWord(line_obj, word_id, text, word_box)
        word_obj.lang = word_lang
        word_obj.chars = char_objs
        if italic:
            word_obj.style.italic = True
        if font_name:
            word_obj.style.font = font_name
        word_obj.conf = word_conf
        line_obj.words.append(word_obj)

    def convert_line(match_str: str) -> None:
        m_title = _TITLE_RE.search(match_str)
        if not m_title:
            return
        title_str = m_title.group(1)
        m_bbox = _BBOX_NUMS_RE.search(title_str)
        if not m_bbox:
            return
        nums = [int(float(g)) for g in m_bbox.groups() if g is not None]
        linebox = Bbox(nums[0], nums[1], nums[2], nums[3])

        m_base = _BASELINE_RE.search(title_str)
        if not m_base:
            return
        baseline = [float(m_base.group(1)), float(m_base.group(2))]

        asc_height = None
        x_height = None
        if scribe_mode:
            m_a = _X_ASC_HEIGHT_RE.search(title_str)
            m_x = _X_X_HEIGHT_RE.search(title_str)
            if m_a:
                asc_height = float(m_a.group(1))
            if m_x:
                x_height = float(m_x.group(1))
        if not asc_height and not x_height:
            m_size = (_X_SIZE_RE.search(title_str)
                      if "x_size" in title_str else None)
            m_asc = (_X_ASC_RE.search(title_str)
                     if "x_ascenders" in title_str else None)
            m_desc = (_X_DESC_RE.search(title_str)
                      if "x_descenders" in title_str else None)
            all_h = float(m_size.group(1)) if m_size else 15.0
            asc_h = float(m_asc.group(1)) if m_asc else 0.0
            desc_h = float(m_desc.group(1)) if m_desc else 0.0
            asc_height = all_h - desc_h
            if asc_h > 0:
                x_height = all_h - desc_h - asc_h

        line_obj = OcrLine(page_obj, linebox, baseline, asc_height, x_height)

        if char_mode:
            for wm in word_re.finditer(match_str):
                convert_word_char_level(wm.group(0), line_obj)
        else:
            for wm in word_re.finditer(match_str):
                convert_word(wm.group(0), line_obj)

        page_obj.lines.append(line_obj)

    def convert_par(match_str: str) -> None:
        nonlocal current_lang
        m_lang = _PAR_LANG_RE.search(match_str)
        if m_lang:
            current_lang = m_lang.group(1)
        for lm in line_re.finditer(match_str):
            convert_line(lm.group(0))

    consumed_spans = []
    for pm in _PAR_RE.finditer(ocr_str):
        convert_par(pm.group(0))
        consumed_spans.append(pm.span())

    # Lines outside any ocr_par (reference replaces consumed pars with ''
    # then re-scans; we scan the remainder).
    if consumed_spans:
        remainder = []
        last = 0
        for s, e in consumed_spans:
            remainder.append(ocr_str[last:s])
            last = e
        remainder.append(ocr_str[last:])
        rest = "".join(remainder)
    else:
        rest = ocr_str
    for lm in line_re.finditer(rest):
        convert_line(lm.group(0))

    pass2(page_obj, 0)
    lang_set = pass3(page_obj)

    return page_obj, lang_set
