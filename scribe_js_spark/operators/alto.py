"""ALTO XML page converter.

Semantics of /root/reference/js/import/convertPageAlto.js:25-255:
``<Page>`` dims, ``<TextBlock>`` -> paragraph, ``<TextLine>`` ->
line, ``<String CONTENT HPOS VPOS WIDTH HEIGHT WC STYLE STYLEREFS>`` ->
word; baseline offset from the median bottom of descender-free words,
xHeight from words made only of x-height chars; ``<Styles>`` font lookup;
then shared pass2 + pass3.
"""

from __future__ import annotations

import math
import re

from ..functions.textnorm import ASC_CHARS, DESC_CHARS, X_CHARS, unescape_xml
from ..model import Bbox, OcrLine, OcrPage, OcrPar, OcrWord, bbox_union
from .shared import pass2, pass3

_TEXTLINE_RE = re.compile(r"<TextLine[^>]*>([\s\S]*?)</TextLine>", re.I)
_TEXTBLOCK_RE = re.compile(r"<TextBlock[^>]*>([\s\S]*?)</TextBlock>", re.I)
_STRING_RE = re.compile(r"<(?:String)\s+[^>]+/?>", re.I)


_ATTR_RES: dict = {}
_STYLE_WORD_RES = {
    "bold": re.compile("bold", re.I),
    "italic": re.compile("italic", re.I),
    "underline": re.compile("underline", re.I),
    "superscript": re.compile("superscript", re.I),
    "smallcaps": re.compile("smallcaps", re.I),
}
_TEXTLINE_TAG_RE = re.compile(r"<TextLine[^>]+>", re.I)


def _get_attr(elem: str, name: str) -> str | None:
    pat = _ATTR_RES.get(name)
    if pat is None:
        pat = _ATTR_RES[name] = re.compile(
            rf"{name}=[\"']([^\"']+)[\"']", re.I)
    m = pat.search(elem)
    return m.group(1) if m else None


_ATTR_TOKEN_RE = re.compile(r"([^\s\"'=<>/]+)=[\"']([^\"']*)[\"']")


def _attr_map(elem: str) -> dict:
    """All attributes of one element in a single pass.

    Lookup-compatible with ``_get_attr``'s per-name regex, which
    matches ``name=`` anywhere in the element (case-insensitive, first
    occurrence, non-empty value): keys are stored uppercased for every
    *suffix* of each attribute name so e.g. a query for STYLE would hit
    FONTSTYLE exactly as the search regex does, first writer wins, and
    empty values are skipped (the regex's ``[^\"']+`` cannot match
    them, so a later occurrence supplies the value)."""
    out: dict = {}
    for m in _ATTR_TOKEN_RE.finditer(elem):
        val = m.group(2)
        if not val:
            continue
        name = m.group(1).upper()
        for i in range(len(name)):
            key = name[i:]
            if key not in out:
                out[key] = val
    return out


def convert_page_alto(ocr_str: str, n: int):
    page_elem = re.search(r"<Page[^>]+>", ocr_str, re.I)
    if not page_elem:
        raise ValueError("Failed to parse ALTO page element.")
    height_str = _get_attr(page_elem.group(0), "HEIGHT")
    width_str = _get_attr(page_elem.group(0), "WIDTH")
    if not height_str or not width_str:
        raise ValueError("Failed to parse page dimensions.")

    page_obj = OcrPage(n, {"height": int(height_str), "width": int(width_str)})
    page_obj.textSource = "alto"

    # TextStyle lookups memoized per page: the reference re-scans the
    # document per word (convertPageAlto.js), which is O(doc) per word;
    # one id resolves to the same family every time.
    style_font_memo: dict = {}

    def _style_font(style_refs: str) -> str | None:
        if style_refs in style_font_memo:
            return style_font_memo[style_refs]
        sm2 = re.search(
            rf"<TextStyle\s*ID=[\"']{re.escape(style_refs)}[\"'][^>]*>",
            ocr_str, re.I)
        font_family = (_get_attr(sm2.group(0), "FONTFAMILY")
                       if sm2 else None)
        style_font_memo[style_refs] = font_family
        return font_family

    def convert_line(match: str, block_style_refs: str | None) -> None:
        tag = _TEXTLINE_TAG_RE.search(match)
        if not tag:
            return
        attrs = _attr_map(tag.group(0))
        vpos = attrs.get("VPOS")
        hpos = attrs.get("HPOS")
        height = attrs.get("HEIGHT")
        width = attrs.get("WIDTH")
        if not vpos or not hpos or not height or not width:
            return

        linebox = Bbox(
            int(hpos), int(vpos),
            int(hpos) + int(width), int(vpos) + int(height))
        line_obj = OcrLine(page_obj, linebox, [0, 0], None, None)

        for sm in _STRING_RE.finditer(match):
            attrs = _attr_map(sm.group(0))
            content = attrs.get("CONTENT")
            if not content:
                continue
            text = unescape_xml(content)
            s_hpos = attrs.get("HPOS")
            s_vpos = attrs.get("VPOS")
            s_height = attrs.get("HEIGHT")
            s_width = attrs.get("WIDTH")
            if not s_hpos or not s_vpos or not s_height or not s_width:
                continue
            word_box = Bbox(
                int(s_hpos), int(s_vpos),
                int(s_hpos) + int(s_width), int(s_vpos) + int(s_height))
            wid = f"word_{n + 1}_{len(page_obj.lines) + 1}_{len(line_obj.words) + 1}"
            word_obj = OcrWord(line_obj, wid, text, word_box)

            wc = attrs.get("WC")
            if wc:
                word_obj.conf = math.floor(float(wc) * 100 + 0.5)

            style_attr = attrs.get("STYLE")
            if style_attr:
                if _STYLE_WORD_RES["bold"].search(style_attr):
                    word_obj.style.bold = True
                if _STYLE_WORD_RES["italic"].search(style_attr):
                    word_obj.style.italic = True
                if _STYLE_WORD_RES["underline"].search(style_attr):
                    word_obj.style.underline = True
                if _STYLE_WORD_RES["superscript"].search(style_attr):
                    word_obj.style.sup = True
                if _STYLE_WORD_RES["smallcaps"].search(style_attr):
                    word_obj.style.smallCaps = True

            style_refs = attrs.get("STYLEREFS") or block_style_refs
            if style_refs:
                font_family = _style_font(style_refs)
                if font_family:
                    word_obj.style.font = font_family

            line_obj.words.append(word_obj)

        if not line_obj.words:
            return

        with_desc = []
        without_desc = []
        for word in line_obj.words:
            if any(ch in DESC_CHARS for ch in word.text):
                with_desc.append(word)
            else:
                without_desc.append(word)

        if without_desc:
            bottoms = sorted(w.bbox.bottom for w in without_desc)
            median_bottom = bottoms[math.floor(len(bottoms) / 2)]
            line_obj.baseline[1] = median_bottom - line_obj.bbox.bottom
        elif with_desc:
            line_height = line_obj.bbox.bottom - line_obj.bbox.top
            line_obj.baseline[1] = -math.floor(line_height * 0.25 + 0.5)

        x_only_words = [
            w for w in line_obj.words
            if w.text and all(ch in X_CHARS for ch in w.text)
        ]
        has_ascenders = any(
            any(ch in ASC_CHARS for ch in w.text) for w in line_obj.words)

        if x_only_words:
            heights = sorted(w.bbox.bottom - w.bbox.top for w in x_only_words)
            line_obj.xHeight = heights[math.floor(len(heights) / 2)]
        else:
            baseline_y = line_obj.bbox.bottom + line_obj.baseline[1]
            top_to_baseline = baseline_y - line_obj.bbox.top
            if not has_ascenders:
                line_obj.xHeight = math.floor(top_to_baseline + 0.5)
            else:
                line_obj.xHeight = math.floor(top_to_baseline * 0.67 + 0.5)

        page_obj.lines.append(line_obj)

    for bm in _TEXTBLOCK_RE.finditer(ocr_str):
        tag = re.search(r"<TextBlock[^>]+>", bm.group(0), re.I)
        block_style_refs = _get_attr(tag.group(0), "STYLEREFS") if tag else None
        par_lines = []
        for lm in _TEXTLINE_RE.finditer(bm.group(1)):
            before = len(page_obj.lines)
            convert_line(lm.group(0), block_style_refs)
            if len(page_obj.lines) > before:
                par_lines.append(page_obj.lines[-1])
        if par_lines:
            par_obj = OcrPar(page_obj, bbox_union([l.bbox for l in par_lines]))
            for l in par_lines:
                l.par = par_obj
            par_obj.lines = par_lines
            page_obj.pars.append(par_obj)

    pass2(page_obj, 0)
    lang_set = pass3(page_obj)
    return page_obj, lang_set
