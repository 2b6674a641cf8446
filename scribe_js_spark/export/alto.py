"""ALTO XML export (v2.0) — template of the reference's writeAlto
(/root/reference/js/export/writeAlto.js:60-322): Description block,
deduplicated ``<Styles>``, per-paragraph ``<TextBlock>`` with dominant
style/language refs, ``<String ... WC>`` words and ``<SP>`` spacers.

The reference stamps the current date into processingDateTime; here it
is a parameter defaulting to a fixed value — job output must be
byte-stable across replays (SURVEY.md §4 determinism rule).
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..functions.stats import js_round
from ..functions.textnorm import escape_xml
from ..model import OcrPage

_LANG_MAP = {
    "eng": "en-US", "fra": "fr-FR", "deu": "de-DE", "spa": "es-ES",
    "ita": "it-IT", "por": "pt-PT", "nld": "nl-NL", "rus": "ru-RU",
    "pol": "pl-PL", "ces": "cs-CZ", "slk": "sk-SK", "ukr": "uk-UA",
    "hun": "hu-HU", "ron": "ro-RO", "hrv": "hr-HR", "srp": "sr-RS",
    "bul": "bg-BG", "slv": "sl-SI", "cat": "ca-ES", "dan": "da-DK",
    "fin": "fi-FI", "nor": "no-NO", "swe": "sv-SE", "tur": "tr-TR",
    "ell": "el-GR", "ara": "ar-SA", "heb": "he-IL", "hin": "hi-IN",
    "jpn": "ja-JP", "kor": "ko-KR", "chi_sim": "zh-CN",
    "chi_tra": "zh-TW", "tha": "th-TH", "vie": "vi-VN",
}


def _iso_lang(lang: str) -> str:
    return _LANG_MAP.get(lang, lang)


def write_alto(pages: Sequence[OcrPage],
               page_arr: Optional[Sequence[int]] = None,
               processing_date: str = "2026-01-01") -> str:
    if page_arr is None:
        page_arr = list(range(len(pages)))

    styles: dict[str, dict] = {}

    def style_id(font, size) -> str:
        key = f"{font or 'Default'}_{size or 10}"
        if key not in styles:
            styles[key] = {
                "id": f"font{len(styles)}",
                "fontFamily": font or "Default",
                "fontSize": size or 10,
            }
        return styles[key]["id"]

    for i in page_arr:
        page = pages[i]
        if not page:
            continue
        for line in page.lines:
            for w in line.words:
                if w.style.font or w.style.size:
                    style_id(w.style.font, w.style.size)

    out = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n']
    out.append(
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v2#" '
        'xmlns:xlink="http://www.w3.org/1999/xlink" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://www.loc.gov/standards/alto/ns-v2# '
        'http://www.loc.gov/standards/alto/alto-v2.0.xsd">\n')
    out.append("<Description>\n<MeasurementUnit>pixel</MeasurementUnit>\n")
    out.append(
        '<OCRProcessing ID="IdOcr"><ocrProcessingStep>'
        f"<processingDateTime>{processing_date}</processingDateTime>"
        "<processingSoftware><softwareCreator>scribeocr</softwareCreator>"
        "<softwareName>scribe.js</softwareName></processingSoftware>"
        "</ocrProcessingStep></OCRProcessing>\n</Description>\n")

    if styles:
        out.append("<Styles>")
        for st in styles.values():
            out.append(
                f'<TextStyle ID="{st["id"]}" '
                f'FONTFAMILY="{escape_xml(str(st["fontFamily"]))}" '
                f'FONTSIZE="{st["fontSize"]}"/>')
        out.append("\n</Styles>\n")

    out.append("<Layout>\n")

    for page_index in page_arr:
        page = pages[page_index]
        height = page.dims["height"] if page else 0
        width = page.dims["width"] if page else 0
        out.append(
            f'<Page ID="Page{page_index + 1}" '
            f'PHYSICAL_IMG_NR="{page_index + 1}" '
            f'HEIGHT="{height}" WIDTH="{width}">\n')
        if not page or not page.lines:
            out.append("</Page>\n")
            continue
        out.append(
            f'<PrintSpace HEIGHT="{height}" WIDTH="{width}" VPOS="0" HPOS="0">\n')

        par_current = None
        block_index = 0
        block_style_ref = None
        block_lang = None

        lines = page.lines
        for line_index, line in enumerate(lines):
            if not line.words:
                continue
            if block_index == 0 or line.par is not par_current:
                if block_index > 0:
                    out.append("</TextBlock>\n")
                par_current = line.par
                bl = js_round(line.bbox.left)
                bt = js_round(line.bbox.top)
                br = js_round(line.bbox.right)
                bb = js_round(line.bbox.bottom)
                style_counts: dict[str, int] = {}
                lang_counts: dict[str, int] = {}
                for j in range(line_index, len(lines)):
                    nxt = lines[j]
                    if not nxt.words:
                        continue
                    if j > line_index and nxt.par is not par_current:
                        break
                    if j > line_index:
                        bl = min(bl, js_round(nxt.bbox.left))
                        bt = min(bt, js_round(nxt.bbox.top))
                        br = max(br, js_round(nxt.bbox.right))
                        bb = max(bb, js_round(nxt.bbox.bottom))
                    for w in nxt.words:
                        if w.style.font or w.style.size:
                            sid = style_id(w.style.font or "", w.style.size or 0)
                            style_counts[sid] = style_counts.get(sid, 0) + 1
                        if w.lang:
                            lang_counts[w.lang] = lang_counts.get(w.lang, 0) + 1
                block_style_ref = max(
                    style_counts, key=style_counts.get) if style_counts else None
                block_lang = max(
                    lang_counts, key=lang_counts.get) if lang_counts else None

                out.append(
                    f'<TextBlock ID="Page{page_index + 1}_Block{block_index + 1}" '
                    f'HEIGHT="{bb - bt}" WIDTH="{br - bl}" '
                    f'VPOS="{bt}" HPOS="{bl}"')
                if block_lang:
                    out.append(f' language="{_iso_lang(block_lang)}"')
                if block_style_ref:
                    out.append(f' STYLEREFS="{block_style_ref}"')
                out.append(">\n")
                block_index += 1

            ll = js_round(line.bbox.left)
            lt = js_round(line.bbox.top)
            lr = js_round(line.bbox.right)
            lb = js_round(line.bbox.bottom)
            out.append(
                f'<TextLine HEIGHT="{lb - lt}" WIDTH="{lr - ll}" '
                f'VPOS="{lt}" HPOS="{ll}">')
            for wi, w in enumerate(line.words):
                wl = js_round(w.bbox.left)
                wt = js_round(w.bbox.top)
                wr = js_round(w.bbox.right)
                wb = js_round(w.bbox.bottom)
                style_attrs = []
                if w.style.bold:
                    style_attrs.append("bold")
                if w.style.italic:
                    style_attrs.append("italic")
                if w.style.underline:
                    style_attrs.append("underline")
                if w.style.sup:
                    style_attrs.append("superscript")
                if w.style.smallCaps:
                    style_attrs.append("smallCaps")
                style_attr = f' STYLE="{" ".join(style_attrs)}"' if style_attrs else ""
                style_refs_attr = ""
                if w.style.font or w.style.size:
                    sid = style_id(w.style.font or "", w.style.size or 0)
                    if sid != block_style_ref:
                        style_refs_attr = f' STYLEREFS="{sid}"'
                lang_attr = ""
                if w.lang and w.lang != block_lang:
                    lang_attr = f' language="{_iso_lang(w.lang)}"'
                wc_attr = ""
                if w.conf is not None:
                    wc_attr = f' WC="{w.conf / 100:.2f}"'
                out.append(
                    f"<String{style_attr}{lang_attr}{wc_attr}{style_refs_attr} "
                    f'CONTENT="{escape_xml(w.text)}" '
                    f'HEIGHT="{wb - wt}" WIDTH="{wr - wl}" '
                    f'VPOS="{wt}" HPOS="{wl}"/>')
                if wi < len(line.words) - 1:
                    nxt = line.words[wi + 1]
                    sp_width = js_round(nxt.bbox.left) - wr - 2
                    if sp_width > 0:
                        out.append(
                            f'<SP WIDTH="{sp_width}" VPOS="{wt}" '
                            f'HPOS="{wr + 1}"/>')
            out.append("</TextLine>\n")

        out.append("</TextBlock>\n</PrintSpace>\n</Page>\n")

    out.append("</Layout>\n</alto>\n")
    return "".join(out)
