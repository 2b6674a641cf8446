"""hOCR export — byte-identical template of the reference's writeHocr
(/root/reference/js/export/writeHocr.js:17-152): exact header metas,
per-line ``bbox ...; baseline <r6> <int>[; x_x_height ..][; x_asc_height ..]``,
per-word ``bbox int x4;x_wconf ..[;x_font ..][;x_fsize ..]``, style
attribute, ``<sup>`` / ``ocr_dropcap`` wrappers.

Number formatting matters for byte parity: JS stringifies doubles with
shortest-roundtrip formatting and prints integral doubles without a
decimal point — ``_js_num`` reproduces both (Python's repr uses the
same shortest-roundtrip algorithm for the fractional case).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

from ..functions.stats import js_round, round6
from ..functions.textnorm import escape_xml
from ..model import OcrPage


def _js_num(x) -> str:
    if x is None:
        return "null"
    f = float(x)
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN"\n'
    '    "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">\n'
    '<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en" lang="en">'
)


def write_hocr(pages: Sequence[OcrPage],
               page_arr: Optional[Sequence[int]] = None,
               meta: Optional[dict] = None) -> str:
    if page_arr is None:
        page_arr = range(len(pages))

    out = [_HEADER, "<head>", "\n\t<title></title>"]
    for key, value in (meta or {}).items():
        value_str = json.dumps(value) if isinstance(value, (dict, list)) else value
        out.append(f"\n\t<meta name='{key}' content='{value_str}'></meta>")
    out.append('\n\t<meta http-equiv="Content-Type" content="text/html;charset=utf-8"/>')
    out.append("\n\t<meta name='ocr-system' content='scribeocr' />")
    out.append(
        "\n\t<meta name='ocr-capabilities' content='ocr_page ocr_carea "
        "ocr_par ocr_line ocrx_word ocrp_wconf ocrp_lang ocrp_dir "
        "ocrp_font ocrp_fsize'/>")
    out.append("\n</head>")
    out.append("\n<body>")

    for i in page_arr:
        page_obj = pages[i]
        if page_obj is None:
            continue
        out.append(
            f"\n\t<div class='ocr_page' title='bbox 0 0 "
            f"{_js_num(page_obj.dims['width'])} "
            f"{_js_num(page_obj.dims['height'])}'>")
        for line_obj in page_obj.lines:
            b = line_obj.bbox
            out.append(
                f'\n\t\t<span class=\'ocr_line\' title="bbox '
                f"{_js_num(b.left)} {_js_num(b.top)} {_js_num(b.right)} "
                f"{_js_num(b.bottom)}")
            out.append(
                f"; baseline {_js_num(round6(line_obj.baseline[0]))} "
                f"{js_round(line_obj.baseline[1])}")
            if line_obj.xHeight:
                out.append(f"; x_x_height {_js_num(line_obj.xHeight)}")
            if line_obj.ascHeight:
                out.append(f"; x_asc_height {_js_num(line_obj.ascHeight)}")
            out.append('">')
            for w in line_obj.words:
                out.append(f"\n\t\t\t<span class='ocrx_word' id='{w.id}' title='")
                out.append(
                    f"bbox {js_round(w.bbox.left)} {js_round(w.bbox.top)} "
                    f"{js_round(w.bbox.right)} {js_round(w.bbox.bottom)}")
                out.append(f";x_wconf {_js_num(w.conf)}")
                if w.style.font and w.style.font != "Default":
                    out.append(f";x_font {w.style.font}")
                if w.style.size:
                    out.append(f";x_fsize {_js_num(w.style.size)}")
                out.append("'")
                if w.lang:
                    out.append(f" lang='{w.lang}'")
                if (w.style.bold or w.style.italic or w.style.smallCaps
                        or (w.style.font and w.style.font != "Default")):
                    out.append(" style='")
                    if w.style.italic:
                        out.append("font-style:italic;")
                    if w.style.bold:
                        out.append("font-weight:bold;")
                    if w.style.smallCaps:
                        out.append("font-variant:small-caps;")
                    if w.style.font and w.style.font != "Default":
                        out.append(f"font-family:{w.style.font}")
                    out.append("'>")
                else:
                    out.append(">")
                if w.style.sup:
                    out.append(f"<sup>{escape_xml(w.text)}</sup>")
                elif w.style.dropcap:
                    out.append(
                        f"<span class='ocr_dropcap'>{escape_xml(w.text)}</span>")
                else:
                    out.append(escape_xml(w.text))
                out.append("</span>")
            out.append("\n\t\t</span>")
        out.append("\n\t</div>")

    out.append("\n</body>\n</html>")
    return "".join(out)
