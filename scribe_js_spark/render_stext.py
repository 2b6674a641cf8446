"""mupdf-stext renderer for the fixture layout model.

Emits the dialect convert_page_stext consumes (and detectOcrFormat
sniffs via the '<document name' root, importOCR.js:41-43): per page a
``<page width height>`` with one ``<block>`` per paragraph, lines with
``bbox`` + ``dir="1 0"`` + a ``<font>`` run, chars as
``<char quad="..." x y c>`` with space chars separating words.
"""

from __future__ import annotations

from .functions.textnorm import escape_xml
from .fixtures import ASC_H, CHAR_W, DESC_H


def render_stext(model: dict) -> str:
    out = ['<?xml version="1.0"?>', '<document name="synthetic">']
    for page_n, page in enumerate(model["pages"]):
        out.append(
            f'<page id="page{page_n}" width="{page["width"]}"'
            f' height="{page["height"]}">')
        for par in page["pars"]:
            out.append("<block>")
            for line in par["lines"]:
                y = line["baseline_y"]
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                t = y - ASC_H
                b = y + DESC_H
                out.append(
                    f'<line bbox="{l} {t} {r} {b}" wmode="0" dir="1 0">')
                out.append(f'<font name="TimesNewRoman" size="{ASC_H}">')
                for w_n, w in enumerate(line["words"]):
                    if w_n > 0:
                        prev = line["words"][w_n - 1]
                        sx = prev["right"]
                        out.append(
                            f'<char quad="{sx} {t} {w["left"]} {t} {sx} {b} '
                            f'{w["left"]} {b}" x="{sx}" y="{y}" c=" "/>')
                    x = w["left"]
                    for ch in w["text"]:
                        out.append(
                            f'<char quad="{x} {t} {x + CHAR_W} {t} {x} {b} '
                            f'{x + CHAR_W} {b}" x="{x}" y="{y}" '
                            f'c="{escape_xml(ch)}"/>')
                        x += CHAR_W
                out.append("</font></line>")
            out.append("</block>")
        out.append("</page>")
    out.append("</document>")
    return "".join(out)
