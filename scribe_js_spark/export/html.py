"""Semantic HTML export.

The reference's writeHtml (/root/reference/js/export/writeHtml.js) is a
pixel-positioned *overlay viewer* that depends on font-program metrics
(out of scope with the rest of font rendering, SURVEY.md §2.10). This
export is the structural fold over the same model: pages -> paragraph
elements (with furniture roles as semantic tags) -> styled word spans
(b/i/sup/small-caps), reflow semantics identical to writeText.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..functions.textnorm import escape_xml
from ..model import OcrPage
from ..operators.paragraphs import assign_paragraphs

_ROLE_TAG = {
    "title": ("<h1>", "</h1>"),
    "header": ('<header class="running-header">', "</header>"),
    "footer": ("<footer>", "</footer>"),
    "pagenum": ('<div class="pagenum">', "</div>"),
    "footnote": ('<aside class="footnote">', "</aside>"),
    "body": ("<p>", "</p>"),
}


def _word_html(word) -> str:
    text = escape_xml(word.text)
    if word.style.sup:
        text = f"<sup>{text}</sup>"
    if word.style.smallCaps:
        text = f'<span style="font-variant:small-caps">{text}</span>'
    if word.style.bold:
        text = f"<b>{text}</b>"
    if word.style.italic:
        text = f"<i>{text}</i>"
    return text


def write_html(pages: Sequence[OcrPage],
               page_arr: Optional[Sequence[int]] = None,
               reflow_text: bool = True) -> str:
    if page_arr is None:
        page_arr = range(len(pages))
    out = ["<!DOCTYPE html>\n<html><head>"
           '<meta charset="utf-8"></head><body>']
    for g in page_arr:
        page = pages[g]
        if page is None or not page.lines:
            continue
        if reflow_text and not page.pars:
            assign_paragraphs(page, page.angle or 0)
        out.append(f'\n<section class="page" data-page="{g}">')
        for par in page.pars:
            open_tag, close_tag = _ROLE_TAG.get(par.type, _ROLE_TAG["body"])
            words = [
                _word_html(w) for line in par.lines for w in line.words]
            out.append(f"\n{open_tag}{' '.join(words)}{close_tag}")
        out.append("\n</section>")
    out.append("\n</body></html>")
    return "".join(out)
