"""Markdown export — fold semantics of the reference's writeMarkdown
(/root/reference/js/export/writeMarkdown.js:110-257): reflow paragraphs
to single lines, ``---`` page separators, consecutive same-style words
grouped into ``**bold**`` / ``*italic*`` / ``***bold-italic***`` runs,
``<sup>`` wrappers, markdown-special escaping. Detected layout tables
are interleaved at their page position: a line overlapping a table
bbox > 0.5 is folded into a pipe table (rendered once, at the first
such line) instead of the paragraph flow (writeMarkdown.js:150-188)."""

from __future__ import annotations

import re
from typing import Optional, Sequence

from ..functions.stats import calc_box_overlap
from ..model import OcrPage
from ..operators.paragraphs import assign_paragraphs
from ..operators.tables import (
    detect_tables_in_page,
    extract_table_rows,
    render_table_markdown,
)

_MD_ESCAPE_RE = re.compile(r"([\\`*_\[\]])")


def _escape_markdown(text: str) -> str:
    return _MD_ESCAPE_RE.sub(r"\\\1", text)


def _style_wrapper(text: str, style_key: str) -> str:
    if style_key == "bi":
        return f"***{text}***"
    if style_key == "b":
        return f"**{text}**"
    if style_key == "i":
        return f"*{text}*"
    return text


def write_markdown(pages: Sequence[OcrPage],
                   page_arr: Optional[Sequence[int]] = None,
                   reflow_text: bool = True,
                   apply_formatting: bool = True,
                   detect_tables: bool = True) -> str:
    if page_arr is None:
        page_arr = list(range(len(pages)))
    minpage = page_arr[0] if page_arr else 0

    out = []
    new_line = False
    is_first_content = True

    for g in page_arr:
        page = pages[g] if 0 <= g < len(pages) else None
        if page is None or not page.lines:
            continue
        if reflow_text and not page.pars:
            assign_paragraphs(page, page.angle or 0)
        if not is_first_content and g > minpage:
            out.append("\n\n---\n\n")

        table_bboxes = detect_tables_in_page(page) if detect_tables else []
        tables_rendered: set[int] = set()

        par_current = page.lines[0].par

        for h, line in enumerate(page.lines):
            inside_table = None
            for ti, tb in enumerate(table_bboxes):
                if calc_box_overlap(line.bbox, tb) > 0.5:
                    inside_table = ti
                    break
            if inside_table is not None:
                if inside_table not in tables_rendered:
                    tables_rendered.add(inside_table)
                    matrix = extract_table_rows(
                        page, table_bboxes[inside_table])
                    md = render_table_markdown(
                        matrix, escape=apply_formatting)
                    if md:
                        if not is_first_content:
                            out.append("\n\n")
                        out.append(md)
                        is_first_content = False
                continue  # table lines never join the paragraph flow
            if reflow_text:
                if (h == 0 and not is_first_content) or line.par is not par_current:
                    new_line = True
                par_current = line.par
            else:
                new_line = True

            current_style_key = None
            styled_words: list[str] = []

            def flush():
                nonlocal styled_words
                if not styled_words:
                    return
                text = " ".join(styled_words)
                out.append(_style_wrapper(text, current_style_key)
                           if apply_formatting else text)
                styled_words = []

            for word in line.words:
                if word is None:
                    continue
                style_key = ""
                if apply_formatting:
                    style_key = (("b" if word.style.bold else "")
                                 + ("i" if word.style.italic else ""))
                word_text = _escape_markdown(word.text)
                if apply_formatting and word.style.sup:
                    word_text = f"<sup>{word_text}</sup>"

                if style_key != current_style_key and styled_words:
                    flush()

                if new_line and not is_first_content:
                    flush()
                    out.append("\n")
                elif not is_first_content and not styled_words:
                    out.append(" ")
                new_line = False
                is_first_content = False

                current_style_key = style_key
                styled_words.append(word_text)

            flush()

    return "".join(out)
