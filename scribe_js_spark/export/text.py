"""Plain-text export — the byte-identity target.

Fold semantics of /root/reference/js/export/writeText.js:22-100 with the
reference's default ``reflowText=true``
(/root/reference/js/containers/scribeDocDefaults.js:91):

- words within a line joined by ``' '``,
- lines of one paragraph joined by ``' '``,
- each paragraph after the document's first prefixed by ``'\\n'``
  (a page boundary always starts a new paragraph),
- no trailing newline; pages with zero lines skipped.

``lineNumbers`` and ``preserveSpacing`` modes are supported for parity
(writeText.js:63-89); they disable reflow exactly as the reference does.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..functions.stats import js_round
from ..model import OcrPage
from ..operators.paragraphs import assign_paragraphs

LINE_WIDTH = 120  # preserveSpacing character columns (writeText.js:40)


def write_text(
    pages: Sequence[OcrPage],
    page_arr: Optional[Sequence[int]] = None,
    minpage: int = 0,
    maxpage: int = -1,
    reflow_text: bool = True,
    line_numbers: bool = False,
    preserve_spacing: bool = False,
    angles: Optional[Sequence[float]] = None,
) -> str:
    out = []

    if page_arr is None:
        if maxpage == -1:
            maxpage = len(pages) - 1
        page_arr = list(range(minpage, maxpage + 1))

    new_line = False
    do_reflow = reflow_text and not line_numbers and not preserve_spacing

    for g in page_arr:
        page_obj = pages[g] if 0 <= g < len(pages) else None
        if page_obj is None or not page_obj.lines:
            continue

        page_width = page_obj.dims["width"] if preserve_spacing else 0

        if do_reflow and not page_obj.pars:
            angle = angles[g] if angles else (page_obj.angle or 0)
            assign_paragraphs(page_obj, angle or 0)

        par_current = page_obj.lines[0].par

        for h, line_obj in enumerate(page_obj.lines):
            if do_reflow:
                if (g > 0 and h == 0) or line_obj.par is not par_current:
                    new_line = True
                par_current = line_obj.par
            else:
                new_line = True

            current_pos = 0
            prefix = f"{g}:{h}  " if line_numbers else ""
            prefix_len = len(prefix)

            for i, word_obj in enumerate(line_obj.words):
                if word_obj is None:
                    continue

                if new_line:
                    out.append("\n")
                    if line_numbers:
                        out.append(prefix)
                    current_pos = prefix_len
                elif preserve_spacing and page_width > 0:
                    target = prefix_len + js_round(
                        word_obj.bbox.left / page_width * LINE_WIDTH)
                    padding = max(1, target - current_pos)
                    out.append(" " * padding)
                    current_pos = target + len(word_obj.text)
                elif h > 0 or g > 0 or i > 0:
                    out.append(" ")

                if new_line and preserve_spacing and page_width > 0:
                    target = prefix_len + js_round(
                        word_obj.bbox.left / page_width * LINE_WIDTH)
                    padding = max(0, target - current_pos)
                    out.append(" " * padding)
                    current_pos = target + len(word_obj.text)

                new_line = False
                out.append(word_obj.text)

    return "".join(out)
