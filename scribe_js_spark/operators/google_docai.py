"""Google Document AI JSON converter.

Semantics of /root/reference/js/import/convertDocGoogleDocAI.js:17-256:
``pages[].tokens/lines/paragraphs`` anchored into the document-level
``text`` via textAnchor segments; token-to-line assignment by segment
containment, word text = fullText[start:end].trim(); line metrics from
the line polygon (ascender = 3/4 height); paragraphs by
textAnchor-range containment with a fallback paragraph; then
splitUnicodeSuperscripts + pass3.
"""

from __future__ import annotations

import json

from ..functions.stats import js_round
from ..model import Bbox, OcrLine, OcrPage, OcrPar, OcrWord, bbox_union
from .shared import pass3, split_unicode_superscripts


def _vertices(bounding_poly, page_w, page_h, scale_x=1.0, scale_y=1.0):
    verts = bounding_poly.get("vertices")
    if verts and any(("x" in v or "y" in v) for v in verts):
        return [((v.get("x") or 0) * scale_x, (v.get("y") or 0) * scale_y)
                for v in verts]
    nverts = bounding_poly.get("normalizedVertices")
    if nverts:
        return [((v.get("x") or 0) * page_w * scale_x,
                 (v.get("y") or 0) * page_h * scale_y)
                for v in nverts]
    raise ValueError("No vertices found in bounding poly.")


def _segment(layout):
    seg = ((layout or {}).get("textAnchor") or {}).get("textSegments") or [{}]
    s = seg[0]
    return int(s.get("startIndex") or 0), int(s.get("endIndex") or 0)


def convert_doc_google_docai(ocr_str: str,
                             page_dims: dict | None = None) -> list[OcrPage]:
    data = json.loads(ocr_str)
    if not data.get("pages"):
        raise ValueError("Invalid Document AI format: missing pages.")
    full_text = data.get("text") or ""

    pages = []
    for i, page_data in enumerate(data["pages"]):
        dim = page_data.get("dimension") or {}
        page_w = dim.get("width")
        page_h = dim.get("height")
        if not page_w or not page_h:
            raise ValueError(f"Failed to parse page dimensions for page {i}.")
        scale_x = page_dims["width"] / page_w if page_dims else 1.0
        scale_y = page_dims["height"] / page_h if page_dims else 1.0
        dims_out = page_dims or {"width": page_w, "height": page_h}

        page_obj = OcrPage(i, dict(dims_out))
        page_obj.textSource = "google_doc_ai"

        tokens = page_data.get("tokens") or []
        lines = page_data.get("lines") or []
        if not tokens or not lines:
            pages.append(page_obj)
            continue

        # Tokens indexed by segment start once per page: the per-line
        # comprehension re-scanned (and re-parsed the textAnchor of)
        # every token — O(lines x tokens), quadratic on dense pages.
        # Sorted hit indices reproduce the tokens-array order exactly.
        import bisect

        token_meta = sorted(
            (_segment(t.get("layout")) + (ti,)
             for ti, t in enumerate(tokens)),
            key=lambda m: (m[0], m[2]))
        token_starts = [m[0] for m in token_meta]

        line_text_ranges = []
        for line in lines:
            layout = line.get("layout") or {}
            start, end = _segment(layout)
            verts = _vertices(layout["boundingPoly"], page_w, page_h,
                              scale_x, scale_y)
            xs = [v[0] for v in verts]
            ys = [v[1] for v in verts]
            line_bbox = Bbox(min(xs), min(ys), max(xs), max(ys))
            tl, tr, br, bl = verts[0], verts[1], verts[2], verts[3]
            baseline = [0.0, 0.0]
            if br[0] != bl[0]:
                baseline[0] = (br[1] - bl[1]) / (br[0] - bl[0])
            line_obj = OcrLine(page_obj, line_bbox, baseline)

            lo = bisect.bisect_left(token_starts, start)
            line_tokens = [
                tokens[ti] for ti in sorted(
                    ti for t_start, t_end, ti
                    in token_meta[lo:bisect.bisect_right(token_starts,
                                                         end)]
                    if t_end <= end)
            ]
            if not line_tokens:
                continue
            for l, token in enumerate(line_tokens):
                layout_t = token.get("layout") or {}
                t_start, t_end = _segment(layout_t)
                word_text = full_text[t_start:t_end].strip()
                if not word_text:
                    continue
                tverts = _vertices(layout_t["boundingPoly"], page_w, page_h,
                                   scale_x, scale_y)
                xs = [v[0] for v in tverts]
                ys = [v[1] for v in tverts]
                wid = f"word_{i + 1}_{len(page_obj.lines) + 1}_{l + 1}"
                word_obj = OcrWord(
                    line_obj, wid, word_text,
                    Bbox(min(xs), min(ys), max(xs), max(ys)))
                word_obj.conf = js_round(
                    (layout_t.get("confidence") or 0) * 100)
                line_obj.words.append(word_obj)

            if line_obj.words:
                split_unicode_superscripts(line_obj)
                line_obj.bbox = bbox_union([w.bbox for w in line_obj.words])
                line_height = ((br[1] - tr[1]) + (bl[1] - tl[1])) / 2
                line_obj.ascHeight = line_height * 3 / 4
                line_obj.baseline[1] = (
                    -line_height / 4 - (line_obj.bbox.bottom - bl[1]))
                line_text_ranges.append((start, end))
                page_obj.lines.append(line_obj)

        paragraphs = page_data.get("paragraphs") or []
        if paragraphs:
            for par in paragraphs:
                p_start, p_end = _segment(par.get("layout"))
                par_lines = [
                    page_obj.lines[k]
                    for k, (s, e) in enumerate(line_text_ranges)
                    if s >= p_start and e <= p_end
                ]
                if par_lines:
                    par_obj = OcrPar(
                        page_obj, bbox_union([l.bbox for l in par_lines]))
                    for l_obj in par_lines:
                        l_obj.par = par_obj
                    par_obj.lines = par_lines
                    page_obj.pars.append(par_obj)
            unassigned = [l for l in page_obj.lines if l.par is None]
            if unassigned:
                par_obj = OcrPar(
                    page_obj, bbox_union([l.bbox for l in unassigned]))
                for l_obj in unassigned:
                    l_obj.par = par_obj
                par_obj.lines = unassigned
                page_obj.pars.append(par_obj)

        pass3(page_obj)
        pages.append(page_obj)

    return pages
