"""Filled form-field values as page text.

A filled AcroForm is real document text: the reference lays each
text/choice field's /V out inside its widget /Rect and inserts the
words as page lines, so a form with no other text still classifies as
text-native and its content extracts (parsePdfDoc.js:1091-1176;
layout rules from formFieldLayout.js:31-99). This module ports both
halves over our parsed-object model:

- ``layout_field_value``: /DA Tf size wins (0/absent auto-sizes to
  the rect), 0.5-em average advance, multiline word-wrap at the
  rect's character capacity with 1.15 leading, comb cells for /Ff bit
  25 + /MaxLen, /Q quadding for single-line;
- ``insert_form_field_lines``: walks the page /Annots Widgets,
  resolves /FT //V //Ff //MaxLen //Q //DA through the /Parent chain,
  skips hidden (/F bits 2/32), signature/button fields, and empty
  values, then splices synthesized lines into the page in top order.
"""

from __future__ import annotations

import re

from ...functions.stats import js_round, round3
from ...functions.textnorm import calc_lang
from ...model import Bbox, OcrLine, OcrWord
from .annots import _widget_chain

_TF_RE = re.compile(r"/[\w+-]+\s+([\d.]+)\s+Tf")
_WORD_RE = re.compile(r"\S+")


def layout_field_value(value: str, rect_w: float, rect_h: float,
                       multiline: bool = False, comb: bool = False,
                       max_len: int | None = None, quadding: int = 0,
                       da: str | None = None) -> dict:
    """-> {'font_size': n, 'lines': [{'text', 'x', 'y',
    'words': [(text, x0, x1), ...]}]}; coordinates are /Rect-local
    points, y is the baseline (formFieldLayout.js:31-99)."""
    m = _TF_RE.search(da) if da else None
    font_size = float(m.group(1)) if m else 10.0
    if not font_size:
        font_size = min(12.0, max(6.0, rect_h - 4))
    avg_w = font_size * 0.5
    pad = 2.0
    lines: list[dict] = []

    def words_of(text: str, line_x: float, char_w: float):
        return [(w.group(0), line_x + w.start() * char_w,
                 line_x + (w.start() + len(w.group(0))) * char_w)
                for w in _WORD_RE.finditer(text)]

    if multiline:
        max_chars = max(1, int((rect_w - 2 * pad) / avg_w))
        wrapped: list[str] = []
        for para in re.split(r"\r\n|\r|\n", value):
            words = [w for w in re.split(r"\s+", para) if w]
            if not words:
                wrapped.append("")
                continue
            line = ""
            for w in words:
                if not line:
                    line = w
                elif len(line) + 1 + len(w) <= max_chars:
                    line += f" {w}"
                else:
                    wrapped.append(line)
                    line = w
            if line:
                wrapped.append(line)
        leading = font_size * 1.15
        y = rect_h - pad - font_size
        for text in wrapped:
            if text:
                lines.append({"text": text, "x": pad, "y": y,
                              "words": words_of(text, pad, avg_w)})
            y -= leading
        return {"font_size": font_size, "lines": lines}

    y = max(pad, (rect_h - font_size) / 2 + font_size * 0.2)
    if comb and max_len and max_len > 0:
        cell_w = rect_w / max_len
        lines.append({
            "text": value, "x": 0.0, "y": y,
            "words": [(m2.group(0), m2.start() * cell_w,
                       (m2.start() + len(m2.group(0))) * cell_w)
                      for m2 in _WORD_RE.finditer(value)]})
        return {"font_size": font_size, "lines": lines}

    text_w = len(value) * avg_w
    x = pad
    if quadding == 1:
        x = max(pad, (rect_w - text_w) / 2)
    elif quadding == 2:
        x = max(pad, rect_w - text_w - pad)
    lines.append({"text": value, "x": x, "y": y,
                  "words": words_of(value, x, avg_w)})
    return {"font_size": font_size, "lines": lines}


def _chain_value(doc, chain, key):
    for d in chain:
        if key in d:
            return doc.resolve(d.get(key))
    return None


def _text_value(v) -> str | None:
    if isinstance(v, (bytes, bytearray)):
        b = bytes(v)
        if b[:2] == b"\xfe\xff":
            return b[2:].decode("utf-16-be", "replace")
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return b.decode("latin-1")
    if isinstance(v, str):
        return v
    return None


def collect_field_values(doc, page: dict) -> list[dict]:
    """Visible filled Tx/Ch widgets on the page -> [{'value', 'rect',
    'multiline', 'comb', 'max_len', 'quadding', 'da'}]."""
    annots = doc.resolve(page.get("Annots"))
    if not isinstance(annots, list):
        return []
    out = []
    for ref in annots:
        a = doc.resolve(ref)
        if not isinstance(a, dict):
            continue
        if str(doc.resolve(a.get("Subtype", ""))) != "Widget":
            continue
        try:
            flags = int(doc.resolve(a.get("F", 0)) or 0)
        except (TypeError, ValueError):
            flags = 0
        if flags & 2 or flags & 32:  # Hidden / NoView
            continue
        chain = _widget_chain(doc, a)
        ft = _chain_value(doc, chain, "FT")
        if str(ft) not in ("Tx", "Ch"):
            continue
        value = _text_value(_chain_value(doc, chain, "V"))
        if not value or not value.strip():
            continue
        rect = doc.resolve(a.get("Rect"))
        if not isinstance(rect, list) or len(rect) != 4:
            continue
        try:
            rect = [float(doc.resolve(x)) for x in rect]
        except (TypeError, ValueError):
            continue
        try:
            ff = int(_chain_value(doc, chain, "Ff") or 0)
        except (TypeError, ValueError):
            ff = 0
        try:
            max_len = _chain_value(doc, chain, "MaxLen")
            max_len = int(max_len) if max_len is not None else None
        except (TypeError, ValueError):
            max_len = None
        try:
            quadding = int(_chain_value(doc, chain, "Q") or 0)
        except (TypeError, ValueError):
            quadding = 0
        da = _text_value(_chain_value(doc, chain, "DA"))
        out.append({
            "value": value, "rect": rect,
            "multiline": str(ft) == "Tx" and bool(ff & 0x1000),
            "comb": str(ft) == "Tx" and bool(ff & 0x1000000),
            "max_len": max_len, "quadding": quadding, "da": da,
        })
    return out


def insert_form_field_lines(doc, page: dict, page_obj,
                            page_h_pts: float, scale: float,
                            base_ctm=None) -> int:
    """Lay out each visible filled field and splice its lines into
    ``page_obj.lines`` in top order (parsePdfDoc.js:1130-1176).
    Returns the number of printable characters added (the reference
    counts them toward the text-native verdict)."""
    from .parse import map_annot_point

    printable = 0
    field_idx = 0
    n = page_obj.n
    for fld in collect_field_values(doc, page):
        r = fld["rect"]
        rect_w = abs(r[2] - r[0])
        rect_h = abs(r[3] - r[1])
        if rect_w <= 0 or rect_h <= 0:
            continue
        llx = min(r[0], r[2])
        lly = min(r[1], r[3])
        layout = layout_field_value(
            fld["value"], rect_w, rect_h,
            multiline=fld["multiline"], comb=fld["comb"],
            max_len=fld["max_len"], quadding=fld["quadding"],
            da=fld["da"])
        field_idx += 1
        asc = layout["font_size"] * 0.8
        desc = layout["font_size"] * 0.2
        lift_line_idx = 0
        for ll in layout["lines"]:
            if not ll["words"]:
                continue
            lift_line_idx += 1
            word_specs = []
            for text, x0, x1 in ll["words"]:
                pa = map_annot_point(
                    llx + x0, lly + ll["y"] + asc,
                    page_h_pts, scale, base_ctm)
                pb = map_annot_point(
                    llx + x1, lly + ll["y"] - desc,
                    page_h_pts, scale, base_ctm)
                word_specs.append((text, Bbox(
                    js_round(min(pa[0], pb[0])),
                    js_round(min(pa[1], pb[1])),
                    js_round(max(pa[0], pb[0])),
                    js_round(max(pa[1], pb[1])))))
            line_bbox = Bbox(
                min(b.left for _, b in word_specs),
                min(b.top for _, b in word_specs),
                max(b.right for _, b in word_specs),
                max(b.bottom for _, b in word_specs))
            base_y = map_annot_point(
                llx + ll["x"], lly + ll["y"],
                page_h_pts, scale, base_ctm)[1]
            line_obj = OcrLine(
                page_obj, line_bbox,
                [0, js_round(base_y) - line_bbox.bottom],
                asc * scale, None)
            for wi, (text, bbox) in enumerate(word_specs):
                wid = f"word_{n + 1}_f{field_idx}_{lift_line_idx}_{wi + 1}"
                word_obj = OcrWord(line_obj, wid, text, bbox)
                word_obj.conf = 100.0
                word_obj.visualCoords = False
                word_obj.lang = calc_lang(text)
                word_obj.style.font = "Helvetica"
                word_obj.style.size = round3(layout["font_size"] * scale)
                line_obj.words.append(word_obj)
                printable += len(text)
            insert_at = next(
                (i for i, l in enumerate(page_obj.lines)
                 if l.bbox.top > line_bbox.top), None)
            if insert_at is None:
                page_obj.lines.append(line_obj)
            else:
                page_obj.lines.insert(insert_at, line_obj)
    return printable
