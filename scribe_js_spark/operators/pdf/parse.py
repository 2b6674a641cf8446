"""Per-page PDF orchestration: bytes -> OcrPage list.

Mirrors parseSinglePage (/root/reference/js/pdf/parsePdfDoc.js:464-1181):
CropBox/Rotate -> initial CTM, 3500px width cap (:500-509), text
operators, glyph dedup (:597-628), chars -> lines -> words grouping,
per-page stats for document-type classification (determinePdfType,
:417-444).
"""

from __future__ import annotations

import math

from ...functions.stats import js_round
from ...model import OcrPage
from .content import ContentTokenizer, TextMachine, _mat_mul
from .document import PdfDocument
from .group import group_chars_into_page
from .paths import extract_underline_rects, parse_page_paths

MAX_RENDER_WIDTH = 3500.0  # reference cap, parsePdfDoc.js:503


def _page_geometry(doc: PdfDocument, page: dict):
    box = doc.resolve(page.get("CropBox")) or doc.resolve(
        page.get("MediaBox")) or [0, 0, 612, 792]
    box = [float(doc.resolve(v)) for v in box]
    x0, y0, x1, y1 = min(box[0], box[2]), min(box[1], box[3]), \
        max(box[0], box[2]), max(box[1], box[3])
    rotate = int(doc.resolve(page.get("Rotate", 0)) or 0) % 360
    w = x1 - x0
    h = y1 - y0
    if rotate in (90, 270):
        w, h = h, w
    scale = min(MAX_RENDER_WIDTH / w, 1.0) if w > MAX_RENDER_WIDTH else 1.0
    return (x0, y0, x1, y1), rotate, w, h, scale


def _base_ctm(box, rotate):
    """Transform from PDF user space to an upright space whose origin is
    the (rotated) crop box corner."""
    x0, y0, x1, y1 = box
    # translate crop origin to 0
    m = [1, 0, 0, 1, -x0, -y0]
    w = x1 - x0
    h = y1 - y0
    if rotate == 90:
        # rotate -90 so content reads upright: (x,y) -> (y, w - x)
        m = _mat_mul(m, [0, 1, -1, 0, h, 0])
    elif rotate == 180:
        m = _mat_mul(m, [-1, 0, 0, -1, w, h])
    elif rotate == 270:
        m = _mat_mul(m, [0, -1, 1, 0, 0, w])
    return m


def _dedup_chars(chars):
    """Glyph dedup: layered/re-stamped text — same text+font+size bucket
    within 3x3 coordinate buckets of max(0.25, 0.05*fontSize)
    (parsePdfDoc.js:597-628)."""
    # Buckets keyed per identity, with (bx, by) packed into one int so
    # the 3x3 neighborhood probe hashes ints instead of rebuilding and
    # re-hashing a nested tuple nine times per char (hot path).
    B = 1 << 32
    deltas = (-B - 1, -B, -B + 1, -1, 0, 1, B - 1, B, B + 1)
    seen: dict = {}
    out = []
    for ch in chars:
        tol = 0.05 * ch.fontSize
        if tol < 0.25:
            tol = 0.25
        key = int(ch.x / tol) * B + int(ch.y / tol)
        ident = (ch.text, id(ch.font), int(ch.fontSize * 10 + 0.5))
        bucket = seen.get(ident)
        if bucket is None:
            seen[ident] = {key}
            out.append(ch)
        else:
            for d in deltas:
                if key + d in bucket:
                    break
            else:
                bucket.add(key)
                out.append(ch)
    return out


def page_stats(chars) -> dict:
    """Per-page scalar stats feeding document-type classification
    (scorePageChars, parsePdfDoc.js:383-410)."""
    printable = 0
    control = 0
    invisible = 0
    visible = 0
    for ch in chars:
        for u in ch.text:
            code = ord(u)
            if code < 32 or 0xFFF0 <= code <= 0xFFFF:
                control += 1
            elif u != " ":
                printable += 1
                if ch.invisible:
                    invisible += 1
                else:
                    visible += 1
    return {
        "printable": printable, "control": control,
        "invisible": invisible, "visible": visible,
    }


def determine_pdf_type(stats_per_page: list[dict]) -> str:
    """'text' | 'ocr' | 'image' from per-page scores
    (determinePdfType, parsePdfDoc.js:417-444): score = printable -
    5*control, threshold 100/page; visible >= 0.9*total on at least
    half the scoring pages -> text, else ocr."""
    text_pages = 0
    ocr_pages = 0
    for st in stats_per_page:
        score = st["printable"] - 5 * st["control"]
        if score >= 100:
            if st["visible"] >= 0.9 * (st["visible"] + st["invisible"]):
                text_pages += 1
            else:
                ocr_pages += 1
    n = max(len(stats_per_page), 1)
    if text_pages >= n / 2:
        return "text"
    if ocr_pages >= n / 2:
        return "ocr"
    return "image"


def pdf_document_type(data: bytes) -> str:
    """Classify a PDF as 'text' | 'ocr' | 'image' from per-page char
    statistics (the reference's OCR-routing gate, SURVEY.md §2.4:
    determinePdfType + computeRequiresOCR)."""
    doc = PdfDocument(data)
    stats = []
    for page in doc.get_pages():
        box, rotate, w, h, scale = _page_geometry(doc, page)
        machine = TextMachine(doc, page, page_height=h * scale, scale=scale)
        machine.run(doc.page_content(page), page.get("Resources"),
                    base_ctm=_base_ctm(box, rotate))
        st = page_stats(_dedup_chars(machine.chars))
        # Field values count toward the text-native verdict: a form
        # with no other text still classifies as text
        # (parsePdfDoc.js:1171-1172 printableVis).
        try:
            from .formfields import collect_field_values

            n_field = sum(
                len(t) for fld in collect_field_values(doc, page)
                for t in fld["value"].split())
            st["printable"] += n_field
            st["visible"] += n_field
        except Exception:
            pass
        stats.append(st)
    return determine_pdf_type(stats)


def _page_has_math(chars) -> bool:
    """Gate for the built-up-math grouping exemptions
    (parsePdfDoc.js:652-661): >= 8 visible glyphs from a math font, or
    >= 6 math-only Unicode chars that also clear a density floor so a
    few strays on a long prose page cannot trip it."""
    from .group import MATH_CHAR_RE, is_math_font

    math_font = 0
    math_char = 0
    printable_vis = 0
    # Per-char-string regex verdicts memoized (a page repeats a small
    # glyph alphabet; this loop was a top re.search profile entry).
    char_memo: dict = {}
    for ch in chars:
        if ch.invisible or not ch.text:
            continue
        cp = ord(ch.text[0])
        if is_math_font(ch.font.base_name):
            math_font += 1
        is_math_char = char_memo.get(ch.text)
        if is_math_char is None:
            is_math_char = char_memo[ch.text] = bool(
                MATH_CHAR_RE.search(ch.text))
        if is_math_char:
            math_char += 1
        if (33 <= cp <= 127) or (cp >= 161
                                 and not (0xE000 <= cp <= 0xF8FF)):
            printable_vis += 1
    return (math_font >= 8
            or (math_char >= 6 and math_char >= printable_vis * 0.0008))


def pdf_page_stats(data: bytes) -> list[dict]:
    """Extended per-page PageStats (image/path counters, broken-font
    runs, body-band readable chars) feeding selectOcrPages — see
    operators/pdf/ocr_selection.py."""
    from .ocr_selection import page_stats_extended

    doc = PdfDocument(data)
    out = []
    for page in doc.get_pages():
        box, rotate, w, h, scale = _page_geometry(doc, page)
        machine = TextMachine(doc, page, page_height=h * scale,
                              scale=scale)
        base = _base_ctm(box, rotate)
        tokens = list(ContentTokenizer(doc.page_content(page)))
        machine.run(doc.page_content(page), page.get("Resources"),
                    base_ctm=base, tokens=tokens)
        chars = _dedup_chars(machine.chars)
        try:
            paths, placements = parse_page_paths(
                doc, page, base_ctm=base, tokens=tokens)
        except Exception:
            paths, placements = [], []
        out.append(page_stats_extended(
            chars, paths, placements, w, h, scale))
    return out


def map_annot_point(x: float, y: float, page_h_pts: float,
                    scale: float, base_ctm=None) -> tuple[float, float]:
    """PDF user-space point -> top-down device px, through the page's
    initial CTM so rotated/offset crop boxes land where their text
    does (the reference maps annots via mapPoint + initialCtm,
    parsePdfDoc.js:1032-1146)."""
    if base_ctm is not None:
        a, b, c, d, e, f = base_ctm
        ux = a * x + c * y + e
        uy = b * x + d * y + f
    else:
        ux, uy = x, y
    return ux * scale, (page_h_pts - uy) * scale


def _stamp_link_words(doc, page: dict, page_obj,
                      page_h_pts: float, scale: float,
                      base_ctm=None) -> None:
    """Words whose center sits inside a /Link annotation's /Rect take
    the link's /A /URI (parsePdfDoc.js:1032-1063)."""
    annots = doc.resolve(page.get("Annots"))
    if not isinstance(annots, list):
        return
    boxes = []
    for ref in annots:
        a = doc.resolve(ref)
        if not isinstance(a, dict) \
                or str(doc.resolve(a.get("Subtype", ""))) != "Link":
            continue
        action = doc.resolve(a.get("A"))
        if not isinstance(action, dict):
            continue
        uri = doc.resolve(action.get("URI"))
        if isinstance(uri, (bytes, bytearray)):
            uri = bytes(uri).decode("latin-1", "replace")
        if not isinstance(uri, str) or not uri:
            continue
        rect = doc.resolve(a.get("Rect"))
        if not isinstance(rect, list) or len(rect) != 4:
            continue
        try:
            x0, y0, x1, y1 = (float(doc.resolve(v)) for v in rect)
        except (TypeError, ValueError):
            continue
        pa = map_annot_point(x0, y0, page_h_pts, scale, base_ctm)
        pb = map_annot_point(x1, y1, page_h_pts, scale, base_ctm)
        boxes.append((min(pa[0], pb[0]), min(pa[1], pb[1]),
                      max(pa[0], pb[0]), max(pa[1], pb[1]), uri))
    if not boxes:
        return
    for line in page_obj.lines:
        for word in line.words:
            cx = (word.bbox.left + word.bbox.right) / 2
            cy = (word.bbox.top + word.bbox.bottom) / 2
            for left, top, right, bottom, uri in boxes:
                if left <= cx <= right and top <= cy <= bottom:
                    word.style.link = uri
                    break


def parse_pdf_document(data: bytes) -> list[OcrPage]:
    doc = PdfDocument(data)
    pages = doc.get_pages()
    out = []
    for n, page in enumerate(pages):
        box, rotate, w, h, scale = _page_geometry(doc, page)
        machine = TextMachine(doc, page, page_height=h * scale, scale=scale)
        base = _base_ctm(box, rotate)
        content = doc.page_content(page)
        # One lexer pass feeds both the text and path machines (each
        # used to re-tokenize the same stream).
        tokens = list(ContentTokenizer(content))
        machine.run(content, page.get("Resources"), base_ctm=base,
                    tokens=tokens)
        chars = _dedup_chars(machine.chars)
        # Vector paths -> underline candidates + drawn rules
        try:
            paths, _placements = parse_page_paths(
                doc, page, base_ctm=base, tokens=tokens)
            underline_rects = extract_underline_rects(paths, scale, h)
        except Exception:
            paths, underline_rects = [], []
        page_obj = group_chars_into_page(
            chars, n,
            {"width": js_round(w * scale), "height": js_round(h * scale)},
            underline_rects=underline_rects,
            page_has_math=_page_has_math(chars))
        # Rects not consumed as underlines stay as separator rules
        # (parsePdfDoc.js:1013)
        page_obj.rules = [
            {"y": r["y"], "left": r["left"], "right": r["right"]}
            for r in underline_rects if not r["isUnderline"]]
        # PDF-side table regions (ruled grids + numeric clusters)
        try:
            from .tables_pdf import detect_pdf_table_regions

            page_obj.tables = detect_pdf_table_regions(
                page_obj, paths, scale, h)
        except Exception:
            page_obj.tables = []
        # Filled AcroForm values are page text: lay each visible
        # Tx/Ch widget's /V out inside its /Rect and splice the lines
        # in top order (parsePdfDoc.js:1091-1176).
        try:
            from .formfields import insert_form_field_lines

            insert_form_field_lines(doc, page, page_obj, h, scale,
                                    base_ctm=base)
        except Exception:
            pass
        # Words under a /Link annotation's box carry its URI
        # (parsePdfDoc.js:1032-1063 uriBoxes -> word.style.link).
        try:
            _stamp_link_words(doc, page, page_obj, h, scale,
                              base_ctm=base)
        except Exception:
            pass
        out.append(page_obj)
    return out
