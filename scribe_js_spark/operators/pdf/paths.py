"""PDF vector-path extraction (parsePagePaths).

Mirrors /root/reference/js/pdf/parsePdfPaths.js:56-596: a graphics-state
machine over the content stream collecting every *painted* path —
``m/l/c/v/y/h/re`` construction, ``q/Q/cm`` state, line
width/cap/join/dash, gray/RGB/CMYK/named color operators, the full
paint-operator family (S/s/f/F/f*/B/B*/b/b*; ``n`` discards), and Form
XObject recursion with /Matrix CTM inheritance and a cycle set. Image
placements (surviving ``Do`` + inline images) are collected as the unit
square through the live CTM (:215-240).

Consumers: underline/rule extraction (parsePdfDoc.js:843-1013) and the
PDF-side table detector.
"""

from __future__ import annotations

import math

from .content import IDENT, ContentTokenizer, _mat_mul
from .lexer import Ref, StreamObj


class PaintedPath:
    __slots__ = ("commands", "fill", "stroke", "evenOdd", "fillColor",
                 "fillColorSpace", "strokeColor", "strokeColorSpace",
                 "lineWidth", "dashArray")

    def __init__(self, commands, fill, stroke, even_odd, fill_color,
                 fill_cs, stroke_color, stroke_cs, line_width, dash_array):
        self.commands = commands
        self.fill = fill
        self.stroke = stroke
        self.evenOdd = even_odd
        self.fillColor = fill_color
        self.fillColorSpace = fill_cs
        self.strokeColor = stroke_color
        self.strokeColorSpace = stroke_cs
        self.lineWidth = line_width
        self.dashArray = dash_array


def _xform(x, y, m):
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


def _ctm_scale(m):
    return math.sqrt(abs(m[0] * m[3] - m[1] * m[2]))


class PathMachine:
    """Collects painted paths (and image placements) from one page."""

    def __init__(self, doc):
        self.doc = doc
        self.paths: list[PaintedPath] = []
        self.image_placements: list[tuple] = []
        self._seen_xobjs: set = set()

    def run(self, content: bytes, resources, base_ctm=None,
            tokens=None) -> None:
        ctm = list(base_ctm) if base_ctm else list(IDENT)
        self._execute(content, resources, ctm, depth=0,
                      tokens=tokens)

    # ---------------------------------------------------------------

    def _record_image(self, ctm):
        corners = [_xform(0, 0, ctm), _xform(1, 0, ctm),
                   _xform(0, 1, ctm), _xform(1, 1, ctm)]
        xs = [p[0] for p in corners]
        ys = [p[1] for p in corners]
        self.image_placements.append(
            (min(xs), min(ys), max(xs), max(ys)))

    def _execute(self, content: bytes, resources, ctm, depth: int,
                 tokens=None) -> None:
        gs_stack = []
        fill_color = [0.0]
        fill_cs = "gray"
        stroke_color = [0.0]
        stroke_cs = "gray"
        line_width = 1.0
        dash_array: list = []
        cur = []            # current path commands (pre-CTM)
        cur_x = cur_y = 0.0
        start_x = start_y = 0.0

        def nums(operands, k):
            vals = []
            for v in operands[-k:]:
                vals.append(float(v) if isinstance(v, (int, float)) else 0.0)
            return vals

        def emit(fill, stroke, even_odd):
            nonlocal cur
            if not cur:
                return
            cmds = []
            for c in cur:
                if c[0] in ("M", "L"):
                    x, y = _xform(c[1], c[2], ctm)
                    cmds.append((c[0], x, y))
                elif c[0] == "C":
                    p1 = _xform(c[1], c[2], ctm)
                    p2 = _xform(c[3], c[4], ctm)
                    p3 = _xform(c[5], c[6], ctm)
                    cmds.append(("C", p1[0], p1[1], p2[0], p2[1],
                                 p3[0], p3[1]))
                else:
                    cmds.append(("Z",))
            self.paths.append(PaintedPath(
                cmds, fill, stroke, even_odd, list(fill_color), fill_cs,
                list(stroke_color), stroke_cs,
                line_width * _ctm_scale(ctm), list(dash_array)))
            cur = []

        # A pre-tokenized stream (tokens) lets one lexer pass feed
        # both the text and path machines; XObject recursion below
        # still tokenizes its own inner streams.
        for operands, op in (ContentTokenizer(content)
                             if tokens is None else tokens):
            try:
                if op == b"q":
                    gs_stack.append((list(ctm), list(fill_color), fill_cs,
                                     list(stroke_color), stroke_cs,
                                     line_width, list(dash_array)))
                elif op == b"Q":
                    if gs_stack:
                        (ctm_s, fill_color, fill_cs, stroke_color,
                         stroke_cs, line_width, dash_array) = gs_stack.pop()
                        ctm[:] = ctm_s
                elif op == b"cm" and len(operands) >= 6:
                    ctm[:] = _mat_mul(nums(operands, 6), ctm)
                elif op == b"w" and operands:
                    line_width = nums(operands, 1)[0]
                elif op == b"d" and len(operands) >= 2:
                    arr = operands[-2]
                    dash_array = (
                        [float(v) for v in arr
                         if isinstance(v, (int, float))]
                        if isinstance(arr, list) else [])
                elif op == b"g" and operands:
                    fill_color, fill_cs = nums(operands, 1), "gray"
                elif op == b"G" and operands:
                    stroke_color, stroke_cs = nums(operands, 1), "gray"
                elif op == b"rg" and len(operands) >= 3:
                    fill_color, fill_cs = nums(operands, 3), "rgb"
                elif op == b"RG" and len(operands) >= 3:
                    stroke_color, stroke_cs = nums(operands, 3), "rgb"
                elif op == b"k" and len(operands) >= 4:
                    fill_color, fill_cs = nums(operands, 4), "cmyk"
                elif op == b"K" and len(operands) >= 4:
                    stroke_color, stroke_cs = nums(operands, 4), "cmyk"
                elif op == b"cs" and operands:
                    fill_cs = str(operands[-1])
                elif op == b"CS" and operands:
                    stroke_cs = str(operands[-1])
                elif op in (b"sc", b"scn") and operands:
                    fill_color = [float(v) for v in operands
                                  if isinstance(v, (int, float))]
                elif op in (b"SC", b"SCN") and operands:
                    stroke_color = [float(v) for v in operands
                                    if isinstance(v, (int, float))]
                elif op == b"m" and len(operands) >= 2:
                    cur_x, cur_y = nums(operands, 2)
                    start_x, start_y = cur_x, cur_y
                    cur.append(("M", cur_x, cur_y))
                elif op == b"l" and len(operands) >= 2:
                    cur_x, cur_y = nums(operands, 2)
                    cur.append(("L", cur_x, cur_y))
                elif op == b"c" and len(operands) >= 6:
                    v = nums(operands, 6)
                    cur.append(("C", v[0], v[1], v[2], v[3], v[4], v[5]))
                    cur_x, cur_y = v[4], v[5]
                elif op == b"v" and len(operands) >= 4:
                    v = nums(operands, 4)
                    cur.append(("C", cur_x, cur_y, v[0], v[1], v[2], v[3]))
                    cur_x, cur_y = v[2], v[3]
                elif op == b"y" and len(operands) >= 4:
                    v = nums(operands, 4)
                    cur.append(("C", v[0], v[1], v[2], v[3], v[2], v[3]))
                    cur_x, cur_y = v[2], v[3]
                elif op == b"h":
                    cur.append(("Z",))
                    cur_x, cur_y = start_x, start_y
                elif op == b"re" and len(operands) >= 4:
                    rx, ry, rw, rh = nums(operands, 4)
                    cur.extend((("M", rx, ry), ("L", rx + rw, ry),
                                ("L", rx + rw, ry + rh), ("L", rx, ry + rh),
                                ("Z",)))
                    cur_x, cur_y = rx, ry
                    start_x, start_y = rx, ry
                elif op == b"S":
                    emit(False, True, False)
                elif op == b"s":
                    cur.append(("Z",))
                    emit(False, True, False)
                elif op in (b"f", b"F"):
                    emit(True, False, False)
                elif op == b"f*":
                    emit(True, False, True)
                elif op == b"B":
                    emit(True, True, False)
                elif op == b"B*":
                    emit(True, True, True)
                elif op == b"b":
                    cur.append(("Z",))
                    emit(True, True, False)
                elif op == b"b*":
                    cur.append(("Z",))
                    emit(True, True, True)
                elif op == b"n":
                    cur = []
                elif op == b"Do" and operands and depth < 8:
                    self._do_xobject(str(operands[-1]), resources, ctm,
                                     depth)
            except Exception:
                continue

    def _do_xobject(self, name: str, resources, ctm, depth: int) -> None:
        doc = self.doc
        res = doc.resolve(resources) or {}
        xobjs = doc.resolve(res.get("XObject")) or {}
        ref = xobjs.get(name)
        if ref is None:
            return
        key = ref.num if isinstance(ref, Ref) else id(ref)
        if key in self._seen_xobjs:
            return
        xobj = doc.resolve(ref)
        if not isinstance(xobj, StreamObj):
            return
        subtype = str(doc.resolve(xobj.dict.get("Subtype", "")))
        if subtype != "Form":
            # A surviving Do is an image placement (unit square via CTM)
            self._record_image(ctm)
            return
        self._seen_xobjs.add(key)
        try:
            inner_ctm = list(ctm)
            mtx = doc.resolve(xobj.dict.get("Matrix"))
            if mtx:
                inner_ctm = _mat_mul(
                    [float(doc.resolve(v)) for v in mtx], ctm)
            inner_res = xobj.dict.get("Resources", res)
            self._execute(doc.stream_data(xobj), inner_res, inner_ctm,
                          depth + 1)
        finally:
            self._seen_xobjs.discard(key)


def parse_page_paths(doc, page: dict, base_ctm=None, tokens=None):
    """All painted paths of one page (+ image placements)."""
    machine = PathMachine(doc)
    machine.run(doc.page_content(page), page.get("Resources"),
                base_ctm=base_ctm, tokens=tokens)
    return machine.paths, machine.image_placements


def extract_underline_rects(paths, scale: float, page_h_pts: float):
    """Thin horizontal bars from painted paths, in the scaled top-left
    page frame (parsePdfDoc.js:843-996): whole paths whose M/L extent is
    < 2pt tall and > 10pt wide, plus thin bars mined from curve-free
    axis-aligned rectangle subpaths (decorative double rules packed into
    one filled path). Returns [{left, right, y, color, isUnderline}]."""
    rects = []

    def push(min_x, max_x, max_y, color):
        rects.append({
            "left": min_x * scale, "right": max_x * scale,
            "y": (page_h_pts - max_y) * scale,
            "color": color, "isUnderline": False,
        })

    for path in paths:
        if not path.fill and not path.stroke:
            continue
        line_color = (path.strokeColor if path.stroke else path.fillColor,
                      path.strokeColorSpace if path.stroke
                      else path.fillColorSpace)
        min_x = min_y = math.inf
        max_x = max_y = -math.inf
        has_curve = False
        for c in path.commands:
            if c[0] == "C":
                has_curve = True
            elif c[0] in ("M", "L"):
                if c[1] < min_x:
                    min_x = c[1]
                if c[1] > max_x:
                    max_x = c[1]
                if c[2] < min_y:
                    min_y = c[2]
                if c[2] > max_y:
                    max_y = c[2]
        if max_x - min_x > 10 and max_y - min_y < 2:
            push(min_x, max_x, max_y, line_color)
            continue
        if has_curve:
            continue
        # Mine rectangle subpaths for thin bars
        subpaths = []
        for c in path.commands:
            if c[0] == "M":
                subpaths.append([(c[1], c[2])])
            elif c[0] == "L" and subpaths:
                subpaths[-1].append((c[1], c[2]))
        for pts in subpaths:
            if not (4 <= len(pts) <= 5):
                continue
            ok = True
            for i in range(len(pts)):
                x1, y1 = pts[i]
                x2, y2 = pts[(i + 1) % len(pts)]
                if abs(x2 - x1) > 0.01 and abs(y2 - y1) > 0.01:
                    ok = False
                    break
            if not ok:
                continue
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            if max(xs) - min(xs) > 10 and max(ys) - min(ys) < 2:
                push(min(xs), max(xs), max(ys), line_color)
    return rects


def color_to_rgb(color) -> list | None:
    """(values, colorspace) -> approximate [r, g, b] in 0..1
    (the reference's colorToRgb normalization for the underline color
    guard)."""
    if color is None:
        return None
    vals, cs = color if isinstance(color, tuple) else (color, None)
    if not vals:
        return None
    try:
        if len(vals) == 1:
            v = float(vals[0])
            return [v, v, v]
        if len(vals) == 3:
            if any(v > 1.5 for v in vals):  # Lab-style: L 0-100 first
                lum = max(0.0, min(1.0, float(vals[0]) / 100.0))
                return [lum, lum, lum]
            return [float(v) for v in vals]
        if len(vals) == 4:
            from .colorfn import cmyk_to_rgb

            # Adobe-calibrated polynomial (pdfColorFunctions.js:611),
            # matching the reference's colorToRgb exactly.
            r, g, b = cmyk_to_rgb(*(float(v) for v in vals))
            return [r / 255.0, g / 255.0, b / 255.0]
    except (TypeError, ValueError):
        return None
    return None
