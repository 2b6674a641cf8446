"""PDF content-stream text-state machine.

Executes the PDF 1.7 text operator set the way the reference's
executeTextOperators does (/root/reference/js/pdf/parsePdfDoc.js:1386-1798):
``q/Q/cm``, ``BT/ET``, ``Tf/Tc/Tw/Tz/TL/Tr/Ts``, ``Tm/Td/TD/T*``,
``Tj/TJ/'/"`` with TJ kerning adjustments, Form XObject recursion with
CTM/text-state inheritance and a cycle set, glyph decode via
ToUnicode ?? encoding ?? chr(code) (:1863-1887), advance =
``(w/1000*Tfs + Tc + (space? Tw)) * Tz/100``, positions emitted in a
top-left-origin page frame, orientation from the direction vector.

Emits PositionedChar records for the grouping pass.
"""

from __future__ import annotations

import math
from itertools import repeat

from .fonts import PdfFont, load_font_cached
from .lexer import Lexer, Name, Ref, StreamObj, DELIMS, WHITESPACE


class PositionedChar:
    __slots__ = (
        "text", "x", "y", "width", "fontSize", "font", "invisible",
        "orientation", "dirX", "dirY", "charCode", "box", "textColor",
        "mcid", "alpha", "renderMode", "strokeWidth", "strokeColor",
    )

    def __init__(self, text, x, y, width, font_size, font, invisible,
                 orientation, dir_x, dir_y, char_code, text_color=None):
        self.text = text
        self.x = x
        self.y = y
        self.width = width
        self.fontSize = font_size
        self.font = font
        self.invisible = invisible
        self.orientation = orientation
        self.dirX = dir_x
        self.dirY = dir_y
        self.charCode = char_code
        # (values, colorspace) of the fill color active at show time —
        # consumed by the underline color-match guard
        self.textColor = text_color
        # marked-content id active at show time (struct-tree linkage)
        self.mcid = None
        # non-stroking alpha from ExtGState /ca (parsePdfDoc.js:1785)
        self.alpha = 1.0
        # faux-bold state: modes 1/2 stroke the outlines, so the pen
        # width scales with the CTM, not the text matrix (:1780-1790)
        self.renderMode = 0
        self.strokeWidth = 0.0
        self.strokeColor = None


def _mat_mul(a, b):
    """3x2 affine: a then b."""
    return [
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    ]


IDENT = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]

_REPEAT_ONE = repeat(1)


class ContentTokenizer:
    """Stream-order (operands..., operator) tokenizer."""

    def __init__(self, data: bytes):
        self.lex = Lexer(data, 0)
        # (dict_text, payload) per BI..ID..EI encountered, in stream
        # order; filled as the iterator passes them (the text machine
        # skips them, the image inventory reads them).
        self.inline_images: list[tuple[bytes, bytes]] = []

    def __iter__(self):
        # Hot loop: whitespace skip, numeric-operand parse and keyword
        # scan are inlined over a local cursor (one Lexer.pos sync per
        # non-numeric operand) — this tokenizer runs once per content
        # stream byte and dominated the extraction profile.
        operands = []
        lex = self.lex
        data = lex.data
        n = len(data)
        ws = WHITESPACE
        dl = DELIMS
        pos = lex.pos
        while True:
            while pos < n:
                c = data[pos]
                if c in ws:
                    pos += 1
                elif c == 0x25:  # '%' comment
                    while pos < n and data[pos] not in b"\r\n":
                        pos += 1
                else:
                    break
            if pos >= n:
                lex.pos = pos
                break
            c = data[pos]
            if (0x30 <= c <= 0x39) or c == 0x2B or c == 0x2D or c == 0x2E:
                # number: same scan as read_token_word + the same
                # ValueError -> 0 fallback as _read_operand
                start = pos
                pos += 1
                while pos < n and data[pos] not in ws and data[pos] not in dl:
                    pos += 1
                tok = data[start:pos]
                try:
                    operands.append(
                        float(tok) if (b"." in tok or b"e" in tok
                                       or b"E" in tok) else int(tok))
                except ValueError:
                    operands.append(0)
                continue
            if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B:
                lex.pos = pos
                try:
                    operands.append(self._read_operand())
                except Exception:
                    lex.pos += 1
                pos = lex.pos
                continue
            # operator keyword
            start = pos
            while pos < n and data[pos] not in ws and data[pos] not in dl:
                pos += 1
            op = data[start:pos]
            if not op:
                pos += 1
                continue
            if op == b"BI":
                pos = self._skip_inline_image(pos)
                operands = []
                continue
            lex.pos = pos
            yield operands, op
            operands = []

    def _skip_inline_image(self, pos: int) -> int:
        """Position just past an inline image's EI. Binary image data
        can contain the bytes "EI", so a bare find() truncates the
        stream mid-image; mirror the reference's tokenizer
        (contentStream.js:264-330): parse the BI..ID dict, compute
        the raw-data length from /W /H /BPC /CS when unfiltered and
        match EI exactly there, else scan for a whitespace-preceded
        EI followed by whitespace/slash/EOF."""
        import re as _re

        data = self.lex.data
        n = len(data)
        i = pos
        dict_start = i
        while i < n:
            if (data[i] == 0x49 and i + 1 < n and data[i + 1] == 0x44
                    and (i == 0 or data[i - 1] in WHITESPACE)
                    and i + 2 < n and data[i + 2] in WHITESPACE):
                break
            i += 1
        else:
            return n
        dict_text = data[dict_start:i]
        data_start = i + 3
        ws_or_slash = set(WHITESPACE) | {0x2F}

        def _capture(end_excl: int, trim_ws: bool) -> None:
            payload = data[data_start:end_excl]
            # the scan path includes the single whitespace delimiter
            # before EI; the computed-length path ends exactly on the
            # last sample byte (which may itself be whitespace-valued)
            if trim_ws and payload and payload[-1] in WHITESPACE:
                payload = payload[:-1]
            self.inline_images.append((dict_text, payload))
        if not _re.search(rb"/(?:F|Filter)\b", dict_text):
            wm = _re.search(rb"/(?:W|Width)\s+(\d+)", dict_text)
            hm = _re.search(rb"/(?:H|Height)\s+(\d+)", dict_text)
            bm = _re.search(rb"/(?:BPC|BitsPerComponent)\s+(\d+)",
                            dict_text)
            if wm and hm:
                w, h = int(wm.group(1)), int(hm.group(1))
                bpc = int(bm.group(1)) if bm else 8
                if _re.search(rb"/CS\s*/(?:RGB|DeviceRGB|CalRGB)\b",
                              dict_text):
                    ncomp = 3
                elif _re.search(rb"/CS\s*/(?:CMYK|DeviceCMYK)\b",
                                dict_text):
                    ncomp = 4
                elif _re.search(rb"/CS\s*/(?:G|DeviceGray|CalGray)\b",
                                dict_text):
                    ncomp = 1
                elif _re.search(rb"/(?:IM|ImageMask)\s+true\b",
                                dict_text):
                    ncomp = 1
                else:
                    ncomp = 0  # Indexed/unknown: fall to the scan
                if ncomp:
                    end = data_start + ((w * ncomp * bpc + 7) // 8) * h
                    if (end + 2 <= n and data[end : end + 2] == b"EI"
                            and (end + 2 == n
                                 or data[end + 2] in ws_or_slash)):
                        _capture(end, trim_ws=False)
                        return end + 2
        i = data_start
        while True:
            j = data.find(b"EI", i)
            if j < 0:
                return n
            if (j > data_start and data[j - 1] in WHITESPACE
                    and (j + 2 >= n or data[j + 2] in ws_or_slash)):
                _capture(j, trim_ws=True)
                return j + 2
            i = j + 1

    def _read_operand(self):
        lex = self.lex
        c = lex.data[lex.pos]
        if c == 0x2F:
            return lex.read_name()
        if c == 0x28:
            return lex.read_literal_string()
        if c == 0x3C:
            if lex.data[lex.pos : lex.pos + 2] == b"<<":
                return lex.read_dict()
            return lex.read_hex_string()
        if c == 0x5B:
            lex.pos += 1
            arr = []
            while True:
                lex.skip_ws()
                if lex.pos >= len(lex.data):
                    return arr        # unterminated array at EOF
                if lex.peek_byte() == 0x5D:
                    lex.pos += 1
                    return arr
                before = lex.pos
                arr.append(self._read_operand())
                if lex.pos == before:
                    # stray delimiter inside a corrupt array (e.g.
                    # '[ ) )') reads as an empty token without
                    # advancing — skip the byte or loop forever
                    lex.pos += 1
        tok = lex.read_token_word()
        try:
            return (float(tok) if b"." in tok or b"e" in tok or b"E" in tok
                    else int(tok))
        except ValueError:
            return 0


def _orientation_from_dir(dx: float, dy: float) -> int:
    """Quadrant orientation from the (top-left-frame) direction vector
    (reference :1846-1856 semantics)."""
    if dx >= 0.5 and abs(dy) < 0.5:
        return 0
    if abs(dx) < 0.5 and dy >= 0.5:
        return 1
    if dx <= -0.5 and abs(dy) < 0.5:
        return 2
    return 3


class TextMachine:
    def __init__(self, doc, page: dict, page_height: float,
                 scale: float = 1.0):
        self.doc = doc
        self.page = page
        self.page_height = page_height
        self.scale = scale
        self.chars: list[PositionedChar] = []
        self._font_cache: dict[int, PdfFont] = {}
        self._xobj_depth = 0
        self._seen_xobjs: set = set()
        self._fill_color = ([0.0], "gray")  # (values, colorspace)
        self._stroke_color = ([0.0], "gray")
        # Separation/DeviceN tint transforms selected by cs/CS
        # (parsePdfDoc.js:1705-1746; colorfn.py evaluates them)
        self._fill_tint = None
        self._stroke_tint = None
        self._fill_alpha = 1.0  # ExtGState /ca via gs (:1753-1766)
        self._line_width = 1.0
        self._cs_cache: dict = {}
        self._gs_cache: dict = {}
        # marked-content stack: BDC pushes the /MCID (or inherits),
        # BMC pushes, EMC pops (structTree.js MCID linkage)
        self._mc_stack: list = []

    # ------------------------------------------------------------ fonts

    def _resolve_font(self, resources, name: str) -> PdfFont | None:
        doc = self.doc
        res = doc.resolve(resources) or {}
        fonts = doc.resolve(res.get("Font")) or {}
        ref = fonts.get(name)
        if ref is None:
            return None
        key = ref.num if isinstance(ref, Ref) else id(ref)
        if key not in self._font_cache:
            # Two-level cache: per-machine for the hot Tf lookup,
            # doc-level underneath so fonts shared across pages and
            # Form XObjects parse once per document
            # (parsePdfFonts.js:796 objCache.fontCache).
            self._font_cache[key] = load_font_cached(
                doc, ref, sibling_fonts=fonts)
        return self._font_cache[key]

    # ---------------------------------------------------- color + gstate

    def _resolve_tint(self, resources, name: str):
        """Named /ColorSpace resource -> parsed Separation/DeviceN tint
        record, or None for device/simple spaces
        (parsePdfDoc.js:1705 `cs` + pdfColorFunctions.js:704)."""
        if name in self._cs_cache:
            return self._cs_cache[name]
        tint = None
        try:
            from .colorfn import parse_tint_colorspace

            res = self.doc.resolve(resources) or {}
            spaces = self.doc.resolve(res.get("ColorSpace")) or {}
            if name in spaces:
                tint = parse_tint_colorspace(self.doc, spaces[name])
        except Exception:
            tint = None
        self._cs_cache[name] = tint
        return tint

    def _component_color(self, operands, tint, current):
        """sc/scn semantics (parsePdfDoc.js:1720-1730): with an active
        tint space, run the tint transform -> RGB; stored raw, a
        Separation component would read as gray and invert."""
        vals = [float(v) for v in operands
                if isinstance(v, (int, float))]
        if not vals:
            return current
        if tint is not None and len(vals) == tint["n_inputs"]:
            try:
                from .colorfn import tint_to_rgb

                rgb = tint_to_rgb(tint, vals)
                if rgb is not None:
                    return (rgb, "rgb")
            except Exception:
                pass
        return (vals, current[1])

    def _resolve_fill_alpha(self, resources, name: str):
        """/ExtGState entry -> its /ca non-stroking alpha
        (parsePdfDoc.js:77 parseFillAlphaExtGStates + :1753-1766)."""
        if name in self._gs_cache:
            return self._gs_cache[name]
        ca = None
        try:
            res = self.doc.resolve(resources) or {}
            states = self.doc.resolve(res.get("ExtGState")) or {}
            entry = self.doc.resolve(states.get(name))
            if isinstance(entry, dict) and "ca" in entry:
                ca = float(self.doc.resolve(entry["ca"]))
        except Exception:
            ca = None
        self._gs_cache[name] = ca
        return ca

    # -------------------------------------------------------- execution

    def run(self, content: bytes, resources, base_ctm=None,
            tokens=None) -> None:
        ctm = list(base_ctm) if base_ctm else list(IDENT)
        self._execute(content, resources, ctm, depth=0,
                      tokens=tokens)

    def _execute(self, content: bytes, resources, ctm, depth: int,
                 tokens=None) -> None:
        doc = self.doc
        gs_stack = []
        font: PdfFont | None = None
        tfs = 0.0
        tc = 0.0
        tw = 0.0
        tz = 100.0
        tl = 0.0
        ts = 0.0
        tr = 0
        tm = list(IDENT)
        tlm = list(IDENT)

        # A pre-tokenized stream (tokens) lets one lexer pass feed
        # both the text and path machines; XObject recursion below
        # still tokenizes its own inner streams.
        for operands, op in (ContentTokenizer(content)
                             if tokens is None else tokens):
            try:
                if op == b"q":
                    gs_stack.append((list(ctm), font, tfs, tc, tw, tz, tl,
                                     ts, tr, self._fill_color,
                                     self._stroke_color, self._fill_tint,
                                     self._stroke_tint, self._fill_alpha,
                                     self._line_width))
                elif op == b"Q":
                    if gs_stack:
                        (ctm_s, font, tfs, tc, tw, tz, tl, ts, tr,
                         self._fill_color, self._stroke_color,
                         self._fill_tint, self._stroke_tint,
                         self._fill_alpha,
                         self._line_width) = gs_stack.pop()
                        ctm[:] = ctm_s
                # Text-positioning/showing ops first: they dominate
                # token counts in text-heavy streams, and the chain is
                # order-independent (ops are distinct values).
                elif op == b"Tj" and operands:
                    tm = self._show(operands[-1], font, tfs, tc, tw, tz, ts,
                                    tr, tm, ctm)
                elif op == b"TJ" and operands and isinstance(operands[-1], list):
                    for item in operands[-1]:
                        if isinstance(item, (int, float)):
                            adv = -float(item) / 1000.0 * tfs * (tz / 100.0)
                            tm = _mat_mul([1, 0, 0, 1, adv, 0], tm)
                        else:
                            tm = self._show(item, font, tfs, tc, tw, tz, ts,
                                            tr, tm, ctm)
                elif op == b"Td" and len(operands) >= 2:
                    tlm = _mat_mul(
                        [1, 0, 0, 1, float(operands[-2]), float(operands[-1])], tlm)
                    tm = list(tlm)
                elif op == b"Tm" and len(operands) >= 6:
                    tm = [float(v) for v in operands[-6:]]
                    tlm = list(tm)
                elif op == b"TD" and len(operands) >= 2:
                    tl = -float(operands[-1])
                    tlm = _mat_mul(
                        [1, 0, 0, 1, float(operands[-2]), float(operands[-1])], tlm)
                    tm = list(tlm)
                elif op == b"T*":
                    tlm = _mat_mul([1, 0, 0, 1, 0, -tl], tlm)
                    tm = list(tlm)
                elif op == b"'" and operands:
                    tlm = _mat_mul([1, 0, 0, 1, 0, -tl], tlm)
                    tm = list(tlm)
                    tm = self._show(operands[-1], font, tfs, tc, tw, tz, ts,
                                    tr, tm, ctm)
                elif op == b'"' and len(operands) >= 3:
                    tw = float(operands[-3])
                    tc = float(operands[-2])
                    tlm = _mat_mul([1, 0, 0, 1, 0, -tl], tlm)
                    tm = list(tlm)
                    tm = self._show(operands[-1], font, tfs, tc, tw, tz, ts,
                                    tr, tm, ctm)
                elif op == b"BT":
                    tm = list(IDENT)
                    tlm = list(IDENT)
                elif op == b"ET":
                    pass
                elif op == b"Tf" and len(operands) >= 2:
                    font = self._resolve_font(resources, str(operands[-2]))
                    tfs = float(operands[-1])
                elif op == b"Tc" and operands:
                    tc = float(operands[-1])
                elif op == b"Tw" and operands:
                    tw = float(operands[-1])
                elif op == b"Tz" and operands:
                    tz = float(operands[-1])
                elif op == b"TL" and operands:
                    tl = float(operands[-1])
                elif op == b"Ts" and operands:
                    ts = float(operands[-1])
                elif op == b"Tr" and operands:
                    tr = int(operands[-1])
                elif op == b"cm" and len(operands) >= 6:
                    m = [float(v) for v in operands[-6:]]
                    ctm[:] = _mat_mul(m, ctm)
                # g/rg/k also select a device color space, deselecting
                # any named space chosen by cs (parsePdfDoc.js:1692)
                elif op == b"g" and operands:
                    self._fill_color = ([float(operands[-1])], "gray")
                    self._fill_tint = None
                elif op == b"rg" and len(operands) >= 3:
                    self._fill_color = (
                        [float(v) for v in operands[-3:]], "rgb")
                    self._fill_tint = None
                elif op == b"k" and len(operands) >= 4:
                    self._fill_color = (
                        [float(v) for v in operands[-4:]], "cmyk")
                    self._fill_tint = None
                elif op == b"G" and operands:
                    self._stroke_color = ([float(operands[-1])], "gray")
                    self._stroke_tint = None
                elif op == b"RG" and len(operands) >= 3:
                    self._stroke_color = (
                        [float(v) for v in operands[-3:]], "rgb")
                    self._stroke_tint = None
                elif op == b"K" and len(operands) >= 4:
                    self._stroke_color = (
                        [float(v) for v in operands[-4:]], "cmyk")
                    self._stroke_tint = None
                elif op == b"cs" and operands:
                    self._fill_tint = self._resolve_tint(
                        resources, str(operands[-1]))
                elif op == b"CS" and operands:
                    self._stroke_tint = self._resolve_tint(
                        resources, str(operands[-1]))
                elif op in (b"sc", b"scn") and operands:
                    self._fill_color = self._component_color(
                        operands, self._fill_tint, self._fill_color)
                elif op in (b"SC", b"SCN") and operands:
                    self._stroke_color = self._component_color(
                        operands, self._stroke_tint, self._stroke_color)
                elif op == b"w" and operands:
                    self._line_width = float(operands[-1])
                elif op == b"gs" and operands:
                    ca = self._resolve_fill_alpha(
                        resources, str(operands[-1]))
                    if ca is not None:
                        self._fill_alpha = ca
                elif op == b"BDC" and len(operands) >= 2:
                    props = operands[-1]
                    mcid = None
                    if isinstance(props, dict):
                        v = props.get("MCID")
                        if isinstance(v, (int, float)):
                            mcid = int(v)
                    inherit = (self._mc_stack[-1]
                               if self._mc_stack else None)
                    self._mc_stack.append(
                        mcid if mcid is not None else inherit)
                elif op == b"BMC":
                    self._mc_stack.append(
                        self._mc_stack[-1] if self._mc_stack else None)
                elif op == b"EMC":
                    if self._mc_stack:
                        self._mc_stack.pop()
                elif op == b"Do" and operands and depth < 8:
                    self._do_xobject(str(operands[-1]), resources, ctm, depth)
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
        if str(doc.resolve(xobj.dict.get("Subtype", ""))) != "Form":
            return
        self._seen_xobjs.add(key)
        try:
            inner_ctm = list(ctm)
            mtx = doc.resolve(xobj.dict.get("Matrix"))
            if mtx:
                inner_ctm = _mat_mul([float(doc.resolve(v)) for v in mtx], ctm)
            inner_res = xobj.dict.get("Resources", res)
            self._execute(doc.stream_data(xobj), inner_res, inner_ctm, depth + 1)
        finally:
            self._seen_xobjs.discard(key)

    # ----------------------------------------------------------- showing

    def _decode_codes(self, data: bytes, font: PdfFont):
        """(charCode, n_bytes) per code. CMaps with mixed codespaces
        (embedded or predefined CJK) split per-range — without this,
        1-byte ASCII codes inside a 2-byte read vanish
        (pdfPrimitives decodeTextCodes)."""
        ranges = font.codespace_ranges
        if ranges is not None:
            i, n = 0, len(data)
            while i < n:
                b0 = data[i]
                for nb, lo, hi in ranges:
                    if nb == 1:
                        if lo <= b0 <= hi:
                            yield b0, 1
                            i += 1
                            break
                    elif nb == 2 and i + 1 < n:
                        c2 = (b0 << 8) | data[i + 1]
                        if lo <= c2 <= hi:
                            yield c2, 2
                            i += 2
                            break
                else:
                    # unmatched: assume 2 bytes when a second exists
                    if i + 1 < n:
                        yield (b0 << 8) | data[i + 1], 2
                        i += 2
                    else:
                        yield b0, 1
                        i += 1
        elif font.two_byte:
            for i in range(0, len(data) - 1, 2):
                yield (data[i] << 8) | data[i + 1], 2
        else:
            for b in data:
                yield b, 1

    def _show(self, data, font, tfs, tc, tw, tz, ts, tr, tm, ctm):
        if not isinstance(data, (bytes, bytearray)) or font is None:
            return tm
        th = tz / 100.0

        # Per-string invariants: the rendering matrix only *translates*
        # along its own x-axis between glyphs, so compute trm once and
        # step positions incrementally (one add per glyph instead of
        # three matrix multiplies).
        trm = _mat_mul(_mat_mul([tfs * th, 0, 0, tfs, 0, ts], tm), ctm)
        scale = self.scale
        page_h = self.page_height
        # x-advance of one text-space unit, in device space
        step_x = tm[0] * ctm[0] + tm[1] * ctm[2]
        step_y = tm[0] * ctm[1] + tm[1] * ctm[3]
        x_dev = trm[4] * scale
        y_dev = trm[5] * scale
        dx, dy = trm[0], trm[1]
        mag = math.hypot(dx, dy) or 1.0
        dir_x = dx / mag
        dir_y = -dy / mag  # flip to top-left frame
        orientation = _orientation_from_dir(dir_x, dir_y)
        font_size_dev = math.hypot(trm[2], trm[3]) * scale
        ctm_scale = math.hypot(ctm[0], ctm[1]) * scale
        invisible = tr == 3
        chars_out = self.chars
        unicode_for = font.unicode_for
        width_for = font.width_for

        cur_mcid = self._mc_stack[-1] if self._mc_stack else None
        fill_alpha = self._fill_alpha
        # Faux-bold: modes 1/2 stroke the glyph outlines with the pen
        # in user space, so the effective width scales with the CTM,
        # not the text matrix (parsePdfDoc.js:1780-1790).
        stroked = tr in (1, 2)
        stroke_width = (self._line_width * math.sqrt(
            abs(ctm[0] * ctm[3] - ctm[1] * ctm[2])) * scale
            if stroked else 0.0)
        stroke_color = self._stroke_color if stroked else None
        adv_total = 0.0
        valid_cids = font.valid_cids
        is_cid = font.cid
        # Code iteration specialized by font shape: the plain 1-byte
        # case (the overwhelming majority) iterates the bytes directly
        # via zip/repeat instead of a per-glyph Python generator.
        if font.codespace_ranges is not None:
            code_iter = self._decode_codes(bytes(data), font)
        elif font.two_byte:
            code_iter = [((data[i] << 8) | data[i + 1], 2)
                         for i in range(0, len(data) - 1, 2)]
        else:
            code_iter = zip(data, _REPEAT_ONE)
        for code, n_bytes in code_iter:
            uni = unicode_for(code)
            if uni is None and is_cid:
                if valid_cids is not None and code not in valid_cids:
                    # The embedded CFF's charset has no glyph for this
                    # CID: a malformed subset reference. Skip emission
                    # AND the advance, exactly as the reference does
                    # (parsePdfDoc.js:1884 `continue`).
                    continue
                # Unmapped (in-charset, or no program constrains): the
                # reference's String.fromCharCode fallback
                # (parsePdfDoc.js:1885). Right by construction for
                # Identity CIDs-as-codepoints and UCS2-coded CMaps —
                # a CID font with no ToUnicode otherwise emits nothing.
                uni = chr(code) if 0 < code < 0x110000 else None
            w0 = width_for(code) / 1000.0
            # Tw applies to the single-byte code 32 only (PDF 32000-1
            # 9.3.3; parsePdfDoc.js:1950 isWordSpace).
            is_space = (n_bytes == 1 and code == 32)
            adv = (w0 * tfs + tc + (tw if is_space else 0.0)) * th
            if uni:
                # whitespace collapse (reference :1889)
                text = " " if uni.isspace() else uni
                pc = PositionedChar(
                    text,
                    x_dev + adv_total * step_x * scale,
                    page_h - (y_dev + adv_total * step_y * scale),
                    abs(adv) * ctm_scale,
                    font_size_dev,
                    font,
                    invisible,
                    orientation,
                    dir_x, dir_y, code,
                    self._fill_color,
                )
                pc.mcid = cur_mcid
                pc.alpha = fill_alpha
                if stroked:
                    pc.renderMode = tr
                    pc.strokeWidth = stroke_width
                    pc.strokeColor = stroke_color
                chars_out.append(pc)
            adv_total += adv
        return _mat_mul([1, 0, 0, 1, adv_total, 0], tm)
