"""JBIG2 decoder — generic-region subset (ITU-T T.88).

From-scratch implementation of the bilevel codec's generic-region
path, the shape CCITT didn't cover in scanned PDFs
(reference: /root/reference/js/pdf/codecs/decodeJBIG2.js:345-459
decodeBitmap, :915-1048 segment headers, :1251-1561 chunk walk):

- segment-header parsing for the EMBEDDED (PDF ``JBIG2Decode``)
  organization — no file header, optional /JBIG2Globals stream — and
  the standalone file organization (8-byte magic + flags);
- generic region decoding, arithmetic templates 0-3 with nominal or
  custom AT pixels and TPGDON typical-prediction rows (pseudo-pixel
  contexts 0x9B25/0x0795/0xE5/0x195, T.88 6.2.5.7), context built
  MSB-first over the template+AT positions sorted by (y, x);
- MMR generic regions through the existing T.6 codec (ccitt.py);
- page composition: immediate generic regions OR'd onto the page
  bitmap at their region offsets.

Symbol-dictionary / text-region / halftone / refinement segments
raise NotImplementedError — surfaced as honest error columns by the
image pipeline, never a crash. The matching encoder
(:func:`build_jbig2_embedded`) exists for fixture generation.
"""

from __future__ import annotations

import struct

from .mq import MQDecoder, MQEncoder, new_contexts

#: template pixel positions (x, y) BEFORE the AT pixels are merged
#: (T.88 figures 4-7; reference CodingTemplates, decodeJBIG2.js:116).
_TEMPLATES = {
    0: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1),
        (1, -1), (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1),
        (0, -1), (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1),
        (1, -1), (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0),
        (-3, 0), (-2, 0), (-1, 0)],
}

#: nominal AT pixel positions per template (T.88 6.2.5.3).
NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}

#: TPGDON pseudo-pixel context per template (T.88 6.2.5.7).
_TPGDON_CTX = (0x9B25, 0x0795, 0x00E5, 0x0195)


def _positions(template: int, at: list[tuple[int, int]]):
    pos = _TEMPLATES[template] + list(at)
    pos.sort(key=lambda p: (p[1], p[0]))
    return pos


def decode_generic_bitmap(data: bytes, width: int, height: int,
                          template: int = 0,
                          at: list[tuple[int, int]] | None = None,
                          mmr: bool = False,
                          tpgdon: bool = False) -> list[list[int]]:
    """Generic-region bitmap -> rows of 0/1 (1 = black)."""
    if mmr:
        from .ccitt import decode_g4

        return decode_g4(data, width, height)
    if at is None:
        at = NOMINAL_AT[template]
    pos = _positions(template, at)
    n = len(pos)
    dec = MQDecoder(data)
    cx = new_contexts(1 << n)
    rows: list[list[int]] = []
    ltp = 0
    pseudo = _TPGDON_CTX[template]
    for y in range(height):
        if tpgdon:
            ltp ^= dec.decode(cx[pseudo])
            if ltp:
                rows.append(list(rows[-1]) if rows else [0] * width)
                continue
        row = [0] * width
        rows.append(row)
        for x in range(width):
            ctx = 0
            for k, (dx, dy) in enumerate(pos):
                xx, yy = x + dx, y + dy
                if 0 <= xx < width and yy >= 0 and (
                        yy < y or (yy == y and xx < x)):
                    if rows[yy][xx]:
                        ctx |= 1 << (n - 1 - k)
            row[x] = dec.decode(cx[ctx])
    return rows


def encode_generic_bitmap(rows: list[list[int]], template: int = 0,
                          mmr: bool = False,
                          tpgdon: bool = False) -> bytes:
    """Inverse of :func:`decode_generic_bitmap` (nominal AT only) —
    fixture generation."""
    height = len(rows)
    width = len(rows[0]) if rows else 0
    if mmr:
        from .ccitt import encode_g4

        return encode_g4(rows, width)
    at = NOMINAL_AT[template]
    pos = _positions(template, at)
    n = len(pos)
    enc = MQEncoder()
    cx = new_contexts(1 << n)
    pseudo = _TPGDON_CTX[template]
    ltp = 0
    prev: list[int] | None = None
    for y in range(height):
        if tpgdon:
            # SLTP toggles LTP (decoder does ltp ^= sltp); encode the
            # toggle that lands LTP on "this row repeats the last"
            desired = 1 if (prev is not None and rows[y] == prev) else 0
            enc.encode(cx[pseudo], desired ^ ltp)
            ltp = desired
            if ltp:
                prev = rows[y]
                continue
        for x in range(width):
            ctx = 0
            for k, (dx, dy) in enumerate(pos):
                xx, yy = x + dx, y + dy
                if 0 <= xx < width and 0 <= yy and (
                        yy < y or (yy == y and xx < x)):
                    if rows[yy][xx]:
                        ctx |= 1 << (n - 1 - k)
            enc.encode(cx[ctx], rows[y][x])
        prev = rows[y]
    return enc.flush()


# --------------------------------------------------------- segments


_FILE_MAGIC = b"\x97JB2\r\n\x1a\n"

#: allocation bound for corrupt headers: 64 Mpixel (~A0 at 600 dpi) —
#: a fuzzed width/height field must not become a multi-GB np.full
_MAX_PIXELS = 1 << 26


def _read_segment_header(data: bytes, pos: int):
    """T.88 7.2 -> (header dict, next position)."""
    if pos + 11 > len(data):
        raise ValueError("jbig2: truncated segment header")
    number = struct.unpack(">I", data[pos:pos + 4])[0]
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    pos += 5
    rts = data[pos]
    count = rts >> 5
    if count == 7:
        count = struct.unpack(">I", data[pos:pos + 4])[0] & 0x1FFFFFFF
        if count > len(data):
            # a corrupt long-form count would spin the referred-to
            # loop for up to 2^29 iterations — bound it by the bytes
            # that could possibly hold the numbers
            raise ValueError("jbig2: implausible referred-to count")
        pos += 4 + (count + 8) // 8
    else:
        pos += 1
    ref_size = 1 if number <= 256 else 2 if number <= 65536 else 4
    referred = []
    for _ in range(count):
        chunk = data[pos:pos + ref_size]
        referred.append(int.from_bytes(chunk, "big"))
        pos += ref_size
    if page_assoc_4:
        page = struct.unpack(">I", data[pos:pos + 4])[0]
        pos += 4
    else:
        page = data[pos]
        pos += 1
    length = struct.unpack(">I", data[pos:pos + 4])[0]
    pos += 4
    return {"number": number, "type": seg_type, "referred": referred,
            "page": page, "length": length}, pos


_UNSUPPORTED = {
    0: "symbol dictionary", 4: "text region", 6: "text region",
    7: "text region", 16: "pattern dictionary", 20: "halftone region",
    22: "halftone region", 23: "halftone region",
    40: "refinement region", 42: "refinement region",
    43: "refinement region",
}


def decode_jbig2(data: bytes, globals_data: bytes = b""):
    """Embedded-organization JBIG2 (PDF JBIG2Decode payload, with an
    optional /JBIG2Globals stream prepended) -> numpy uint8 bitmap,
    1 = black ink. The standalone file organization (magic header) is
    detected and unwrapped. Unsupported segment families raise
    NotImplementedError naming the first offending type."""
    import numpy as np

    if data[:8] == _FILE_MAGIC:
        flags = data[8]
        pos = 9 if flags & 2 else 13  # unknown-page-count bit
        data = data[pos:]

    page = None
    page_default = 0
    for chunk in (globals_data, data):
        pos = 0
        while pos < len(chunk):
            hdr, pos = _read_segment_header(chunk, pos)
            length = hdr["length"]
            if length == 0xFFFFFFFF:
                raise NotImplementedError(
                    "jbig2: unknown-length segment")
            body = chunk[pos:pos + length]
            pos += length
            t = hdr["type"]
            if t in _UNSUPPORTED:
                raise NotImplementedError(f"jbig2: {_UNSUPPORTED[t]}")
            if t == 48:                      # page information
                if len(body) < 17:
                    raise ValueError("jbig2: short page info")
                pw, ph = struct.unpack(">II", body[:8])
                pflags = body[16]
                page_default = (pflags >> 2) & 1
                if ph == 0xFFFFFFFF:
                    page = None              # striped; size by regions
                else:
                    if pw * ph > _MAX_PIXELS:
                        raise ValueError("jbig2: implausible page size")
                    page = np.full((ph, pw), page_default,
                                   dtype=np.uint8)
            elif t in (36, 38, 39):          # generic region
                if len(body) < 18:
                    raise ValueError("jbig2: short generic region")
                w, h, x, y = struct.unpack(">IIII", body[:16])
                if (x + w) * (y + h) > _MAX_PIXELS or w * h == 0:
                    raise ValueError("jbig2: implausible region")
                gflags = body[17]
                mmr = bool(gflags & 1)
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                p = 18
                at = []
                if not mmr:
                    n_at = 4 if template == 0 else 1
                    for _ in range(n_at):
                        ax = struct.unpack("b", body[p:p + 1])[0]
                        ay = struct.unpack("b", body[p + 1:p + 2])[0]
                        at.append((ax, ay))
                        p += 2
                bits = decode_generic_bitmap(
                    body[p:], w, h, template=template, at=at or None,
                    mmr=mmr, tpgdon=tpgdon)
                region = np.array(bits, dtype=np.uint8)
                if page is None:
                    page = np.zeros((y + h, x + w), dtype=np.uint8)
                elif page.shape[0] < y + h or page.shape[1] < x + w:
                    if max(page.shape[0], y + h) \
                            * max(page.shape[1], x + w) > _MAX_PIXELS:
                        raise ValueError(
                            "jbig2: implausible page growth")
                    grown = np.full(
                        (max(page.shape[0], y + h),
                         max(page.shape[1], x + w)),
                        page_default, dtype=np.uint8)
                    grown[:page.shape[0], :page.shape[1]] = page
                    page = grown
                page[y:y + h, x:x + w] |= region
            # 49/50/51 end-of-page/stripe/file, 62 extension: no-op
    if page is None:
        raise ValueError("jbig2: no region decoded")
    return page


# ------------------------------------------------- fixture encoder


def _segment(number: int, seg_type: int, page: int,
             body: bytes) -> bytes:
    head = struct.pack(">I", number) + bytes([seg_type & 0x3F, 0x00,
                                              page & 0xFF])
    return head + struct.pack(">I", len(body)) + body


def _page_and_region_segments(rows: list[list[int]], template: int,
                              mmr: bool, tpgdon: bool):
    h = len(rows)
    w = len(rows[0]) if rows else 0
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    page_seg = _segment(0, 48, 1, page_info)
    gflags = (1 if mmr else 0) | ((template & 3) << 1) \
        | (8 if tpgdon else 0)
    body = struct.pack(">IIII", w, h, 0, 0) + b"\x00" \
        + bytes([gflags])
    if not mmr:
        for ax, ay in NOMINAL_AT[template]:
            body += struct.pack("bb", ax, ay)
    body += encode_generic_bitmap(rows, template=template, mmr=mmr,
                                  tpgdon=tpgdon)
    region_segs = _segment(1, 39, 1, body) + _segment(2, 49, 1, b"")
    return page_seg, region_segs


def build_jbig2_embedded(rows: list[list[int]], template: int = 0,
                         mmr: bool = False,
                         tpgdon: bool = False) -> bytes:
    """Embedded-organization stream: page info + one immediate
    lossless generic region covering the page."""
    page_seg, region_segs = _page_and_region_segments(
        rows, template, mmr, tpgdon)
    return page_seg + region_segs


def build_jbig2_pair(rows: list[list[int]], template: int = 0,
                     mmr: bool = False, tpgdon: bool = False):
    """(globals_bytes, stream_bytes) with the page-information segment
    in the globals — the PDF /JBIG2Globals organization."""
    return _page_and_region_segments(rows, template, mmr, tpgdon)


def build_jbig2_file(rows: list[list[int]], **kw) -> bytes:
    """Standalone file organization (sequential, known page count)."""
    return _FILE_MAGIC + b"\x01" \
        + struct.pack(">I", 1) + build_jbig2_embedded(rows, **kw)
