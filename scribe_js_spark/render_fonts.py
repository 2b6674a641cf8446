"""Fixture-side font-program builders.

``build_cff_cid`` emits a minimal but structurally real CID-keyed CFF
(header, Name/TopDict/String/GlobalSubr INDEXes, format-0 CID charset,
FDSelect 3, FDArray with a Private DICT). By default glyph outlines
are blank one-byte ``endchar`` charstrings — the text path only reads
the charset — but with ``outlines=True`` every codepoint covered by
the 5x7 segment face below gets a REAL Type2 outline (rectangles per
lit cell, merged per row), so strict renderers draw legible glyphs
instead of blanks (VERDICT r3 #8). Every table a summary-level CFF
reader touches is well-formed, including the ones ours ignores
(FDArray/FDSelect).

``build_truetype_blank`` emits a minimal sfnt with head/maxp/loca/glyf
where a chosen subset of GIDs has zero-length glyf entries (and the
rest a one-contour dummy outline) — the fixture for the
blank-glyph-to-space remap.
"""

from __future__ import annotations

import struct


def _mk_index(objs: list[bytes]) -> bytes:
    if not objs:
        return struct.pack(">H", 0)
    total = sum(len(o) for o in objs) + 1
    off_size = 1 if total <= 0xFF else 2 if total <= 0xFFFF else 4
    out = struct.pack(">H", len(objs)) + bytes([off_size])
    pos = 1
    offs = [pos]
    for o in objs:
        pos += len(o)
        offs.append(pos)
    for v in offs:
        out += v.to_bytes(off_size, "big")
    return out + b"".join(objs)


def _int5(v: int) -> bytes:
    """Fixed-width DICT integer (op 29 + int32) so dict sizes don't
    depend on operand values."""
    return b"\x1d" + struct.pack(">i", v)


# --------------------------------------------- 5x7 segment outlines
#
# Classic HD44780-style 5x7 dot patterns (public-domain shapes), one
# 5-bit row value per row, top to bottom, bit 4 = leftmost column.
# Rendered as Type2 rectangles: cell 80x100 em-units, left bearing 50,
# cap height 700 — legible blocky glyphs in any strict renderer.

_F = {
    " ": [0, 0, 0, 0, 0, 0, 0],
    "A": [0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001],
    "B": [0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110],
    "C": [0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110],
    "D": [0b11100, 0b10010, 0b10001, 0b10001, 0b10001, 0b10010, 0b11100],
    "E": [0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111],
    "F": [0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000],
    "G": [0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111],
    "H": [0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001],
    "I": [0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110],
    "J": [0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100],
    "K": [0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001],
    "L": [0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111],
    "M": [0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001],
    "N": [0b10001, 0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001],
    "O": [0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110],
    "P": [0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000],
    "Q": [0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101],
    "R": [0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001],
    "S": [0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110],
    "T": [0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100],
    "U": [0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110],
    "V": [0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100],
    "W": [0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010],
    "X": [0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001],
    "Y": [0b10001, 0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100],
    "Z": [0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111],
    "a": [0, 0, 0b01110, 0b00001, 0b01111, 0b10001, 0b01111],
    "b": [0b10000, 0b10000, 0b11110, 0b10001, 0b10001, 0b10001, 0b11110],
    "c": [0, 0, 0b01110, 0b10000, 0b10000, 0b10001, 0b01110],
    "d": [0b00001, 0b00001, 0b01111, 0b10001, 0b10001, 0b10001, 0b01111],
    "e": [0, 0, 0b01110, 0b10001, 0b11111, 0b10000, 0b01110],
    "f": [0b00110, 0b01001, 0b01000, 0b11100, 0b01000, 0b01000, 0b01000],
    "g": [0, 0b01111, 0b10001, 0b10001, 0b01111, 0b00001, 0b01110],
    "h": [0b10000, 0b10000, 0b10110, 0b11001, 0b10001, 0b10001, 0b10001],
    "i": [0b00100, 0, 0b01100, 0b00100, 0b00100, 0b00100, 0b01110],
    "j": [0b00010, 0, 0b00110, 0b00010, 0b00010, 0b10010, 0b01100],
    "k": [0b10000, 0b10000, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010],
    "l": [0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110],
    "m": [0, 0, 0b11010, 0b10101, 0b10101, 0b10101, 0b10101],
    "n": [0, 0, 0b10110, 0b11001, 0b10001, 0b10001, 0b10001],
    "o": [0, 0, 0b01110, 0b10001, 0b10001, 0b10001, 0b01110],
    "p": [0, 0, 0b11110, 0b10001, 0b11110, 0b10000, 0b10000],
    "q": [0, 0, 0b01111, 0b10001, 0b01111, 0b00001, 0b00001],
    "r": [0, 0, 0b10110, 0b11001, 0b10000, 0b10000, 0b10000],
    "s": [0, 0, 0b01111, 0b10000, 0b01110, 0b00001, 0b11110],
    "t": [0b01000, 0b01000, 0b11100, 0b01000, 0b01000, 0b01001, 0b00110],
    "u": [0, 0, 0b10001, 0b10001, 0b10001, 0b10011, 0b01101],
    "v": [0, 0, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100],
    "w": [0, 0, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010],
    "x": [0, 0, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001],
    "y": [0, 0b10001, 0b10001, 0b01111, 0b00001, 0b10001, 0b01110],
    "z": [0, 0, 0b11111, 0b00010, 0b00100, 0b01000, 0b11111],
    "0": [0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110],
    "1": [0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110],
    "2": [0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111],
    "3": [0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110],
    "4": [0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010],
    "5": [0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110],
    "6": [0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110],
    "7": [0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000],
    "8": [0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110],
    "9": [0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100],
    ".": [0, 0, 0, 0, 0, 0b01100, 0b01100],
    ",": [0, 0, 0, 0, 0, 0b01100, 0b00100],
    ":": [0, 0b01100, 0b01100, 0, 0b01100, 0b01100, 0],
    ";": [0, 0b01100, 0b01100, 0, 0b01100, 0b00100, 0b01000],
    "!": [0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0, 0b00100],
    "?": [0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0, 0b00100],
    "'": [0b01100, 0b00100, 0b01000, 0, 0, 0, 0],
    '"': [0b01010, 0b01010, 0b01010, 0, 0, 0, 0],
    "(": [0b00010, 0b00100, 0b01000, 0b01000, 0b01000, 0b00100, 0b00010],
    ")": [0b01000, 0b00100, 0b00010, 0b00010, 0b00010, 0b00100, 0b01000],
    "[": [0b01110, 0b01000, 0b01000, 0b01000, 0b01000, 0b01000, 0b01110],
    "]": [0b01110, 0b00010, 0b00010, 0b00010, 0b00010, 0b00010, 0b01110],
    "-": [0, 0, 0, 0b11111, 0, 0, 0],
    "_": [0, 0, 0, 0, 0, 0, 0b11111],
    "+": [0, 0b00100, 0b00100, 0b11111, 0b00100, 0b00100, 0],
    "=": [0, 0, 0b11111, 0, 0b11111, 0, 0],
    "/": [0, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0],
    "\\": [0, 0b10000, 0b01000, 0b00100, 0b00010, 0b00001, 0],
    "*": [0, 0b00100, 0b10101, 0b01110, 0b10101, 0b00100, 0],
    "%": [0b11000, 0b11001, 0b00010, 0b00100, 0b01000, 0b10011, 0b00011],
    "$": [0b00100, 0b01111, 0b10100, 0b01110, 0b00101, 0b11110, 0b00100],
    "#": [0b01010, 0b01010, 0b11111, 0b01010, 0b11111, 0b01010, 0b01010],
    "&": [0b01100, 0b10010, 0b10100, 0b01000, 0b10101, 0b10010, 0b01101],
    "@": [0b01110, 0b10001, 0b00001, 0b01101, 0b10101, 0b10101, 0b01110],
    "<": [0b00010, 0b00100, 0b01000, 0b10000, 0b01000, 0b00100, 0b00010],
    ">": [0b01000, 0b00100, 0b00010, 0b00001, 0b00010, 0b00100, 0b01000],
    "|": [0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100],
    "^": [0b00100, 0b01010, 0b10001, 0, 0, 0, 0],
    "~": [0, 0, 0b01000, 0b10101, 0b00010, 0, 0],
    "`": [0b01000, 0b00100, 0b00010, 0, 0, 0, 0],
    "{": [0b00110, 0b00100, 0b00100, 0b01000, 0b00100, 0b00100, 0b00110],
    "}": [0b01100, 0b00100, 0b00100, 0b00010, 0b00100, 0b00100, 0b01100],
}


def _rows_for_codepoint(cp: int):
    ch = chr(cp)
    rows = _F.get(ch)
    if rows is None and cp > 127:
        # accented Latin: draw the base letter (diacritic omitted)
        import unicodedata

        base = unicodedata.normalize("NFD", ch)[0]
        rows = _F.get(base)
    return rows


def _t2num(v: int) -> bytes:
    return b"\x1c" + struct.pack(">h", int(v))


def type2_charstring(cp: int) -> bytes:
    """Codepoint -> Type2 charstring: one rectangle per horizontal run
    of lit cells (rmoveto + hlineto/vlineto/hlineto, subpaths
    auto-close), then endchar. Unknown codepoints stay blank."""
    rows = _rows_for_codepoint(cp)
    if not rows:
        return b"\x0e"
    out = bytearray()
    px = py = 0
    for r, bits in enumerate(rows[:7]):
        c = 0
        while c < 5:
            if bits & (1 << (4 - c)):
                c2 = c
                while c2 < 5 and bits & (1 << (4 - c2)):
                    c2 += 1
                x = 50 + c * 80
                y = 700 - (r + 1) * 100
                w = (c2 - c) * 80
                out += _t2num(x - px) + _t2num(y - py) + b"\x15"
                out += _t2num(w) + b"\x06"
                out += _t2num(100) + b"\x07"
                out += _t2num(-w) + b"\x06"
                px, py = x, y + 100
                c = c2
            else:
                c += 1
    out += b"\x0e"
    return bytes(out)


def build_cff_cid(cids: list[int], name: bytes = b"SynthCIDFont",
                  outlines: bool = False) -> bytes:
    """CID-keyed CFF whose charset contains exactly ``cids`` (gid i+1 ->
    cids[i]; gid 0 = .notdef is implicit)."""
    cids = sorted(set(int(c) for c in cids))
    n_glyphs = len(cids) + 1

    header = bytes([1, 0, 4, 2])
    name_idx = _mk_index([name])
    string_idx = _mk_index([b"Adobe", b"Identity"])  # SIDs 391, 392
    gsubr_idx = _mk_index([])

    # Top DICT: ROS, CIDCount, charset, CharStrings, FDArray, FDSelect.
    # All integers are fixed 5-byte encodings, so the dict length is
    # independent of the (not yet known) offsets.
    def top_dict(charset_off, charstrings_off, fdarray_off, fdselect_off):
        return (
            _int5(391) + _int5(392) + _int5(0) + b"\x0c\x1e"   # ROS
            + _int5(max(cids) + 1 if cids else 1) + b"\x0c\x22"  # CIDCount
            + _int5(charset_off) + b"\x0f"                      # charset
            + _int5(charstrings_off) + b"\x11"                  # CharStrings
            + _int5(fdarray_off) + b"\x0c\x24"                  # FDArray
            + _int5(fdselect_off) + b"\x0c\x25")                # FDSelect

    top_len = len(top_dict(0, 0, 0, 0))
    top_idx_len = len(_mk_index([b"\x00" * top_len]))

    fixed = len(header) + len(name_idx) + top_idx_len \
        + len(string_idx) + len(gsubr_idx)

    charset_off = fixed
    charset = b"\x00" + b"".join(struct.pack(">H", c) for c in cids)

    fdselect_off = charset_off + len(charset)
    fdselect = b"\x03" + struct.pack(">H", 1) \
        + struct.pack(">HB", 0, 0) + struct.pack(">H", n_glyphs)

    # Private DICT: defaultWidthX 0 (a real entry, keeps it non-empty).
    private = _int5(0) + b"\x14"
    fdarray_off = fdselect_off + len(fdselect)
    font_dict = _int5(len(private)) + _int5(0) + b"\x12"  # patched below
    fdarray_stub = _mk_index([font_dict])
    private_off = fdarray_off + len(fdarray_stub)
    font_dict = _int5(len(private)) + _int5(private_off) + b"\x12"
    fdarray = _mk_index([font_dict])

    charstrings_off = private_off + len(private)
    if outlines:
        charstrings = _mk_index(
            [b"\x0e"] + [type2_charstring(c) for c in cids])
    else:
        charstrings = _mk_index([b"\x0e"] * n_glyphs)  # endchar

    top = top_dict(charset_off, charstrings_off, fdarray_off, fdselect_off)
    assert len(top) == top_len
    return (header + name_idx + _mk_index([top]) + string_idx + gsubr_idx
            + charset + fdselect + fdarray + private + charstrings)


def _cmap_format4_subtable(code_to_gid: dict[int, int]) -> bytes:
    """TrueType cmap format-4 subtable bytes for an arbitrary
    code->gid map (glyphIdArray-backed segments, final 0xFFFF
    sentinel)."""
    codes = sorted(code_to_gid)
    segs: list[tuple[int, int]] = []
    for c in codes:
        if segs and c == segs[-1][1] + 1:
            segs[-1] = (segs[-1][0], c)
        else:
            segs.append((c, c))
    segs.append((0xFFFF, 0xFFFF))
    n_seg = len(segs)
    seg_x2 = n_seg * 2
    search_range = 2
    entry_sel = 0
    while search_range * 2 <= seg_x2:
        search_range *= 2
        entry_sel += 1
    ends = b"".join(struct.pack(">H", e) for _, e in segs)
    starts = b"".join(struct.pack(">H", s) for s, _ in segs)
    deltas = b"".join(struct.pack(">h", 1 if s == 0xFFFF else 0)
                      for s, _ in segs)
    # Every real segment indexes into glyphIdArray via idRangeOffset.
    glyph_ids: list[int] = []
    offsets = []
    for i, (s, e) in enumerate(segs):
        if s == 0xFFFF:
            offsets.append(0)
            continue
        # Offset from THIS idRangeOffset slot to the segment's first
        # glyphIdArray entry: remaining slots + accumulated ids.
        off_words = (n_seg - i) + len(glyph_ids)
        offsets.append(off_words * 2)
        for c in range(s, e + 1):
            glyph_ids.append(code_to_gid[c])
    offsets_b = b"".join(struct.pack(">H", o) for o in offsets)
    gids_b = b"".join(struct.pack(">H", g) for g in glyph_ids)
    body = (struct.pack(">HHHH", seg_x2, search_range, entry_sel,
                        seg_x2 - search_range)
            + ends + b"\x00\x00" + starts + deltas + offsets_b + gids_b)
    length = 14 + len(body)
    return struct.pack(">HHH", 4, length, 0) + body


def build_cmap_table(code_to_gid: dict[int, int],
                     platform: tuple[int, int] = (3, 1)) -> bytes:
    """A cmap table with one format-4 subtable under ``platform``."""
    sub = _cmap_format4_subtable(code_to_gid)
    return (struct.pack(">HH", 0, 1)
            + struct.pack(">HHI", platform[0], platform[1], 12)
            + sub)


def build_truetype_blank(n_glyphs: int, empty_gids: set[int],
                         cmap: dict[int, int] | None = None) -> bytes:
    """Minimal sfnt (head/maxp/loca/glyf) where ``empty_gids`` have
    zero-length glyf entries and every other gid a one-contour square.
    ``cmap`` adds a (3,1) format-4 Unicode subtable (code -> gid) for
    the Identity-H GID->Unicode recovery path. Not a renderable font —
    just the tables the parsers read."""
    # One-contour 2-point "outline": enough bytes to be non-empty.
    outline = struct.pack(">hhhhh", 1, 0, 0, 100, 100)  # header
    outline += struct.pack(">H", 1)        # endPtsOfContours[0] = 1
    outline += struct.pack(">H", 0)        # instructionLength
    outline += bytes([0x01, 0x01])         # flags: 2 on-curve points
    outline += struct.pack(">hh", 0, 100)  # x deltas
    outline += struct.pack(">hh", 0, 100)  # y deltas

    glyf = b""
    loca = [0]
    for gid in range(n_glyphs):
        if gid not in empty_gids:
            glyf += outline
        loca.append(len(glyf))

    head = bytearray(54)
    struct.pack_into(">I", head, 0, 0x00010000)   # version
    struct.pack_into(">I", head, 12, 0x5F0F3CF5)  # magic
    struct.pack_into(">H", head, 18, 1000)        # unitsPerEm
    struct.pack_into(">h", head, 50, 1)           # indexToLocFormat: long
    maxp = struct.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26
    loca_tbl = b"".join(struct.pack(">I", v) for v in loca)

    tables = [(b"glyf", glyf), (b"head", bytes(head)),
              (b"loca", loca_tbl), (b"maxp", maxp)]
    if cmap is not None:
        tables.insert(0, (b"cmap", build_cmap_table(cmap)))
    num = len(tables)
    out = struct.pack(">IHHHH", 0x00010000, num, 64, 2, num * 16 - 64)
    off = 12 + 16 * num
    body = b""
    for tag, data in tables:
        out += struct.pack(">4sIII", tag, 0, off, len(data))
        pad = (-len(data)) % 4
        body += data + b"\x00" * pad
        off += len(data) + pad
    return out + body


def build_cff_simple(sids: list[int],
                     custom_strings: list[bytes] = (),
                     name: bytes = b"SynthCFFSimple",
                     encoding: dict[int, int] | None = None) -> bytes:
    """Non-CID CFF with an explicit format-0 charset listing ``sids``
    (gid i+1 -> sids[i]; gid 0 = .notdef implicit). SIDs >= 391 index
    ``custom_strings``. ``encoding`` adds a custom format-0 Encoding
    table (charCode for gid 1, 2, ... in order). Exercises the
    charset-names -> AGL ToUnicode enrichment and the custom-Encoding
    fill (parsePdfFonts.js:1747-1760, 2133-2177)."""
    sids = [int(s) for s in sids]
    n_glyphs = len(sids) + 1

    header = bytes([1, 0, 4, 2])
    name_idx = _mk_index([name])
    string_idx = _mk_index(list(custom_strings))
    gsubr_idx = _mk_index([])
    has_enc = encoding is not None

    def top_dict(charset_off, charstrings_off, encoding_off):
        out = (_int5(charset_off) + b"\x0f"
               + _int5(charstrings_off) + b"\x11")
        if has_enc:
            out += _int5(encoding_off) + b"\x10"
        return out

    top_len = len(top_dict(0, 0, 0))
    top_idx_len = len(_mk_index([b"\x00" * top_len]))
    fixed = len(header) + len(name_idx) + top_idx_len \
        + len(string_idx) + len(gsubr_idx)

    charset_off = fixed
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    encoding_off = charset_off + len(charset)
    enc_tbl = b""
    if has_enc:
        # format 0: codes listed in gid order (gid 1..n)
        codes = [encoding[g] for g in sorted(encoding)]
        enc_tbl = bytes([0, len(codes)]) + bytes(codes)
    charstrings_off = encoding_off + len(enc_tbl)
    charstrings = _mk_index([b"\x0e"] * n_glyphs)

    top = top_dict(charset_off, charstrings_off, encoding_off)
    assert len(top) == top_len
    return (header + name_idx + _mk_index([top]) + string_idx
            + gsubr_idx + charset + enc_tbl + charstrings)
