"""JBIG2 Huffman-coded path (ITU-T T.88 Annex B + 6.4/6.5).

Companion to :mod:`jbig2` covering the huffman organization
(reference: /root/reference/js/pdf/codecs/decodeJBIG2.js:1449-1560
HuffmanLine/HuffmanTreeNode/HuffmanTable, :1593-1691 the standard
tables B.1-B.15 — spec content identical in any conforming
implementation — :1714-1808 the text-region table set incl. the
runcode-coded symbol-ID table, :1810-1857 the symbol-dictionary table
set, :1563-1590 custom table segments, :1859-1871 uncompressed
collective bitmaps):

- canonical prefix-code assignment from code lengths (B.3 note 1),
  MSB-first bit reader with byte alignment;
- huffman SYMBOL DICTIONARIES: delta-height/width classes, collective
  bitmaps (uncompressed or MMR through the T.6 codec) sliced by the
  recorded widths, export runs via table B.1;
- huffman TEXT REGIONS: FS/DS/DT standard-or-custom table selectors,
  the runcode-decoded symbol-ID table, strip placement through the
  shared core in :mod:`jbig2`;
- custom table segments (type 53);
- matching encoders for fixture generation (equal-length canonical
  symbol-ID codes, uncompressed collective bitmaps).

Huffman + refinement stays unsupported, as in the reference (:1799).
"""

from __future__ import annotations

import struct

#: standard tables B.1-B.15 (T.88 Annex B): rows are
#: (range_low, prefix_len, range_len[, "lower"]) or (prefix_len,) for
#: the OOB line; prefix codes are canonical and re-derived from the
#: lengths, which is how any conforming decoder may store them.
_STD = {
    1: [(0, 1, 4), (16, 2, 8), (272, 3, 16), (65808, 3, 32)],
    2: [(0, 1, 0), (1, 2, 0), (2, 3, 0), (3, 4, 3), (11, 5, 6),
        (75, 6, 32), (6,)],
    3: [(-256, 8, 8), (0, 1, 0), (1, 2, 0), (2, 3, 0), (3, 4, 3),
        (11, 5, 6), (-257, 8, 32, "lower"), (75, 7, 32), (6,)],
    4: [(1, 1, 0), (2, 2, 0), (3, 3, 0), (4, 4, 3), (12, 5, 6),
        (76, 5, 32)],
    5: [(-255, 7, 8), (1, 1, 0), (2, 2, 0), (3, 3, 0), (4, 4, 3),
        (12, 5, 6), (-256, 7, 32, "lower"), (76, 6, 32)],
    6: [(-2048, 5, 10), (-1024, 4, 9), (-512, 4, 8), (-256, 4, 7),
        (-128, 5, 6), (-64, 5, 5), (-32, 4, 5), (0, 2, 7), (128, 3, 7),
        (256, 3, 8), (512, 4, 9), (1024, 4, 10),
        (-2049, 6, 32, "lower"), (2048, 6, 32)],
    7: [(-1024, 4, 9), (-512, 3, 8), (-256, 4, 7), (-128, 5, 6),
        (-64, 5, 5), (-32, 4, 5), (0, 4, 5), (32, 5, 5), (64, 5, 6),
        (128, 4, 7), (256, 3, 8), (512, 3, 9), (1024, 3, 10),
        (-1025, 5, 32, "lower"), (2048, 5, 32)],
    8: [(-15, 8, 3), (-7, 9, 1), (-5, 8, 1), (-3, 9, 0), (-2, 7, 0),
        (-1, 4, 0), (0, 2, 1), (2, 5, 0), (3, 6, 0), (4, 3, 4),
        (20, 6, 1), (22, 4, 4), (38, 4, 5), (70, 5, 6), (134, 5, 7),
        (262, 6, 7), (390, 7, 8), (646, 6, 10),
        (-16, 9, 32, "lower"), (1670, 9, 32), (2,)],
    9: [(-31, 8, 4), (-15, 9, 2), (-11, 8, 2), (-7, 9, 1), (-5, 7, 1),
        (-3, 4, 1), (-1, 3, 1), (1, 3, 1), (3, 5, 1), (5, 6, 1),
        (7, 3, 5), (39, 6, 2), (43, 4, 5), (75, 4, 6), (139, 5, 7),
        (267, 5, 8), (523, 6, 8), (779, 7, 9), (1291, 6, 11),
        (-32, 9, 32, "lower"), (3339, 9, 32), (2,)],
    10: [(-21, 7, 4), (-5, 8, 0), (-4, 7, 0), (-3, 5, 0), (-2, 2, 2),
         (2, 5, 0), (3, 6, 0), (4, 7, 0), (5, 8, 0), (6, 2, 6),
         (70, 5, 5), (102, 6, 5), (134, 6, 6), (198, 6, 7),
         (326, 6, 8), (582, 6, 9), (1094, 6, 10), (2118, 7, 11),
         (-22, 8, 32, "lower"), (4166, 8, 32), (2,)],
    11: [(1, 1, 0), (2, 2, 1), (4, 4, 0), (5, 4, 1), (7, 5, 1),
         (9, 5, 2), (13, 6, 2), (17, 7, 2), (21, 7, 3), (29, 7, 4),
         (45, 7, 5), (77, 7, 6), (141, 7, 32)],
    12: [(1, 1, 0), (2, 2, 0), (3, 3, 1), (5, 5, 0), (6, 5, 1),
         (8, 6, 1), (10, 7, 0), (11, 7, 1), (13, 7, 2), (17, 7, 3),
         (25, 7, 4), (41, 8, 5), (73, 8, 32)],
    13: [(1, 1, 0), (2, 3, 0), (3, 4, 0), (4, 5, 0), (5, 4, 1),
         (7, 3, 3), (15, 6, 1), (17, 6, 2), (21, 6, 3), (29, 6, 4),
         (45, 6, 5), (77, 7, 6), (141, 7, 32)],
    14: [(-2, 3, 0), (-1, 3, 0), (0, 1, 0), (1, 3, 0), (2, 3, 0)],
    15: [(-24, 7, 4), (-8, 6, 2), (-4, 5, 1), (-2, 4, 0), (-1, 3, 0),
         (0, 1, 0), (1, 3, 0), (2, 4, 0), (3, 5, 1), (5, 6, 2),
         (9, 7, 4), (-25, 7, 32, "lower"), (25, 7, 32)],
}


class HLine:
    __slots__ = ("low", "prefix_len", "range_len", "code", "lower",
                 "oob")

    def __init__(self, low, prefix_len, range_len=0, lower=False,
                 oob=False, code=0):
        self.low = low
        self.prefix_len = prefix_len
        self.range_len = range_len
        self.code = code
        self.lower = lower
        self.oob = oob


class BitReader:
    """MSB-first bit reader with byte alignment (reference Reader)."""

    __slots__ = ("data", "pos", "shift", "byte")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.shift = -1
        self.byte = 0

    def read_bit(self) -> int:
        if self.shift < 0:
            if self.pos >= len(self.data):
                raise ValueError("jbig2: end of huffman data")
            self.byte = self.data[self.pos]
            self.pos += 1
            self.shift = 7
        bit = (self.byte >> self.shift) & 1
        self.shift -= 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.shift = -1


class BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def byte_align(self) -> None:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0

    def bytes(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def assign_prefix_codes(lines: list[HLine]) -> None:
    """Canonical codes from prefix lengths (assignPrefixCodes,
    decodeJBIG2.js:1530-1559)."""
    max_len = max((ln.prefix_len for ln in lines), default=0)
    hist = [0] * (max_len + 1)
    for ln in lines:
        hist[ln.prefix_len] += 1
    hist[0] = 0
    first = 0
    for length in range(1, max_len + 1):
        first = (first + hist[length - 1]) << 1
        code = first
        for ln in lines:
            if ln.prefix_len == length:
                ln.code = code
                code += 1


class HTable:
    """Prefix-decode table; lines with length 0 never match."""

    def __init__(self, lines: list[HLine], codes_done: bool = False):
        if not codes_done:
            assign_prefix_codes(lines)
        self.lines = lines
        self.map = {(ln.prefix_len, ln.code): ln
                    for ln in lines if ln.prefix_len > 0}

    def decode(self, r: BitReader):
        code = 0
        for length in range(1, 33):
            code = (code << 1) | r.read_bit()
            ln = self.map.get((length, code))
            if ln is not None:
                if ln.oob:
                    return None
                off = r.read_bits(ln.range_len)
                return ln.low + (-off if ln.lower else off)
        raise ValueError("jbig2: invalid huffman code")

    def encode(self, w: BitWriter, value) -> None:
        """Fixture generation: emit the shortest line covering
        ``value`` (or the OOB line for None)."""
        if value is None:
            for ln in self.lines:
                if ln.oob:
                    w.write_bits(ln.code, ln.prefix_len)
                    return
            raise ValueError("huffman table has no OOB line")
        best = None
        for ln in self.lines:
            if ln.oob or ln.prefix_len == 0:
                continue
            if ln.lower:
                ok = value <= ln.low
                off = ln.low - value
            else:
                ok = ln.low <= value \
                    and (ln.range_len >= 32
                         or value < ln.low + (1 << ln.range_len))
                off = value - ln.low
            if ok and (best is None or ln.range_len < best[0].range_len):
                best = (ln, off)
        if best is None:
            raise ValueError(f"huffman table cannot encode {value}")
        ln, off = best
        w.write_bits(ln.code, ln.prefix_len)
        w.write_bits(off, ln.range_len)


_std_cache: dict[int, HTable] = {}


def std_table(n: int) -> HTable:
    t = _std_cache.get(n)
    if t is None:
        lines = [HLine(*row) if len(row) > 1
                 else HLine(0, row[0], 0, oob=True)
                 for row in _STD[n]]
        t = _std_cache[n] = HTable(lines)
    return t


def decode_tables_segment(body: bytes) -> HTable:
    """Custom table segment (type 53; decodeTablesSegment,
    decodeJBIG2.js:1563-1590)."""
    flags = body[0]
    low = struct.unpack(">i", body[1:5])[0]
    high = struct.unpack(">i", body[5:9])[0]
    r = BitReader(body, 9)
    prefix_bits = ((flags >> 1) & 7) + 1
    range_bits = ((flags >> 4) & 7) + 1
    lines = []
    cur = low
    while cur < high:
        pl = r.read_bits(prefix_bits)
        rl = r.read_bits(range_bits)
        lines.append(HLine(cur, pl, rl))
        cur += 1 << rl
    lines.append(HLine(low - 1, r.read_bits(prefix_bits), 32,
                       lower=True))
    lines.append(HLine(high, r.read_bits(prefix_bits), 32))
    if flags & 1:
        lines.append(HLine(0, r.read_bits(prefix_bits), 0, oob=True))
    return HTable(lines)


def custom_table(index: int, referred, custom_tables) -> HTable:
    """index-th custom table among the referred-to table segments
    (getCustomHuffmanTable, decodeJBIG2.js:1701-1712)."""
    i = 0
    for seg in referred:
        t = custom_tables.get(seg)
        if t is not None:
            if i == index:
                return t
            i += 1
    raise ValueError("jbig2: custom table not found")


def read_uncompressed_bitmap(r: BitReader, width: int,
                             height: int) -> list[list[int]]:
    rows = []
    for _y in range(height):
        rows.append([r.read_bit() for _x in range(width)])
        r.byte_align()
    return rows


def symbol_id_table(r: BitReader, n_symbols: int) -> HTable:
    """Runcode-coded symbol-ID code lengths
    (getTextRegionHuffmanTables, decodeJBIG2.js:1714-1756)."""
    run_lines = [HLine(i, r.read_bits(4)) for i in range(35)]
    run_table = HTable(run_lines)
    codes: list[HLine] = []
    while len(codes) < n_symbols:
        cl = run_table.decode(r)
        if cl is None or cl < 0:
            raise ValueError("jbig2: bad symbol-ID run code")
        if cl < 32:
            codes.append(HLine(len(codes), cl))
        elif cl == 32:
            if not codes:
                raise ValueError("jbig2: repeat without previous")
            n = r.read_bits(2) + 3
            prev = codes[-1].prefix_len
            for _ in range(n):
                codes.append(HLine(len(codes), prev))
        elif cl == 33:
            for _ in range(r.read_bits(3) + 3):
                codes.append(HLine(len(codes), 0))
        elif cl == 34:
            for _ in range(r.read_bits(7) + 11):
                codes.append(HLine(len(codes), 0))
        else:
            raise ValueError("jbig2: invalid symbol-ID code length")
    r.byte_align()
    return HTable(codes[:n_symbols])


def select_table(selector: int, std_base: int, valid: tuple,
                 referred, custom_tables, custom_state) -> HTable:
    if selector in valid:
        return std_table(std_base + selector)
    if selector == 3:
        t = custom_table(custom_state[0], referred, custom_tables)
        custom_state[0] += 1
        return t
    raise ValueError("jbig2: invalid huffman table selector")


def encode_symbol_dictionary_huffman(symbols: list) -> bytes:
    """Huffman symbol-dictionary segment DATA (selectors all standard:
    DH=B.4, DW=B.2, bitmap size=B.1; uncompressed collective
    bitmaps). ``symbols`` must be sorted by (height, width)."""
    w = BitWriter()
    b4, b2, b1 = std_table(4), std_table(2), std_table(1)
    cur_h = 0
    i = 0
    n = len(symbols)
    while i < n:
        h = len(symbols[i])
        b4.encode(w, h - cur_h)
        cur_h = h
        cur_w = 0
        cls = []
        while i < n and len(symbols[i]) == h:
            sw = len(symbols[i][0])
            b2.encode(w, sw - cur_w)
            cur_w = sw
            cls.append(symbols[i])
            i += 1
        b2.encode(w, None)                  # OOB closes the class
        b1.encode(w, 0)                     # uncompressed collective
        w.byte_align()
        total_w = sum(len(s[0]) for s in cls)
        for y in range(h):
            for s in cls:
                for bit in s[y]:
                    w.write_bits(bit, 1)
            # rows of the collective bitmap are byte-aligned
            pad = -total_w % 8
            if pad:
                w.write_bits(0, pad)
    b1.encode(w, 0)                         # zero excluded ...
    b1.encode(w, n)                         # ... then export all
    head = struct.pack(">H", 1)             # huffman, all-std tables
    head += struct.pack(">II", n, n)
    return head + w.bytes()


def encode_text_region_huffman(symbols: list, placements,
                               width: int, height: int) -> bytes:
    """Huffman text-region segment DATA (FS=B.6, DS=B.8, DT=B.11,
    equal-length canonical symbol-ID codes, refCorner TOPLEFT, strip
    size 1)."""
    b6, b8, b11 = std_table(6), std_table(8), std_table(11)
    n = len(symbols)
    code_len = max((n - 1).bit_length(), 1)
    w = BitWriter()
    # runcode table: the single used length gets a 1-bit code
    for i in range(35):
        w.write_bits(1 if i == code_len else 0, 4)
    for _ in range(n):                      # every symbol: that length
        w.write_bits(0, 1)
    w.byte_align()
    placed = sorted(((p[0], p[1], p[2]) for p in placements),
                    key=lambda p: (p[2], p[1]))
    b11.encode(w, 1)                        # initial T -> stripT = -1
    strip_t = -1
    first_s = 0
    j = 0
    while j < len(placed):
        y = placed[j][2]
        b11.encode(w, y - strip_t)
        strip_t = y
        strip = [p for p in placed[j:] if p[2] == y]
        b6.encode(w, strip[0][1] - first_s)
        first_s = strip[0][1]
        cur_s = first_s
        for k, (sym_idx, x, _y) in enumerate(strip):
            if k > 0:
                prev_w = len(symbols[strip[k - 1][0]][0])
                b8.encode(w, x - cur_s - (prev_w - 1))
                cur_s = x
            w.write_bits(sym_idx, code_len)
        b8.encode(w, None)                  # OOB ends the strip
        j += len(strip)
    body = struct.pack(">IIII", width, height, 0, 0) + b"\x00"
    body += struct.pack(">H", 1 | (1 << 4))  # huffman, TOPLEFT
    body += struct.pack(">H", 0)             # FS/DS/DT all standard
    body += struct.pack(">I", len(placed))
    return body + w.bytes()
