"""From-scratch baseline JPEG codec (ITU-T T.81 subset).

Decoder: SOI marker walk, DQT (8-bit tables), SOF0 baseline grayscale,
DHT canonical Huffman tables, SOS entropy decode (byte-stuffing-aware
bit reader, DC differential + AC run/length with ZRL and EOB),
dequantize, 2-D IDCT (separable 8x8 DCT-III matrix), level shift +
clamp, MCU edge-padding trim. Progressive (SOF2), arithmetic coding,
and multi-component scans raise NotImplementedError — surfaced as an
error column upstream, never a crash (decode_media contract).

Encoder (fixture side): the exact inverse pipeline with the standard
Annex K luminance Huffman tables. Blockwise-CONSTANT images with a DC
quantization step that divides 8 round-trip losslessly (the only
nonzero coefficient is DC = 8*(v-128), and (v-128)*8/q*q/8 == v-128
when q | 8), which is what makes an exact SQL oracle possible; general
images round-trip within quantization error (exercised in pytest).

All table values below are published in ITU-T T.81 Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag order: index i of the scan -> (row, col) flattened offset.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.3.1 luminance DC: BITS (codes per length 1..16) + HUFFVAL.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.3.2 luminance AC.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Fixture quantization: DC step 8 (divides the 8x block-mean scale ->
# constant blocks are lossless); AC step 16 everywhere.
QTABLE_FIXTURE = np.full(64, 16, dtype=np.int32)
QTABLE_FIXTURE[0] = 8


def _dct_matrix() -> np.ndarray:
    n = 8
    m = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            m[k, i] = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0, :] *= 1.0 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix()          # forward: C @ block @ C.T
_IDCT = _DCT.T                # inverse: C.T @ coef @ C


def _build_decode_table(bits, vals):
    """Canonical Huffman: (code, length) -> value map."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    dec = _build_decode_table(bits, vals)
    return {v: (length, code) for (length, code), v in dec.items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing; 0xFFD9 (EOI) or any other marker ends the stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:  # marker — treated as end of data; pad with 0s
                    self.data = self.data[: self.pos - 1]
                    b = 0
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def read_code(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Baseline grayscale JPEG -> uint8 array (h, w)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    w = h = None
    comp_q = 0
    dc_id = ac_id = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant table")
                qtables[tq] = np.frombuffer(
                    seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                p += 64
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if ncomp != 1:
                raise NotImplementedError("jpeg: only grayscale baseline")
            comp_q = seg[6 + 2]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("jpeg: non-baseline SOF")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != 1:
                raise NotImplementedError("jpeg: multi-component scan")
            dc_id = seg[2] >> 4
            ac_id = seg[2] & 0xF
            pos += seg_len
            break
        pos += seg_len
    if w is None or h is None:
        raise ValueError("jpeg: missing SOF0")
    q = qtables[comp_q]
    dc_tab = htables[(0, dc_id)]
    ac_tab = htables[(1, ac_id)]

    bw = (w + 7) // 8
    bh = (h + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    reader = _BitReader(data, pos)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int32)
            t = reader.read_code(dc_tab)
            diff = _extend(reader.read_bits(t), t)
            pred += diff
            zz[0] = pred
            k = 1
            while k < 64:
                rs = reader.read_code(ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("jpeg: AC index overflow")
                zz[k] = _extend(reader.read_bits(s), s)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = zz * q
            block = _IDCT @ coef.reshape(8, 8) @ _IDCT.T
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    px = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    return px[:h, :w]


# ------------------------------------------------------------- encoder

def _encode_magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, raw bits)."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def encode_jpeg_gray(pixels, qtable=None) -> bytes:
    """uint8 (h, w) -> baseline grayscale JPEG with Annex K Huffman
    tables. Edge-replication padding to 8x8 MCUs."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    q = (QTABLE_FIXTURE if qtable is None
         else np.asarray(qtable, dtype=np.int32).reshape(64))
    bw = (w + 7) // 8
    bh = (h + 7) // 8
    padded = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    if bw * 8 > w:
        padded[:h, w:] = px[:, -1:]
    if bh * 8 > h:
        padded[h:, :] = padded[h - 1 : h, :]

    dc_enc = _build_encode_table(DC_BITS, DC_VALS)
    ac_enc = _build_encode_table(AC_BITS, AC_VALS)
    writer = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _DCT @ block @ _DCT.T
            zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t, bits = _encode_magnitude(diff)
            length, code = dc_enc[t]
            writer.write(length, code)
            if t:
                writer.write(t, bits)
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zz[k] != 0:
                    last_nz = k
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_enc[0xF0]  # ZRL
                    writer.write(length, code)
                    run -= 16
                t, bits = _encode_magnitude(int(zz[k]))
                length, code = ac_enc[(run << 4) | t]
                writer.write(length, code)
                writer.write(t, bits)
                run = 0
            if last_nz < 63:
                length, code = ac_enc[0x00]  # EOB
                writer.write(length, code)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)) \
        + seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos
            + bytes(writer.out) + b"\xff\xd9")
