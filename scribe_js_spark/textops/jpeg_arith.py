"""Arithmetic-coded (QM) JPEG — ITU-T T.81 Annexes D, F and G.

The reference's decodeJPEG.js rejects arithmetic SOF markers
entirely, and so did this repo until now (the honest
``NotImplementedError`` stub at jpeg.py's SOF dispatch). Crawled
corpora do contain these streams at a low rate, so this module
decodes both sequential (SOF9) and progressive (SOF10) arithmetic
scans for real: the published T.81 Table D.3 probability-estimation
state machine (the same table libjpeg ships as ``jaricom.c`` — spec
content, unavoidable for any QM codec, like the T.4 run-length
tables in ``ccitt.py``), byte-stuffed code strings (a data 0xFF is
written FF 00; FF + anything else is a marker, after which the
decoder zero-fills per D.2.7), the Annex F DC/AC statistical models
with DAC conditioning (L/U for DC, Kx for AC), and the Annex G
progressive models (point-transformed DC first, fixed-bin DC
refinement, banded AC first, correction-bit AC refinement).
Lossless and hierarchical modes remain honest
``NotImplementedError`` upstream.

Matching encoders provide fixtures. External arithmetic sample
streams are unavailable in this sandbox, so the oracle is (a) the
encoder/decoder roundtrip across coder-stress inputs and (b) pixel
identity with the Huffman path over identical quantized coefficients
(tests/test_jpeg_arith.py).
"""

from __future__ import annotations

# T.81 Table D.3 — Qe value, next-index-LPS, next-index-MPS, switch.
# Row 113 is the non-adaptive "fixed" bin Annex F uses for AC signs.
_ARITH_TAB = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # fixed (non-adaptive) bin
]
FIXED_BIN = 113

DC_STAT_BINS = 64
AC_STAT_BINS = 256


def new_stats(n):
    """Fresh statistics area: per bin [table-index, MPS sense]."""
    return [[0, 0] for _ in range(n)]


def fixed_stats():
    """A one-bin area pinned to the non-adaptive row (AC signs)."""
    return [[FIXED_BIN, 0]]


class ArithDecoder:
    """QM decoder over a JPEG entropy-coded segment. Consumes bytes
    with FF00 unstuffing; the first FF+marker freezes input and the
    register zero-fills (T.81 D.2.7 — the encoder's CLEARBITS picked
    the in-interval value with maximal trailing zeros, so zero fill
    reconstructs it). ``marker_pos`` reports where the marker began."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = len(data)
        self.marker_pos = None
        # the encoder's first two bytes are bits 15..0 of the
        # initial-scale register (byteout captures C>>19 after the 11
        # spacer shifts), so cx = c >> 16 starts as b0b1 against the
        # initial interval A = 0x10000
        self.a = 0x10000
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.c = (b0 << 24) | (b1 << 16)
        self.ct = 0

    def _next_byte(self) -> int:
        if self.marker_pos is not None:
            return 0
        if self.pos >= self.end:
            self.marker_pos = self.end
            return 0
        b = self.data[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = self.data[self.pos + 1] if self.pos + 1 < self.end else 0xD9
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.marker_pos = self.pos
        return 0

    def decode(self, stats, st: int) -> int:
        s = stats[st]
        qe, nlps, nmps, switch = _ARITH_TAB[s[0]]
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return s[1]
            # renorm needed on the MPS path: conditional exchange
            if self.a < qe:
                d = 1 - s[1]
                if switch:
                    s[1] ^= 1
                s[0] = nlps
            else:
                d = s[1]
                s[0] = nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:
                d = s[1]
                s[0] = nmps
            else:
                d = 1 - s[1]
                if switch:
                    s[1] ^= 1
                s[0] = nlps
            self.a = qe
        while True:  # RENORMD
            if self.ct == 0:
                self.c |= self._next_byte() << 8
                self.ct = 8
            self.a = (self.a << 1) & 0x1FFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class ArithEncoder:
    """QM encoder (T.81 D.1): 32-bit C with 3 spacer bits, bytes leave
    from bit 19, carry resolved over a stacked-FF counter, data FFs
    zero-stuffed. ``flush`` runs CLEARBITS (maximal trailing zeros)
    and emits the final register bytes."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1
        self.sc = 0
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)  # carried-over FFs became 00
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def code(self, stats, st: int, d: int) -> None:
        s = stats[st]
        qe, nlps, nmps, switch = _ARITH_TAB[s[0]]
        self.a -= qe
        if d == s[1]:
            if self.a & 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            s[0] = nmps
        else:
            if self.a < qe:  # exchange: LPS keeps the bottom interval
                pass
            else:
                self.c += self.a
                self.a = qe
            if switch:
                s[1] ^= 1
            s[0] = nlps
        while True:  # RENORME
            self.a = (self.a << 1) & 0x1FFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            for _ in range(self.sc):
                self.out.append(0x00)
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            for _ in range(self.sc):
                self._emit(0xFF)
        self.sc = 0
        self.buffer = -1
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


# ------------------------------------------------- Annex F DC/AC models

def _decode_dc(dec, stats, ctx, last, lo, up):
    """One DC difference (F.1.4.4.1): returns (new_dc, new_context)."""
    st = ctx
    if dec.decode(stats, st) == 0:
        return last, 0
    sign = dec.decode(stats, st + 1)
    st += 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20  # X2 onward (Table F.4)
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg-arith: DC magnitude overflow")
            st += 1
    if m < (1 << lo) >> 1:
        new_ctx = 0
    elif m > (1 << up) >> 1:
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    v = m
    st += 14
    m >>= 1
    while m:
        if dec.decode(stats, st):
            v |= m
        m >>= 1
    v += 1
    if sign:
        v = -v
    return last + v, new_ctx


def _encode_dc(enc, stats, ctx, diff, lo, up):
    """Mirror of :func:`_decode_dc`; returns the next context. The
    decoder's post-category ``m`` (the magnitude-category MSB, 0 when
    |diff| == 1) drives the conditioning classification, so the
    encoder recomputes it the same way."""
    st = ctx
    if diff == 0:
        enc.code(stats, st, 0)
        return 0
    enc.code(stats, st, 1)
    sign = 1 if diff < 0 else 0
    mag = -diff if sign else diff
    enc.code(stats, st + 1, sign)
    st += 2 + sign
    v = mag - 1
    if v:
        enc.code(stats, st, 1)  # X1 at the SP/SN bin
        st = 20
        m = 2
        while v >= m:
            enc.code(stats, st, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg-arith: DC magnitude overflow")
            st += 1
        enc.code(stats, st, 0)
        m_final = m >> 1
    else:
        enc.code(stats, st, 0)
        m_final = 0
    if m_final < (1 << lo) >> 1:
        new_ctx = 0
    elif m_final > (1 << up) >> 1:
        new_ctx = 12 + sign * 4
    else:
        new_ctx = 4 + sign * 4
    st += 14
    bit = m_final >> 1
    while bit:
        enc.code(stats, st, 1 if v & bit else 0)
        bit >>= 1
    return new_ctx


def _decode_ac_block(dec, stats, fixed, zz, kx):
    """Sequential AC coefficients for one block (F.1.4.4.2)."""
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(stats, st):  # EOB
            return
        while dec.decode(stats, st + 1) == 0:
            k += 1
            if k > 63:
                raise ValueError("jpeg-arith: AC index overflow")
            st = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "jpeg-arith: AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if dec.decode(stats, st):
                v |= m
            m >>= 1
        v += 1
        zz[k] = -v if sign else v
        k += 1


def _encode_ac_block(enc, stats, fixed, zz, kx):
    """Mirror of :func:`_decode_ac_block`."""
    ke = 63
    while ke >= 1 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.code(stats, st, 0)  # not EOB
        while zz[k] == 0:
            enc.code(stats, st + 1, 0)
            k += 1
            st = 3 * (k - 1)
        enc.code(stats, st + 1, 1)
        val = int(zz[k])
        sign = 1 if val < 0 else 0
        enc.code(fixed, 0, sign)
        mag = -val if sign else val
        st += 2
        v = mag - 1
        if v == 0:
            enc.code(stats, st, 0)
            m_final = 0
        elif v == 1:
            enc.code(stats, st, 1)
            enc.code(stats, st, 0)
            m_final = 1
        else:
            enc.code(stats, st, 1)
            enc.code(stats, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while (m << 1) <= v:
                enc.code(stats, st, 1)
                m <<= 1
                st += 1
            enc.code(stats, st, 0)
            m_final = m
        st += 14
        bit = m_final >> 1
        while bit:
            enc.code(stats, st, 1 if v & bit else 0)
            bit >>= 1
        k += 1
    if k <= 63:
        enc.code(stats, 3 * (k - 1), 1)  # EOB


def decode_scan_arith(data, pos, scomps, coefs, geom,
                      restart_interval, conditioning,
                      progressive=False, ss=0, se=63, ah=0, al=0):
    """One arithmetic SOS scan into the coefficient arrays; returns
    the stream position of the terminating marker. Statistics, DC
    predictors and the coder reinitialize at every RSTn (T.81
    F.1.4.1); the MCU walk mirrors the Huffman path's. Progressive
    (SOF10) scans route to the G.2 models: DC first = the sequential
    DC model over point-transformed diffs, DC refinement = one
    fixed-bin bit per block, AC first = the sequential AC model over
    the band, AC refinement = the correction-bit model."""
    hmax, vmax, mcux, mcuy = geom
    dc_cond, ac_cond = conditioning
    if not 0 <= ss <= se <= 63:
        raise ValueError(f"jpeg-arith: bad spectral band {ss}..{se}")

    def fresh():
        return ({t: new_stats(DC_STAT_BINS)
                 for t in {c["dc"] for c in scomps}},
                {t: new_stats(AC_STAT_BINS)
                 for t in {c["ac"] for c in scomps}},
                fixed_stats(),
                {c["idx"]: 0 for c in scomps},
                {c["idx"]: 0 for c in scomps})

    dc_stats, ac_stats, fixed, last_dc, dc_ctx = fresh()
    dec = ArithDecoder(data, pos)

    def block(c, zz):
        nonlocal dec
        lo, up = dc_cond.get(c["dc"], (0, 1))
        kx = ac_cond.get(c["ac"], 5)
        if not progressive:
            new_dc, ctx = _decode_dc(
                dec, dc_stats[c["dc"]], dc_ctx[c["idx"]],
                last_dc[c["idx"]], lo, up)
            last_dc[c["idx"]] = new_dc
            dc_ctx[c["idx"]] = ctx
            zz[0] = new_dc
            _decode_ac_block(dec, ac_stats[c["ac"]], fixed, zz, kx)
        elif ss == 0 and ah == 0:  # DC first (point-transformed)
            new_dc, ctx = _decode_dc(
                dec, dc_stats[c["dc"]], dc_ctx[c["idx"]],
                last_dc[c["idx"]], lo, up)
            last_dc[c["idx"]] = new_dc
            dc_ctx[c["idx"]] = ctx
            zz[0] = new_dc << al
        elif ss == 0:  # DC refinement: one fixed-bin bit
            if dec.decode(fixed, 0):
                zz[0] |= 1 << al
        elif ah == 0:
            _decode_ac_first_block(dec, ac_stats[c["ac"]], fixed, zz,
                                   kx, ss, se, al)
        else:
            _decode_ac_refine_block(dec, ac_stats[c["ac"]], fixed, zz,
                                    ss, se, al)

    def restart(count):
        nonlocal dec, dc_stats, ac_stats, fixed, last_dc, dc_ctx
        if restart_interval and count \
                and count % restart_interval == 0:
            # skip to and over the RSTn marker
            p = dec.marker_pos
            if p is None:
                p = dec.pos
                while p + 1 < len(data) and not (
                        data[p] == 0xFF and data[p + 1] != 0x00):
                    p += 1
            if not (p + 1 < len(data)
                    and 0xD0 <= data[p + 1] <= 0xD7):
                raise ValueError("jpeg-arith: expected RSTn")
            dc_stats, ac_stats, fixed, last_dc, dc_ctx = fresh()
            dec = ArithDecoder(data, p + 2)

    if len(scomps) == 1:
        c = scomps[0]
        cz = coefs[c["idx"]]
        for bi in range(c["cbh"] * c["cbw"]):
            restart(bi)
            by, bx = divmod(bi, c["cbw"])
            block(c, cz[by, bx])
    else:
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(n)
                for c in scomps:
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            block(c, coefs[c["idx"]][my * c["vs"] + v,
                                                     mx * c["hs"] + u])
                n += 1
    if dec.marker_pos is not None:
        return dec.marker_pos
    p = dec.pos
    while p + 1 < len(data) and not (data[p] == 0xFF
                                     and data[p + 1] != 0x00):
        p += 1
    return p


def encode_jpeg_arith(y, cb=None, cr=None, sampling=(2, 2),
                      restart_interval=0, qtable=None,
                      dc_cond=(0, 1), ac_kx=5) -> bytes:
    """Gray (or full-resolution Y/Cb/Cr) uint8 planes -> sequential
    arithmetic-coded JPEG (SOF9). Plane preparation and quantization
    reuse the Huffman encoder's helpers, so a test can assert the
    decoded pixels equal the Huffman encoding of the same
    coefficients bit-for-bit. A DAC marker carries the conditioning
    (``dc_cond`` = (L, U), ``ac_kx`` = Kx); ``restart_interval`` > 0
    flushes + emits RSTn and resets statistics every that many MCUs
    (T.81 F.1.4.1)."""
    import struct

    import numpy as np

    from .jpeg import QTABLE_FIXTURE, _pad_to_blocks, _quantized_coefs, _seg

    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    q = (QTABLE_FIXTURE if qtable is None
         else np.asarray(qtable, dtype=np.int32).reshape(64))
    color = cb is not None
    if color:
        hs, vs = sampling
        mcux = (w + 8 * hs - 1) // (8 * hs)
        mcuy = (h + 8 * vs - 1) // (8 * vs)
        ypad = _pad_to_blocks(y, mcuy * vs * 8, mcux * hs * 8)
        planes = [ypad]
        for c in (cb, cr):
            cpad = _pad_to_blocks(np.asarray(c, dtype=np.uint8),
                                  mcuy * vs * 8, mcux * hs * 8)
            planes.append(np.round(cpad.reshape(
                mcuy * 8, vs, mcux * 8, hs).mean(axis=(1, 3))))
        samp = [(hs, vs), (1, 1), (1, 1)]
    else:
        mcux = (w + 7) // 8
        mcuy = (h + 7) // 8
        planes = [_pad_to_blocks(y, mcuy * 8, mcux * 8)]
        samp = [(1, 1)]
    coefs = _quantized_coefs(planes, samp, q)
    ncomp = len(coefs)

    lo, up = dc_cond
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    if color:
        sof_comps = bytes([1, (samp[0][0] << 4) | samp[0][1], 0,
                           2, 0x11, 0, 3, 0x11, 0])
        out += _seg(0xC9, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    else:
        out += _seg(0xC9, struct.pack(">BHHB", 8, h, w, 1)
                    + bytes([1, 0x11, 0]))
    out += _seg(0xCC, bytes([0x00, (up << 4) | lo, 0x10, ac_kx]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if color:
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00,
                                 0, 63, 0]))
    else:
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    def fresh():
        return (ArithEncoder(), new_stats(DC_STAT_BINS),
                new_stats(AC_STAT_BINS), fixed_stats(),
                [0] * ncomp, [0] * ncomp)

    enc, dc_stats, ac_stats, fixed, last_dc, dc_ctx = fresh()
    rst = 0
    n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n \
                    and n % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc, dc_stats, ac_stats, fixed, last_dc, dc_ctx = \
                    fresh()
            for ci in range(ncomp):
                chs, cvs = samp[ci]
                for v in range(cvs):
                    for u in range(chs):
                        zz = coefs[ci][my * cvs + v, mx * chs + u]
                        diff = int(zz[0]) - last_dc[ci]
                        last_dc[ci] = int(zz[0])
                        dc_ctx[ci] = _encode_dc(
                            enc, dc_stats, dc_ctx[ci], diff, lo, up)
                        _encode_ac_block(enc, ac_stats, fixed, zz,
                                         ac_kx)
            n += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------- progressive (SOF10) models

def _decode_dc_first(dec, stats, ctx, last, lo, up, al):
    """Progressive DC first scan: the sequential DC model over the
    point-transformed differences; the decoded value lands at
    ``<< al``."""
    new_last, new_ctx = _decode_dc(dec, stats, ctx, last, lo, up)
    return new_last, new_ctx


def _decode_ac_first_block(dec, stats, fixed, zz, kx, ss, se, al):
    """Progressive AC first scan over [ss, se]: the sequential AC
    model with values shifted into position ``<< al``."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):  # EOB
            return
        while dec.decode(stats, st + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("jpeg-arith: AC band overflow")
            st = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "jpeg-arith: AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if dec.decode(stats, st):
                v |= m
            m >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine_block(dec, stats, fixed, zz, ss, se, al):
    """Progressive AC refinement (T.81 G.2 / the correction-bit
    model): previously-nonzero coefficients take a correction bit at
    st+2; newly-nonzero ones appear via st+1 with a fixed-bin sign;
    the EOB flag only gates positions beyond the previous scan's
    last nonzero."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex >= ss and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(stats, st):
                return
        while True:
            if zz[k]:
                if dec.decode(stats, st + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(stats, st + 1):
                zz[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("jpeg-arith: AC refine overflow")
        k += 1


def _encode_ac_first_block(enc, stats, fixed, zz, kx, ss, se, al):
    """Mirror of :func:`_decode_ac_first_block` over ``zz >> al``."""
    band = {k: int(zz[k]) >> al if zz[k] >= 0
            else -((-int(zz[k])) >> al) for k in range(ss, se + 1)}
    ke = se
    while ke >= ss and band[ke] == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.code(stats, st, 0)
        while band[k] == 0:
            enc.code(stats, st + 1, 0)
            k += 1
            st = 3 * (k - 1)
        enc.code(stats, st + 1, 1)
        val = band[k]
        sign = 1 if val < 0 else 0
        enc.code(fixed, 0, sign)
        mag = -val if sign else val
        st += 2
        v = mag - 1
        if v == 0:
            enc.code(stats, st, 0)
            m_final = 0
        elif v == 1:
            enc.code(stats, st, 1)
            enc.code(stats, st, 0)
            m_final = 1
        else:
            enc.code(stats, st, 1)
            enc.code(stats, st, 1)
            m = 2
            st = 189 if k <= kx else 217
            while (m << 1) <= v:
                enc.code(stats, st, 1)
                m <<= 1
                st += 1
            enc.code(stats, st, 0)
            m_final = m
        st += 14
        bit = m_final >> 1
        while bit:
            enc.code(stats, st, 1 if v & bit else 0)
            bit >>= 1
        k += 1
    if k <= se:
        enc.code(stats, 3 * (k - 1), 1)  # EOB


def _encode_ac_refine_block(enc, stats, fixed, prev, cur, ss, se, al):
    """Mirror of :func:`_decode_ac_refine_block`. ``prev`` holds the
    band as the decoder knows it so far (values at precision al+1);
    ``cur`` the full-precision targets."""
    kex = se
    while kex >= ss and prev[kex] == 0:
        kex -= 1
    ke = se
    while ke >= ss and (cur[ke] >> al if cur[ke] >= 0
                        else -((-cur[ke]) >> al)) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.code(stats, st, 0)  # not EOB yet
        while True:
            tv = cur[k] >> al if cur[k] >= 0 else -((-cur[k]) >> al)
            if prev[k]:
                # correction bit: does the target at this precision
                # (tv, re-scaled) extend the visible magnitude?
                bit = 1 if (tv << al) != prev[k] else 0
                enc.code(stats, st + 2, bit)
                if bit:
                    prev[k] += (-1 << al) if prev[k] < 0 else (1 << al)
                break
            if tv:
                enc.code(stats, st + 1, 1)
                enc.code(fixed, 0, 1 if tv < 0 else 0)
                prev[k] = (-1 << al) if tv < 0 else (1 << al)
                break
            enc.code(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if ke < se and k <= se:
        st = 3 * (k - 1)
        if k > kex:
            enc.code(stats, st, 1)  # EOB


def encode_jpeg_arith_progressive(y, cb=None, cr=None, sampling=(2, 2),
                                  qtable=None, al: int = 1) -> bytes:
    """Progressive arithmetic (SOF10) fixture encoder mirroring
    encode_jpeg_progressive's scan ladder: an interleaved DC-first
    scan at ``Al=al``, per-component AC-first scans over bands 1-5
    and 6-63 at the same precision, then DC and AC refinement passes
    down to full precision. Decoded pixels equal the sequential
    encodings of the same coefficients (tested bit-for-bit)."""
    import struct

    import numpy as np

    from .jpeg import QTABLE_FIXTURE, _pad_to_blocks, _quantized_coefs, _seg

    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    q = (QTABLE_FIXTURE if qtable is None
         else np.asarray(qtable, dtype=np.int32).reshape(64))
    color = cb is not None
    if color:
        hs, vs = sampling
        mcux = (w + 8 * hs - 1) // (8 * hs)
        mcuy = (h + 8 * vs - 1) // (8 * vs)
        ypad = _pad_to_blocks(y, mcuy * vs * 8, mcux * hs * 8)
        planes = [ypad]
        for c in (cb, cr):
            cpad = _pad_to_blocks(np.asarray(c, dtype=np.uint8),
                                  mcuy * vs * 8, mcux * hs * 8)
            planes.append(np.round(cpad.reshape(
                mcuy * 8, vs, mcux * 8, hs).mean(axis=(1, 3))))
        samp = [(hs, vs), (1, 1), (1, 1)]
    else:
        mcux = (w + 7) // 8
        mcuy = (h + 7) // 8
        planes = [_pad_to_blocks(y, mcuy * 8, mcux * 8)]
        samp = [(1, 1)]
    coefs = _quantized_coefs(planes, samp, q)
    ncomp = len(coefs)
    # the decoder-visible band state for refinement scans
    vis = [np.zeros_like(c) for c in coefs]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    if color:
        sof_comps = bytes([1, (samp[0][0] << 4) | samp[0][1], 0,
                           2, 0x11, 0, 3, 0x11, 0])
        out += _seg(0xCA, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    else:
        out += _seg(0xCA, struct.pack(">BHHB", 8, h, w, 1)
                    + bytes([1, 0x11, 0]))
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))  # L=0 U=1 Kx=5

    def sos(comp_ids, ss, se, ah, al_):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al_]))

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    chs, cvs = samp[ci]
                    for v in range(cvs):
                        for u in range(chs):
                            yield ci, my * cvs + v, mx * chs + u

    # ---- DC first scan (interleaved, Al=al)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, al)
    enc = ArithEncoder()
    dc_stats = new_stats(DC_STAT_BINS)
    last_dc = [0] * ncomp
    dc_ctx = [0] * ncomp
    for ci, by, bx in mcu_blocks():
        v = int(coefs[ci][by, bx, 0]) >> al
        dc_ctx[ci] = _encode_dc(enc, dc_stats, dc_ctx[ci],
                                v - last_dc[ci], 0, 1)
        last_dc[ci] = v
        vis[ci][by, bx, 0] = v << al
    out += enc.flush()

    # ---- AC first scans per component, bands 1-5 / 6-63 at Al=al
    for ci in range(ncomp):
        bh, bw = coefs[ci].shape[:2]
        for ss_, se_ in ((1, 5), (6, 63)):
            out += sos([ci + 1], ss_, se_, 0, al)
            enc = ArithEncoder()
            ac_stats = new_stats(AC_STAT_BINS)
            fixed = fixed_stats()
            for bi in range(bh * bw):
                by, bx = divmod(bi, bw)
                zz = coefs[ci][by, bx]
                _encode_ac_first_block(enc, ac_stats, fixed, zz, 5,
                                       ss_, se_, al)
                for k in range(ss_, se_ + 1):
                    t = int(zz[k])
                    vis[ci][by, bx, k] = \
                        (t >> al if t >= 0 else -((-t) >> al)) << al
            out += enc.flush()

    # ---- successive refinements down to full precision
    for lvl in range(al - 1, -1, -1):
        out += sos(list(range(1, ncomp + 1)), 0, 0, lvl + 1, lvl)
        enc = ArithEncoder()
        fixed = fixed_stats()
        for ci, by, bx in mcu_blocks():
            enc.code(fixed, 0, (int(coefs[ci][by, bx, 0]) >> lvl) & 1)
            vis[ci][by, bx, 0] |= ((int(coefs[ci][by, bx, 0]) >> lvl)
                                   & 1) << lvl
        out += enc.flush()
        for ci in range(ncomp):
            bh, bw = coefs[ci].shape[:2]
            for ss_, se_ in ((1, 5), (6, 63)):
                out += sos([ci + 1], ss_, se_, lvl + 1, lvl)
                enc = ArithEncoder()
                ac_stats = new_stats(AC_STAT_BINS)
                fixed = fixed_stats()
                for bi in range(bh * bw):
                    by, bx = divmod(bi, bw)
                    prev = [int(v) for v in vis[ci][by, bx]]
                    cur = [int(v) for v in coefs[ci][by, bx]]
                    _encode_ac_refine_block(enc, ac_stats, fixed,
                                            prev, cur, ss_, se_, lvl)
                    vis[ci][by, bx] = prev
                out += enc.flush()

    out += b"\xff\xd9"
    return bytes(out)
