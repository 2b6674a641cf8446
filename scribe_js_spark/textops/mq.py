"""MQ arithmetic coder (ITU-T T.88 Annex E / ISO 14492, the coder
shared by JBIG2 and JPEG 2000).

Independent implementation from the published spec flowcharts
(INITDEC/DECODE/BYTEIN, INITENC/CODEMPS/CODELPS/BYTEOUT/FLUSH); the
47-row Qe state table is spec content (T.88 Table E.1, cross-checked
against the reference's Table C-2 rendition, decodeMQ.js:9-151 — the
values are identical in any conforming implementation). The encoder
exists for fixture generation; production only decodes.

Context state is a caller-owned list of [index, mps] pairs — JBIG2
keeps one per template context value.
"""

from __future__ import annotations

#: (Qe, NMPS, NLPS, SWITCH) — T.88 Table E.1.
QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


def new_contexts(n: int) -> list[list[int]]:
    """n fresh contexts, each [state index, MPS]."""
    return [[0, 0] for _ in range(n)]


class MQDecoder:
    """T.88 Annex E.3 decoder (software conventions)."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: list[int]) -> int:
        idx, mps = cx
        qe, nmps, nlps, switch = QE[idx]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS path (or conditional exchange)
            if self.a < qe:
                d = mps
                cx[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            else:
                d = mps
                cx[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E.2 encoder — fixture generation only."""

    __slots__ = ("out", "b", "c", "a", "ct", "first")

    def __init__(self):
        self.out = bytearray()
        self.b = -1           # pending byte (-1: none yet)
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.first = True

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self.out.append(self.b)
            self.b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            if self.b >= 0:
                self.out.append(self.b)
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.b += 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                if self.b >= 0:
                    self.out.append(self.b)
                self.b = (self.c >> 20) & 0xFF
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                if self.b >= 0:
                    self.out.append(self.b)
                self.b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, cx: list[int], d: int) -> None:
        idx, mps = cx
        qe, nmps, nlps, switch = QE[idx]
        if d == mps:                       # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
        else:                              # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - mps
            cx[0] = nlps
        while True:                        # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (T.88 E.2.9): choose the in-interval codeword whose
        # trailing bits are all ONES — the decoder synthesizes 1-bits
        # past the end of data, so any dropped tail must read back as
        # ones, not zeros.
        temp = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c > temp:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.b != 0xFF and self.b >= 0:
            self.out.append(self.b)
            self.out.append(0xFF)
        elif self.b == 0xFF:
            self.out.append(self.b)
        self.out.append(0xAC)
        return bytes(self.out)
