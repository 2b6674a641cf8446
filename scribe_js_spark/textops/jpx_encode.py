"""JPEG 2000 encoder — fixture generation only.

A from-scratch T.800 encoder whose only job is to produce
deterministic codestreams that exercise every feature of the
[`textops.jpx`] decoder (which mirrors the reference's
``js/pdf/codecs/decodeJPX.js``): reversible 5/3 and irreversible 9/7
transforms, RCT/ICT, tiles, all five progression orders, multiple
layers, custom precincts, SOP/EPH, per-pass termination, context
reset, vertically-causal contexts, the segmentation symbol, multiple
tile-parts, sub/above-8-bit precisions, and JP2 wrapping with
palette + component-mapping boxes.

Packet headers are emitted by *simulating the decoder's own*
``InclusionTree``/``TagTree``/``BitModel`` state machines and feeding
them truth-derived bits, so encoder/decoder compatibility is by
construction (the same technique the JBIG2 encoder uses).
"""

from __future__ import annotations

import numpy as np

from .jpx import (
    BitModel,
    InclusionTree,
    SUBBAND_GAIN_LOG2,
    TagTree,
    _calculate_component_dimensions,
    _calculate_tile_grids,
    _ceil_div,
    _extend_sym,
    _floor_log2,
    _progression_iterator,
    _ALPHA,
    _BETA,
    _DELTA,
    _GAMMA,
    _K,
    build_packets,
)
from .mq import MQEncoder


# ---------------------------------------------------------------------------
# Forward DWT (inverse of jpx._filter_rows_53/_filter_rows_97)


def _fwd_rows_53(items: np.ndarray, parity: int) -> np.ndarray:
    h, w = items.shape
    if w == 1:
        return items * 2 if parity else items
    pad = 4
    padded = np.empty((h, w + 2 * pad), dtype=np.int64)
    padded[:, pad:pad + w] = items
    _extend_sym(padded, pad, w)
    n = padded.shape[1]
    o = pad - parity
    odd = np.arange(1, n - 1)
    odd = odd[(odd - o) % 2 == 1]
    even = np.arange(1, n - 1)
    even = even[(even - o) % 2 == 0]
    padded[:, odd] -= (padded[:, odd - 1] + padded[:, odd + 1]) >> 1
    _extend_sym(padded, pad, w)
    padded[:, even] += (padded[:, even - 1] + padded[:, even + 1] + 2) >> 2
    return padded[:, pad:pad + w]


def _fwd_rows_97(items: np.ndarray, parity: int) -> np.ndarray:
    h, w = items.shape
    if w == 1:
        return items * 2.0 if parity else items
    pad = 4
    padded = np.empty((h, w + 2 * pad), dtype=np.float64)
    padded[:, pad:pad + w] = items
    _extend_sym(padded, pad, w)
    n = padded.shape[1]
    o = pad - parity
    odd = np.arange(1, n - 1)
    odd = odd[(odd - o) % 2 == 1]
    even = np.arange(1, n - 1)
    even = even[(even - o) % 2 == 0]
    ev_all = np.arange(n)
    ev_all = ev_all[(ev_all - o) % 2 == 0]
    od_all = np.arange(n)
    od_all = od_all[(od_all - o) % 2 == 1]
    padded[:, odd] += _ALPHA * (padded[:, odd - 1] + padded[:, odd + 1])
    _extend_sym(padded, pad, w)
    padded[:, even] += _BETA * (padded[:, even - 1] + padded[:, even + 1])
    _extend_sym(padded, pad, w)
    padded[:, odd] += _GAMMA * (padded[:, odd - 1] + padded[:, odd + 1])
    _extend_sym(padded, pad, w)
    padded[:, even] += _DELTA * (padded[:, even - 1] + padded[:, even + 1])
    _extend_sym(padded, pad, w)
    padded[:, ev_all] *= 1.0 / _K
    padded[:, od_all] *= _K
    return padded[:, pad:pad + w]


def _forward_dwt(a: np.ndarray, u0: int, v0: int, levels: int,
                 reversible: bool) -> list[dict]:
    """Decompose; returns per-resolution subband dicts, coarsest first.

    Index 0 is the final LL; index r>=1 holds the detail bands of
    resolution level r (HL, LH, HH), matching build_packets ordering.
    """
    fwd = _fwd_rows_53 if reversible else _fwd_rows_97
    details = []
    for _ in range(levels):
        xp, yp = u0 & 1, v0 & 1
        # Analysis is the inverse of synthesis (rows then columns there),
        # so columns first, then rows.
        a = fwd(np.ascontiguousarray(a.T), yp).T
        a = fwd(np.ascontiguousarray(a), xp)
        ll = a[yp::2, xp::2]
        hl = a[yp::2, 1 - xp::2]
        lh = a[1 - yp::2, xp::2]
        hh = a[1 - yp::2, 1 - xp::2]
        details.append({"HL": hl, "LH": lh, "HH": hh})
        a = ll
        u0 = _ceil_div(u0, 2)
        v0 = _ceil_div(v0, 2)
    out = [{"LL": a}]
    out.extend(reversed(details))
    return out


# ---------------------------------------------------------------------------
# Tier-1 encoding: the decoder's BitModel driven by truth bits


class _EncBitModel(BitModel):
    """Runs the decoder's pass logic, emitting the bits it would read."""

    def __init__(self, width: int, height: int, subband: str,
                 true_mag: list[int], true_sign: list[int],
                 vertically_causal: bool):
        super().__init__(width, height, subband, 0, vertically_causal)
        self.true_mag = true_mag
        self.true_sign = true_sign
        self.mq: MQEncoder | None = None
        self.plane = 0

    def _emit(self, label: int, bit: int) -> int:
        self.mq.encode(self.contexts[label], bit)
        return bit

    # Decisions mirror BitModel's readers: a coefficient first becomes
    # significant at the plane holding its magnitude MSB, refinement bits
    # follow the true magnitude, and sign bits use the shared context/flip.
    def _read(self, label: int) -> int:  # only RUNLENGTH/UNIFORM paths land here
        raise AssertionError("encoder must not call _read directly")

    def _sig_decision(self, index: int) -> int:
        return (self.true_mag[index] >> self.plane) & 1

    def encode_sign(self, row: int, column: int, index: int) -> None:
        label, flip = self._sign_context(row, column, index)
        self._emit(label, self.true_sign[index] ^ flip)

    def run_significance_propagation_pass(self) -> None:
        width, height = self.width, self.height
        mag, sgn = self.coef_magnitude, self.coef_sign
        ns, flags = self.neighbors_significance, self.processing_flags
        labels = self.labels
        for i0 in range(0, height, 4):
            for j in range(width):
                index = i0 * width + j
                for i1 in range(4):
                    i = i0 + i1
                    if i >= height:
                        break
                    flags[index] &= ~self.PROCESSED & 0xFF
                    if mag[index] or not ns[index]:
                        index += width
                        continue
                    if self._emit(labels[ns[index]],
                                  self._sig_decision(index)):
                        sgn[index] = self.true_sign[index]
                        self.encode_sign(i, j, index)
                        mag[index] = 1
                        self.set_neighbors_significance(i, j, index)
                        flags[index] |= self.FIRST_MAG_BIT
                    flags[index] |= self.PROCESSED
                    index += width

    def run_magnitude_refinement_pass(self) -> None:
        width = self.width
        mag = self.coef_magnitude
        ns, flags = self.neighbors_significance, self.processing_flags
        length = width * self.height
        width4 = width * 4
        index0 = 0
        while index0 < length:
            index_next = min(length, index0 + width4)
            for j in range(width):
                for index in range(index0 + j, index_next, width):
                    if not mag[index] or (flags[index] & self.PROCESSED):
                        continue
                    label = 16
                    if flags[index] & self.FIRST_MAG_BIT:
                        flags[index] ^= self.FIRST_MAG_BIT
                        label = 15 if (ns[index] & 127) == 0 else 14
                    bit = (self.true_mag[index] >> self.plane) & 1
                    self._emit(label, bit)
                    mag[index] = (mag[index] << 1) | bit
                    flags[index] |= self.PROCESSED
            index0 = index_next

    def run_cleanup_pass(self) -> None:
        from .jpx import RUNLENGTH_CONTEXT, UNIFORM_CONTEXT

        width, height = self.width, self.height
        ns = self.neighbors_significance
        mag, sgn = self.coef_magnitude, self.coef_sign
        flags = self.processing_flags
        labels = self.labels
        one, two, three = width, width * 2, width * 3
        i0 = 0
        while i0 < height:
            i_next = min(i0 + 4, height)
            index_base = i0 * width
            check_all_empty = i0 + 3 < height
            for j in range(width):
                index0 = index_base + j
                all_empty = (
                    check_all_empty
                    and flags[index0] == 0 and flags[index0 + one] == 0
                    and flags[index0 + two] == 0
                    and flags[index0 + three] == 0
                    and ns[index0] == 0 and ns[index0 + one] == 0
                    and ns[index0 + two] == 0 and ns[index0 + three] == 0
                )
                i1 = 0
                if all_empty:
                    strip = [index0 + k * width for k in range(4)]
                    firsts = [k for k, idx in enumerate(strip)
                              if self._sig_decision(idx)]
                    if not firsts:
                        self._emit(RUNLENGTH_CONTEXT, 0)
                        continue
                    self._emit(RUNLENGTH_CONTEXT, 1)
                    i1 = firsts[0]
                    self._emit(UNIFORM_CONTEXT, (i1 >> 1) & 1)
                    self._emit(UNIFORM_CONTEXT, i1 & 1)
                    i = i0 + i1
                    index = index0 + i1 * width
                    sgn[index] = self.true_sign[index]
                    self.encode_sign(i, j, index)
                    mag[index] = 1
                    self.set_neighbors_significance(i, j, index)
                    flags[index] |= self.FIRST_MAG_BIT
                    i1 += 1
                index = index0 + i1 * width
                for i in range(i0 + i1, i_next):
                    if mag[index] or (flags[index] & self.PROCESSED):
                        index += width
                        continue
                    if self._emit(labels[ns[index]],
                                  self._sig_decision(index)):
                        sgn[index] = self.true_sign[index]
                        self.encode_sign(i, j, index)
                        mag[index] = 1
                        self.set_neighbors_significance(i, j, index)
                        flags[index] |= self.FIRST_MAG_BIT
                    index += width
            i0 = i_next

    def encode_segmentation_symbol(self) -> None:
        from .jpx import UNIFORM_CONTEXT

        for bit in (1, 0, 1, 0):  # 0xA
            self._emit(UNIFORM_CONTEXT, bit)


def _encode_codeblock(cb: dict, band: np.ndarray, subband: dict,
                      mb: int, cod: dict) -> None:
    """Tier-1 encode one codeblock; annotates cb with enc_* fields."""
    x0 = subband["tbx0"]
    y0 = subband["tby0"]
    block = band[cb["tby0_"] - y0:cb["tby1_"] - y0,
                 cb["tbx0_"] - x0:cb["tbx1_"] - x0]
    mags = np.abs(block).astype(np.int64).reshape(-1)
    signs = (block < 0).astype(np.uint8).reshape(-1)
    max_mag = int(mags.max()) if mags.size else 0
    if max_mag == 0:
        cb["enc_passes"] = 0
        return
    n_planes = max_mag.bit_length()
    if n_planes > mb:
        raise ValueError(
            f"codeblock magnitude needs {n_planes} planes, mb={mb}")
    cb["enc_zbp"] = mb - n_planes
    model = _EncBitModel(
        cb["tbx1_"] - cb["tbx0_"], cb["tby1_"] - cb["tby0_"],
        cb["subbandType"], mags.tolist(), signs.tolist(),
        cod["verticallyCausalContext"])
    per_pass_term = cod["terminationOnEachCodingPass"]
    reset_probs = cod["resetContextProbabilities"]
    seg_lengths: list[int] = []
    model.mq = MQEncoder()

    def finish_pass() -> None:
        if per_pass_term:
            seg = model.mq.flush()
            seg_lengths.append(len(seg))
            data.append(seg)
            model.mq = MQEncoder()
        if reset_probs:
            model.reset()

    data: list[bytes] = []
    passes = 0
    for p in range(n_planes - 1, -1, -1):
        model.plane = p
        if p != n_planes - 1:
            model.run_significance_propagation_pass()
            passes += 1
            finish_pass()
            model.run_magnitude_refinement_pass()
            passes += 1
            finish_pass()
        model.run_cleanup_pass()
        if cod["segmentationSymbolUsed"]:
            model.encode_segmentation_symbol()
        passes += 1
        finish_pass()
    if not per_pass_term:
        data.append(model.mq.flush())
        seg_lengths = None
    cb["enc_passes"] = passes
    cb["enc_data"] = b"".join(data)
    cb["enc_segments"] = seg_lengths


# ---------------------------------------------------------------------------
# Packet header emission


class _HeaderBitWriter:
    """MSB-first writer with 0xFF bit-stuffing (inverse of the reader)."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0
        self.last_was_ff = False

    def _cap(self) -> int:
        return 7 if self.last_was_ff else 8

    def put_bit(self, bit: int) -> None:
        self.buf = (self.buf << 1) | bit
        self.nbits += 1
        if self.nbits == self._cap():
            self.out.append(self.buf)
            self.last_was_ff = self.buf == 0xFF
            self.buf = 0
            self.nbits = 0

    def put_bits(self, value: int, count: int) -> None:
        for k in range(count - 1, -1, -1):
            self.put_bit((value >> k) & 1)

    def align(self) -> None:
        if self.nbits:
            self.buf <<= self._cap() - self.nbits
            self.out.append(self.buf)
            self.last_was_ff = self.buf == 0xFF
            self.buf = 0
            self.nbits = 0
        if self.last_was_ff:
            # The reader skips one byte when a header ends on a stuffed
            # boundary (align_to_byte with skip_next_bit set).
            self.out.append(0x00)
            self.last_was_ff = False


def _put_coding_passes(w: _HeaderBitWriter, n: int) -> None:
    if n == 1:
        w.put_bit(0)
    elif n == 2:
        w.put_bits(0b10, 2)
    elif n <= 5:
        w.put_bits(0b11, 2)
        w.put_bits(n - 3, 2)
    elif n <= 36:
        w.put_bits(0b1111, 4)
        w.put_bits(n - 6, 5)
    else:
        w.put_bits(0b111111111, 9)
        w.put_bits(n - 37, 7)


def _min_tree(values: np.ndarray, levels: int) -> list[np.ndarray]:
    """Per-level min-trees matching InclusionTree/TagTree level grids."""
    out = [values]
    current = values
    for _ in range(levels - 1):
        h, w = current.shape
        nh, nw = (h + 1) // 2, (w + 1) // 2
        nxt = np.full((nh, nw), np.iinfo(np.int64).max, dtype=np.int64)
        for dy in (0, 1):
            for dx in (0, 1):
                part = current[dy::2, dx::2]
                nxt[:part.shape[0], :part.shape[1]] = np.minimum(
                    nxt[:part.shape[0], :part.shape[1]], part)
        out.append(nxt)
        current = nxt
    return out


def _emit_packet(writer: _HeaderBitWriter, packet: dict, layer: int,
                 cod: dict) -> bytes:
    """Emit one packet's header bits; returns the body bytes."""
    contributing = [
        cb for cb in packet["codeblocks"]
        if cb.get("enc_layers", {}).get(layer) is not None
    ]
    if not any(c["enc_layers"][layer]["passes"] for c in contributing):
        writer.put_bit(0)
        return b""
    writer.put_bit(1)
    body = bytearray()
    for cb in packet["codeblocks"]:
        precinct = cb["precinct"]
        col = cb["cbx"] - precinct["cbxMin"]
        row = cb["cby"] - precinct["cbyMin"]
        contribution = cb.get("enc_layers", {}).get(layer)
        contributes = bool(contribution and contribution["passes"])
        if "included" in cb:
            writer.put_bit(1 if contributes else 0)
            included = contributes
            first_time = False
        else:
            included = first_time = False
            tree = precinct.get("encInclusionTree")
            if tree is None:
                width = precinct["cbxMax"] - precinct["cbxMin"] + 1
                height = precinct["cbyMax"] - precinct["cbyMin"] + 1
                tree = InclusionTree(width, height, layer)
                precinct["encInclusionTree"] = tree
                precinct["encZbpTree"] = TagTree(width, height)
                grid_first = np.full((height, width), 255, dtype=np.int64)
                grid_zbp = np.zeros((height, width), dtype=np.int64)
                for other in _precinct_codeblocks(cb):
                    if other["precinct"] is not precinct:
                        continue
                    grid_first[other["cby"] - precinct["cbyMin"],
                               other["cbx"] - precinct["cbxMin"]] = \
                        other.get("enc_first_layer", 255)
                    grid_zbp[other["cby"] - precinct["cbyMin"],
                             other["cbx"] - precinct["cbxMin"]] = \
                        other.get("enc_zbp", 0)
                precinct["encFirstTree"] = _min_tree(
                    grid_first, len(tree.levels))
                precinct["encZbpTruth"] = _min_tree(
                    grid_zbp, len(tree.levels))
            first_tree = precinct["encFirstTree"]
            if tree.reset(col, row, layer):
                while True:
                    lvl = tree.current_level
                    level = tree.levels[lvl]
                    idx = level["index"]
                    w_lvl = level["width"]
                    truth = first_tree[lvl].reshape(-1)[
                        (idx // w_lvl) * first_tree[lvl].shape[1]
                        + idx % w_lvl] <= layer
                    if truth:
                        writer.put_bit(1)
                        if not tree.next_level():
                            cb["included"] = True
                            included = first_time = True
                            break
                    else:
                        writer.put_bit(0)
                        tree.increment_value(layer)
                        break
        if not included:
            continue
        if first_time:
            zbp_tree = precinct["encZbpTree"]
            zbp_truth = precinct["encZbpTruth"]
            zbp_tree.reset(col, row)
            while True:
                lvl = zbp_tree.current_level
                level = zbp_tree.levels[lvl]
                idx = level["index"]
                w_lvl = level["width"]
                stored = level["items"][idx]
                truth_v = zbp_truth[lvl].reshape(-1)[
                    (idx // w_lvl) * zbp_truth[lvl].shape[1] + idx % w_lvl]
                if stored == truth_v:
                    writer.put_bit(1)
                    if not zbp_tree.next_level():
                        break
                else:
                    writer.put_bit(0)
                    zbp_tree.increment_value()
        passes = contribution["passes"]
        _put_coding_passes(writer, passes)
        chunk = contribution["data"]
        segs = contribution["segments"]
        if segs is not None:
            # Per-pass termination: every segment length is read with
            # Lblock bits; grow Lblock until the longest fits.
            need = max((s.bit_length() for s in segs), default=1)
            add = max(0, need - cb["Lblock"])
            for _ in range(add):
                writer.put_bit(1)
            writer.put_bit(0)
            cb["Lblock"] += add
            for s in segs:
                writer.put_bits(s, cb["Lblock"])
        else:
            bits_avail = cb["Lblock"] + _floor_log2(passes)
            need = max(1, len(chunk).bit_length())
            add = max(0, need - bits_avail)
            for _ in range(add):
                writer.put_bit(1)
            writer.put_bit(0)
            cb["Lblock"] += add
            writer.put_bits(len(chunk), cb["Lblock"] + _floor_log2(passes))
        body.extend(chunk)
    return bytes(body)


def _precinct_codeblocks(sample_cb: dict):
    # All codeblocks sharing the sample's precinct object (same subband).
    return sample_cb["_subband_codeblocks"]


# ---------------------------------------------------------------------------
# Top-level encoder


def encode_jpx(
    pixels: np.ndarray,
    *,
    reversible: bool = True,
    mct: bool | None = None,
    levels: int = 2,
    precision: int = 8,
    codeblock: tuple[int, int] = (4, 4),
    tile_size: tuple[int, int] | None = None,
    progression: int = 0,
    layers: int = 1,
    layer_split: str = "passes",
    precincts: list[tuple[int, int]] | None = None,
    sop: bool = False,
    eph: bool = False,
    segmentation: bool = False,
    vertically_causal: bool = False,
    per_pass_termination: bool = False,
    reset_probabilities: bool = False,
    tile_parts: int = 1,
    guard_bits: int = 2,
) -> bytes:
    """Encode a raw JPEG 2000 codestream.

    ``pixels``: (h, w) or (h, w, c) integer array of unsigned samples in
    ``[0, 2**precision)``.  ``layer_split="passes"`` needs
    ``per_pass_termination`` (layers split mid-codeword otherwise);
    ``layer_split="bands"`` assigns LH/HH codeblocks wholly to layer 1.
    """
    pixels = np.asarray(pixels)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    height, width, ncomp = pixels.shape
    if mct is None:
        mct = False
    if mct and ncomp < 3:
        raise ValueError("MCT needs >= 3 components")
    if layers > 1 and layer_split == "passes" and not per_pass_termination:
        raise ValueError("pass-split layers need per-pass termination")

    siz = {
        "Xsiz": width, "Ysiz": height, "XOsiz": 0, "YOsiz": 0,
        "XTsiz": tile_size[0] if tile_size else width,
        "YTsiz": tile_size[1] if tile_size else height,
        "XTOsiz": 0, "YTOsiz": 0, "Csiz": ncomp,
    }
    components = []
    for _ in range(ncomp):
        component = {"precision": precision, "isSigned": False,
                     "XRsiz": 1, "YRsiz": 1}
        _calculate_component_dimensions(component, siz)
        components.append(component)
    cod = {
        "entropyCoderWithCustomPrecincts": precincts is not None,
        "sopMarkerUsed": sop,
        "ephMarkerUsed": eph,
        "progressionOrder": progression,
        "layersCount": layers,
        "multipleComponentTransform": 1 if mct else 0,
        "decompositionLevelsCount": levels,
        "xcb": codeblock[0],
        "ycb": codeblock[1],
        "selectiveArithmeticCodingBypass": False,
        "resetContextProbabilities": reset_probabilities,
        "terminationOnEachCodingPass": per_pass_termination,
        "verticallyCausalContext": vertically_causal,
        "predictableTermination": False,
        "segmentationSymbolUsed": segmentation,
        "reversibleTransformation": 1 if reversible else 0,
    }
    if precincts is not None:
        cod["precinctsSizes"] = [
            {"PPx": px, "PPy": py} for px, py in precincts]
    context = {"SIZ": siz, "components": components, "QCC": {}, "COC": {}}
    _calculate_tile_grids(context, components)

    half = 1 << (precision - 1)
    n_subbands = 3 * levels + 1
    # One epsilon per subband (SQcd scalar expounded); derived from the
    # gain for 5/3, bumped when a tile's coefficients need more planes.
    epsilons = [0] * n_subbands
    mus = [0] * n_subbands

    def band_order():
        order = [("LL", 0)]
        for r in range(1, levels + 1):
            order.extend((t, r) for t in ("HL", "LH", "HH"))
        return order

    for b, (btype, _r) in enumerate(band_order()):
        epsilons[b] = precision + SUBBAND_GAIN_LOG2[btype]

    # Phase 1: forward DWT + quantization for every tile, tracking the
    # per-subband magnitude maxima so epsilons (hence mb) are global.
    for tile in context["tiles"]:
        tile["codingStyleDefaultParameters"] = cod
        for c in range(ncomp):
            tile["components"][c]["codingStyleParameters"] = cod
        build_packets(context, tile)

        # Component samples for this tile, DC-shifted / MCT'd.
        planes = []
        for c in range(ncomp):
            tc = tile["components"][c]
            region = pixels[tc["tcy0"]:tc["tcy1"],
                            tc["tcx0"]:tc["tcx1"], c].astype(np.float64)
            planes.append(region)
        if mct:
            r, g, bch = planes[0], planes[1], planes[2]
            if reversible:
                ri = r.astype(np.int64)
                gi = g.astype(np.int64)
                bi = bch.astype(np.int64)
                y1 = bi - gi
                y2 = ri - gi
                y0 = gi + ((y1 + y2) >> 2) - half
                planes[0], planes[1], planes[2] = (
                    y0.astype(np.float64), y1.astype(np.float64),
                    y2.astype(np.float64))
            else:
                y = 0.299 * r + 0.587 * g + 0.114 * bch
                cb_ = (bch - y) / 1.772
                cr = (r - y) / 1.402
                planes[0], planes[1], planes[2] = y - half, cb_, cr
            for c in range(3, ncomp):
                planes[c] = planes[c] - half
        else:
            planes = [p - half for p in planes]

        for c in range(ncomp):
            tc = tile["components"][c]
            arr = (planes[c].astype(np.int64) if reversible
                   else planes[c])
            bands = _forward_dwt(arr, tc["tcx0"], tc["tcy0"], levels,
                                 reversible)
            b = 0
            for r in range(levels + 1):
                resolution = tc["resolutions"][r]
                for subband in resolution["subbands"]:
                    btype = subband["type"]
                    band = bands[r][btype]
                    exp_h = subband["tby1"] - subband["tby0"]
                    exp_w = subband["tbx1"] - subband["tbx0"]
                    assert band.shape == (exp_h, exp_w), (
                        band.shape, exp_h, exp_w, btype, r)
                    gain = SUBBAND_GAIN_LOG2[btype]
                    if reversible:
                        q = band.astype(np.int64)
                    else:
                        delta = 2.0 ** (precision + gain - epsilons[b]) * (
                            1 + mus[b] / 2048)
                        q = (np.sign(band)
                             * np.floor(np.abs(band) / delta)).astype(
                                 np.int64)
                    subband["_q"] = q
                    max_mag = int(np.abs(q).max()) if q.size else 0
                    while (max_mag.bit_length()
                           > guard_bits + epsilons[b] - 1):
                        if not reversible:
                            raise ValueError("irreversible overflow")
                        epsilons[b] += 1
                    b += 1

    # Phase 2: Tier-1 encode with the final mb, assign layers, emit
    # packets in progression order.
    tile_streams = []
    for tile in context["tiles"]:
        for c in range(ncomp):
            tc = tile["components"][c]
            b = 0
            for r in range(levels + 1):
                for subband in tc["resolutions"][r]["subbands"]:
                    mb = guard_bits + epsilons[b] - 1
                    for cb in subband["codeblocks"]:
                        cb["_subband_codeblocks"] = subband["codeblocks"]
                        _encode_codeblock(cb, subband["_q"], subband, mb,
                                          cod)
                        _assign_layers(cb, layers, layer_split,
                                       per_pass_termination)
                    b += 1

        packet_chunks: list[bytes] = []
        seq = 0
        for packet in _progression_iterator(context, tile,
                                            cod["progressionOrder"]):
            chunk = bytearray()
            if sop:
                chunk += b"\xff\x91\x00\x04" + seq.to_bytes(2, "big")
                seq = (seq + 1) & 0xFFFF
            writer = _HeaderBitWriter()
            body = _emit_packet(writer, packet, packet["layerNumber"], cod)
            writer.align()
            chunk += writer.out
            if eph:
                chunk += b"\xff\x92"
            chunk += body
            packet_chunks.append(bytes(chunk))
        tile_streams.append(packet_chunks)

    # Quantization marker payload (style 0 for reversible, style 2 not).
    if reversible:
        sqcd = (guard_bits << 5) | 0
        spqcd = bytes(e << 3 for e in epsilons)
    else:
        sqcd = (guard_bits << 5) | 2
        spqcd = b"".join(
            bytes([(e << 3) | (m >> 8), m & 0xFF])
            for e, m in zip(epsilons, mus))

    out = bytearray()
    out += b"\xff\x4f"  # SOC
    body = bytearray()
    body += (38 + 3 * ncomp).to_bytes(2, "big")
    body += (0).to_bytes(2, "big")  # Rsiz
    for v in (siz["Xsiz"], siz["Ysiz"], siz["XOsiz"], siz["YOsiz"],
              siz["XTsiz"], siz["YTsiz"], siz["XTOsiz"], siz["YTOsiz"]):
        body += v.to_bytes(4, "big")
    body += ncomp.to_bytes(2, "big")
    for _ in range(ncomp):
        body += bytes([precision - 1, 1, 1])
    out += b"\xff\x51" + body
    # COD
    scod = (1 if precincts is not None else 0) | (2 if sop else 0) | (
        4 if eph else 0)
    block_style = ((2 if reset_probabilities else 0)
                   | (4 if per_pass_termination else 0)
                   | (8 if vertically_causal else 0)
                   | (32 if segmentation else 0))
    cod_body = bytes([scod, progression]) + layers.to_bytes(2, "big") + bytes([
        1 if mct else 0, levels, codeblock[0] - 2, codeblock[1] - 2,
        block_style, 1 if reversible else 0,
    ])
    if precincts is not None:
        cod_body += bytes((py << 4) | px for px, py in precincts)
    out += b"\xff\x52" + (2 + len(cod_body)).to_bytes(2, "big") + cod_body
    out += b"\xff\x5c" + (3 + len(spqcd)).to_bytes(2, "big") + bytes(
        [sqcd]) + spqcd
    com_payload = b"\x00\x01" + b"scribejs"
    out += b"\xff\x64" + (2 + len(com_payload)).to_bytes(2, "big") + com_payload

    for t, packet_chunks in enumerate(tile_streams):
        parts = max(1, min(tile_parts, len(packet_chunks)))
        bounds = [round(k * len(packet_chunks) / parts)
                  for k in range(parts + 1)]
        for part in range(parts):
            data = b"".join(packet_chunks[bounds[part]:bounds[part + 1]])
            psot = 14 + len(data)
            out += b"\xff\x90" + (10).to_bytes(2, "big")
            out += t.to_bytes(2, "big") + psot.to_bytes(4, "big")
            out += bytes([part, parts])
            out += b"\xff\x93" + data
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def _assign_layers(cb: dict, layers: int, layer_split: str,
                   per_pass_term: bool) -> None:
    """Annotate cb['enc_layers'][layer] = {passes, data, segments}."""
    cb["enc_layers"] = {}
    total = cb.get("enc_passes", 0)
    if total == 0:
        cb["enc_first_layer"] = 255  # never included
        for layer in range(layers):
            cb["enc_layers"][layer] = {"passes": 0, "data": b"",
                                       "segments": None}
        return
    if layers == 1:
        cb["enc_first_layer"] = 0
        cb["enc_layers"][0] = {
            "passes": total, "data": cb["enc_data"],
            "segments": cb["enc_segments"],
        }
        return
    if layer_split == "bands":
        target = 1 if cb["subbandType"] in ("LH", "HH") else 0
        cb["enc_first_layer"] = target
        for layer in range(layers):
            if layer == target:
                cb["enc_layers"][layer] = {
                    "passes": total, "data": cb["enc_data"],
                    "segments": cb["enc_segments"],
                }
            else:
                cb["enc_layers"][layer] = {"passes": 0, "data": b"",
                                           "segments": None}
        return
    # pass-split: first ceil(total/layers) passes in layer 0, etc.
    assert per_pass_term
    segs = cb["enc_segments"]
    per = -(-total // layers)
    offsets = [0]
    for s in segs:
        offsets.append(offsets[-1] + s)
    cb["enc_first_layer"] = 0
    for layer in range(layers):
        lo = min(layer * per, total)
        hi = min(lo + per, total)
        cb["enc_layers"][layer] = {
            "passes": hi - lo,
            "data": cb["enc_data"][offsets[lo]:offsets[hi]],
            "segments": segs[lo:hi],
        }


# ---------------------------------------------------------------------------
# JP2 container


def wrap_jp2(codestream: bytes, *, width: int, height: int,
             ncomp: int, precision: int = 8,
             palette: np.ndarray | None = None,
             component_mapping: list[tuple[int, int, int]] | None = None,
             ) -> bytes:
    """Wrap a codestream in JP2 boxes (I.5), optionally with pclr/cmap."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + tag + payload

    sig = box(b"jP\x20\x20", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + (0).to_bytes(4, "big") + b"jp2 ")
    ihdr = box(b"ihdr", height.to_bytes(4, "big") + width.to_bytes(4, "big")
               + ncomp.to_bytes(2, "big") + bytes([precision - 1, 7, 0, 0]))
    colr = box(b"colr", bytes([1, 0, 0]) + (
        16 if (palette is not None or ncomp >= 3) else 17).to_bytes(4, "big"))
    children = ihdr + colr
    if palette is not None:
        ne, npc = palette.shape
        payload = ne.to_bytes(2, "big") + bytes([npc])
        payload += bytes([7] * npc)  # 8-bit columns
        payload += bytes(int(v) for v in palette.reshape(-1))
        children += box(b"pclr", payload)
        mapping = component_mapping or [(0, 1, c) for c in range(npc)]
        cmap = b"".join(
            cmp.to_bytes(2, "big") + bytes([mtyp, pcol])
            for cmp, mtyp, pcol in mapping)
        children += box(b"cmap", cmap)
    jp2h = box(b"jp2h", children)
    jp2c = box(b"jp2c", codestream)
    return sig + ftyp + jp2h + jp2c
