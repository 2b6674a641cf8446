"""JPEG 2000 (JPX) decoder — from scratch, ITU-T T.800 / ISO 15444-1.

Parity target: the reference's ``js/pdf/codecs/decodeJPX.js`` (2,599
lines).  Feature surface mirrors it exactly:

* JP2 box container (``jp2h``/``colr``/``pclr``/``cmap``/``jp2c``,
  decodeJPX.js:124-241) and bare codestreams;
* codestream markers SIZ/COD/QCD/QCC/SOT/SOD/EOC with TLM/PLM/PLT/COM
  skipped and COC warned-and-skipped (decodeJPX.js:267-530);
* all five progression orders (LRCP/RLCP/RPCL/PCRL/CPRL,
  decodeJPX.js:752-1058), custom precincts, SOP/EPH markers,
  multiple layers and tile-parts;
* EBCOT Tier-1 with the shared MQ coder ([`textops.mq`]), including
  per-pass termination, context reset, vertically-causal contexts and
  the segmentation symbol (decodeJPX.js:1994-2350);
* reversible 5/3 and irreversible 9/7 inverse DWT with whole-sample
  symmetric extension and odd-origin parity handling
  (decodeJPX.js:2352-2598), RCT/ICT multiple-component transforms
  and sub-8/above-8 bit-depth normalisation (decodeJPX.js:1685-1814);
* ``reduce_levels`` partial decode (finest levels are never
  entropy-decoded) and palette/component-mapping application
  (decodeJPX.js:18-86).

Like the reference, the selective arithmetic-coding bypass (COD block
style bit 0) is rejected, and corrupt codestreams recover with a
partial image unless recovery is impossible.

This is an independent implementation from the published spec; the
context-label tables and lifting constants are T.800 normative content
(D.3.1 Tables D.1-D.3, F.4.8.2) that any conforming codec shares.

Throughput: EBCOT Tier-1 is a scalar per-bit loop (like the
reference's), ~100 kpx/s on incompressible data — fine for the
embedded-image inventory sizes this pipeline meets, and parallel
across documents inside mapInPandas partitions with per-document
error isolation; ``reduce_levels`` gives a cheap thumbnail path when
full resolution isn't needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mq import MQDecoder


class JpxError(ValueError):
    pass


def _log2ceil(x: int) -> int:
    if x <= 0:
        return 0
    return (x - 1).bit_length()


def _u16(d: bytes, o: int) -> int:
    return (d[o] << 8) | d[o + 1]


def _u32(d: bytes, o: int) -> int:
    return int.from_bytes(d[o:o + 4], "big")


# T.800 Annex E: log2 subband gains for irreversible step sizes.
SUBBAND_GAIN_LOG2 = {"LL": 0, "LH": 1, "HL": 1, "HH": 2}

UNIFORM_CONTEXT = 17
RUNLENGTH_CONTEXT = 18

# T.800 Tables D.1-D.3: context labels indexed by the packed neighbour
# significance state (H + 4*V + 16*D contributions).
LL_LH_CONTEXT_LABEL = bytes([
    0, 5, 8, 0, 3, 7, 8, 0, 4, 7, 8, 0, 0, 0, 0, 0, 1, 6, 8, 0, 3, 7, 8, 0, 4,
    7, 8, 0, 0, 0, 0, 0, 2, 6, 8, 0, 3, 7, 8, 0, 4, 7, 8, 0, 0, 0, 0, 0, 2, 6,
    8, 0, 3, 7, 8, 0, 4, 7, 8, 0, 0, 0, 0, 0, 2, 6, 8, 0, 3, 7, 8, 0, 4, 7, 8,
])
HL_CONTEXT_LABEL = bytes([
    0, 3, 4, 0, 5, 7, 7, 0, 8, 8, 8, 0, 0, 0, 0, 0, 1, 3, 4, 0, 6, 7, 7, 0, 8,
    8, 8, 0, 0, 0, 0, 0, 2, 3, 4, 0, 6, 7, 7, 0, 8, 8, 8, 0, 0, 0, 0, 0, 2, 3,
    4, 0, 6, 7, 7, 0, 8, 8, 8, 0, 0, 0, 0, 0, 2, 3, 4, 0, 6, 7, 7, 0, 8, 8, 8,
])
HH_CONTEXT_LABEL = bytes([
    0, 1, 2, 0, 1, 2, 2, 0, 2, 2, 2, 0, 0, 0, 0, 0, 3, 4, 5, 0, 4, 5, 5, 0, 5,
    5, 5, 0, 0, 0, 0, 0, 6, 7, 7, 0, 7, 7, 7, 0, 7, 7, 7, 0, 0, 0, 0, 0, 8, 8,
    8, 0, 8, 8, 8, 0, 8, 8, 8, 0, 0, 0, 0, 0, 8, 8, 8, 0, 8, 8, 8, 0, 8, 8, 8,
])


def _fresh_contexts() -> list[list[int]]:
    """Initial Tier-1 context states (T.800 Table D.7)."""
    ctx = [[0, 0] for _ in range(19)]
    ctx[0] = [4, 0]
    ctx[UNIFORM_CONTEXT] = [46, 0]
    ctx[RUNLENGTH_CONTEXT] = [3, 0]
    return ctx


# ---------------------------------------------------------------------------
# Tag trees (T.800 B.10.2)


class TagTree:
    """Tag tree for zero-bit-plane counts; levels[0] is the leaf grid."""

    def __init__(self, width: int, height: int):
        n = _log2ceil(max(width, height)) + 1
        self.levels: list[dict] = []
        for _ in range(n):
            self.levels.append({"width": width, "items": {}})
            width = (width + 1) // 2
            height = (height + 1) // 2
        self.value = None
        self.current_level = 0

    def reset(self, i: int, j: int) -> None:
        level_i = 0
        value = 0
        while level_i < len(self.levels):
            level = self.levels[level_i]
            index = i + j * level["width"]
            if index in level["items"]:
                value = level["items"][index]
                break
            level["index"] = index
            i >>= 1
            j >>= 1
            level_i += 1
        level_i -= 1
        level = self.levels[level_i]
        level["items"][level["index"]] = value
        self.current_level = level_i
        self.value = None

    def increment_value(self) -> None:
        level = self.levels[self.current_level]
        level["items"][level["index"]] += 1

    def next_level(self) -> bool:
        level_i = self.current_level
        level = self.levels[level_i]
        value = level["items"][level["index"]]
        level_i -= 1
        if level_i < 0:
            self.value = value
            return False
        self.current_level = level_i
        level = self.levels[level_i]
        level["items"][level["index"]] = value
        return True


class InclusionTree:
    """First-inclusion-layer tag tree with per-layer thresholds."""

    def __init__(self, width: int, height: int, default_value: int):
        n = _log2ceil(max(width, height)) + 1
        self.levels: list[dict] = []
        for _ in range(n):
            self.levels.append({
                "width": width,
                "items": [default_value] * (width * height),
            })
            width = (width + 1) // 2
            height = (height + 1) // 2
        self.current_level = 0

    def reset(self, i: int, j: int, stop_value: int) -> bool:
        level_i = 0
        while level_i < len(self.levels):
            level = self.levels[level_i]
            index = i + j * level["width"]
            level["index"] = index
            value = level["items"][index]
            if value == 0xFF:
                break
            if value > stop_value:
                self.current_level = level_i
                self._propagate_values()
                return False
            i >>= 1
            j >>= 1
            level_i += 1
        self.current_level = level_i - 1
        return True

    def increment_value(self, stop_value: int) -> None:
        level = self.levels[self.current_level]
        level["items"][level["index"]] = stop_value + 1
        self._propagate_values()

    def _propagate_values(self) -> None:
        level_i = self.current_level
        level = self.levels[level_i]
        current_value = level["items"][level["index"]]
        while level_i > 0:
            level_i -= 1
            level = self.levels[level_i]
            level["items"][level["index"]] = current_value

    def next_level(self) -> bool:
        level_i = self.current_level
        level = self.levels[level_i]
        value = level["items"][level["index"]]
        level["items"][level["index"]] = 0xFF
        level_i -= 1
        if level_i < 0:
            return False
        self.current_level = level_i
        level = self.levels[level_i]
        level["items"][level["index"]] = value
        return True


# ---------------------------------------------------------------------------
# Tier-1 bit modelling (T.800 Annex D / decodeJPX.js BitModel)


class BitModel:
    PROCESSED = 1
    FIRST_MAG_BIT = 2

    def __init__(self, width: int, height: int, subband: str,
                 zero_bit_planes: int, vertically_causal: bool):
        self.width = width
        self.height = height
        self.vertically_causal = vertically_causal
        if subband == "HH":
            self.labels = HH_CONTEXT_LABEL
        elif subband == "HL":
            self.labels = HL_CONTEXT_LABEL
        else:
            self.labels = LL_LH_CONTEXT_LABEL
        n = width * height
        self.neighbors_significance = bytearray(n)
        self.coef_sign = bytearray(n)
        self.coef_magnitude = [0] * n
        self.processing_flags = bytearray(n)
        self.bits_decoded = [zero_bit_planes] * n
        self.decoder: MQDecoder | None = None
        self.reset()

    def set_decoder(self, decoder: MQDecoder) -> None:
        self.decoder = decoder

    def reset(self) -> None:
        self.contexts = _fresh_contexts()

    def _read(self, label: int) -> int:
        return self.decoder.decode(self.contexts[label])

    def set_neighbors_significance(self, row: int, column: int,
                                   index: int) -> None:
        ns = self.neighbors_significance
        width = self.width
        height = self.height
        left = column > 0
        right = column + 1 < width
        # D.7: a stripe-top coefficient in vertically-causal mode does not
        # propagate significance up into the previous stripe.
        if row > 0 and not (self.vertically_causal and (row & 3) == 0):
            i = index - width
            if left:
                ns[i - 1] += 0x10
            if right:
                ns[i + 1] += 0x10
            ns[i] += 0x04
        if row + 1 < height:
            i = index + width
            if left:
                ns[i - 1] += 0x10
            if right:
                ns[i + 1] += 0x10
            ns[i] += 0x04
        if left:
            ns[index - 1] += 0x01
        if right:
            ns[index + 1] += 0x01
        ns[index] |= 0x80

    def _sign_context(self, row: int, column: int, index: int) -> tuple[int, int]:
        """(context label, xor flip) for the sign bit (D.3.2)."""
        width = self.width
        height = self.height
        mag = self.coef_magnitude
        sgn = self.coef_sign
        significance1 = column > 0 and mag[index - 1] != 0
        if column + 1 < width and mag[index + 1] != 0:
            sign1 = sgn[index + 1]
            if significance1:
                sign0 = sgn[index - 1]
                contribution = 1 - sign1 - sign0
            else:
                contribution = 1 - 2 * sign1
        elif significance1:
            sign0 = sgn[index - 1]
            contribution = 1 - 2 * sign0
        else:
            contribution = 0
        horizontal = 3 * contribution

        # D.7: the neighbour below a stripe's bottom row is out of scope in
        # vertically-causal mode.
        below_in_scope = (row + 1 < height
                          and not (self.vertically_causal and (row & 3) == 3))
        significance1 = row > 0 and mag[index - width] != 0
        if below_in_scope and mag[index + width] != 0:
            sign1 = sgn[index + width]
            if significance1:
                sign0 = sgn[index - width]
                contribution = 1 - sign1 - sign0 + horizontal
            else:
                contribution = 1 - 2 * sign1 + horizontal
        elif significance1:
            sign0 = sgn[index - width]
            contribution = 1 - 2 * sign0 + horizontal
        else:
            contribution = horizontal

        if contribution >= 0:
            return 9 + contribution, 0
        return 9 - contribution, 1

    def decode_sign_bit(self, row: int, column: int, index: int) -> int:
        label, flip = self._sign_context(row, column, index)
        return self._read(label) ^ flip

    def run_significance_propagation_pass(self) -> None:
        width = self.width
        height = self.height
        mag = self.coef_magnitude
        sgn = self.coef_sign
        ns = self.neighbors_significance
        flags = self.processing_flags
        labels = self.labels
        bits = self.bits_decoded
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
                    if self._read(labels[ns[index]]):
                        sgn[index] = self.decode_sign_bit(i, j, index)
                        mag[index] = 1
                        self.set_neighbors_significance(i, j, index)
                        flags[index] |= self.FIRST_MAG_BIT
                    bits[index] += 1
                    flags[index] |= self.PROCESSED
                    index += width

    def run_magnitude_refinement_pass(self) -> None:
        width = self.width
        mag = self.coef_magnitude
        ns = self.neighbors_significance
        flags = self.processing_flags
        bits = self.bits_decoded
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
                    bit = self._read(label)
                    mag[index] = (mag[index] << 1) | bit
                    bits[index] += 1
                    flags[index] |= self.PROCESSED
            index0 = index_next

    def run_cleanup_pass(self) -> None:
        width = self.width
        height = self.height
        ns = self.neighbors_significance
        mag = self.coef_magnitude
        sgn = self.coef_sign
        flags = self.processing_flags
        labels = self.labels
        bits = self.bits_decoded
        one_down = width
        two_down = width * 2
        three_down = width * 3
        i0 = 0
        while i0 < height:
            i_next = min(i0 + 4, height)
            index_base = i0 * width
            check_all_empty = i0 + 3 < height
            for j in range(width):
                index0 = index_base + j
                all_empty = (
                    check_all_empty
                    and flags[index0] == 0
                    and flags[index0 + one_down] == 0
                    and flags[index0 + two_down] == 0
                    and flags[index0 + three_down] == 0
                    and ns[index0] == 0
                    and ns[index0 + one_down] == 0
                    and ns[index0 + two_down] == 0
                    and ns[index0 + three_down] == 0
                )
                i1 = 0
                index = index0
                i = i0
                if all_empty:
                    if not self._read(RUNLENGTH_CONTEXT):
                        bits[index0] += 1
                        bits[index0 + one_down] += 1
                        bits[index0 + two_down] += 1
                        bits[index0 + three_down] += 1
                        continue
                    i1 = (self._read(UNIFORM_CONTEXT) << 1) | self._read(
                        UNIFORM_CONTEXT)
                    if i1 != 0:
                        i = i0 + i1
                        index += i1 * width
                    sgn[index] = self.decode_sign_bit(i, j, index)
                    mag[index] = 1
                    self.set_neighbors_significance(i, j, index)
                    flags[index] |= self.FIRST_MAG_BIT
                    index = index0
                    for _ in range(i0, i + 1):
                        bits[index] += 1
                        index += width
                    i1 += 1
                index = index0 + i1 * width
                for i in range(i0 + i1, i_next):
                    if mag[index] or (flags[index] & self.PROCESSED):
                        index += width
                        continue
                    if self._read(labels[ns[index]]) == 1:
                        sgn[index] = self.decode_sign_bit(i, j, index)
                        mag[index] = 1
                        self.set_neighbors_significance(i, j, index)
                        flags[index] |= self.FIRST_MAG_BIT
                    bits[index] += 1
                    index += width
            i0 = i_next

    def check_segmentation_symbol(self) -> None:
        # D.5: cleanup passes end with an 0xA symbol under the uniform
        # context; consumed for alignment, not validated (as the reference).
        for _ in range(4):
            self._read(UNIFORM_CONTEXT)


# ---------------------------------------------------------------------------
# Codestream geometry (T.800 Annex B)


def _calculate_component_dimensions(component: dict, siz: dict) -> None:
    component["x0"] = _ceil_div(siz["XOsiz"], component["XRsiz"])
    component["x1"] = _ceil_div(siz["Xsiz"], component["XRsiz"])
    component["y0"] = _ceil_div(siz["YOsiz"], component["YRsiz"])
    component["y1"] = _ceil_div(siz["Ysiz"], component["YRsiz"])
    component["width"] = component["x1"] - component["x0"]
    component["height"] = component["y1"] - component["y0"]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _calculate_tile_grids(context: dict, components: list[dict]) -> None:
    siz = context["SIZ"]
    tiles = []
    num_x = _ceil_div(siz["Xsiz"] - siz["XTOsiz"], siz["XTsiz"])
    num_y = _ceil_div(siz["Ysiz"] - siz["YTOsiz"], siz["YTsiz"])
    for q in range(num_y):
        for p in range(num_x):
            tile = {
                "tx0": max(siz["XTOsiz"] + p * siz["XTsiz"], siz["XOsiz"]),
                "ty0": max(siz["YTOsiz"] + q * siz["YTsiz"], siz["YOsiz"]),
                "tx1": min(siz["XTOsiz"] + (p + 1) * siz["XTsiz"], siz["Xsiz"]),
                "ty1": min(siz["YTOsiz"] + (q + 1) * siz["YTsiz"], siz["Ysiz"]),
                "components": [None] * siz["Csiz"],
            }
            tile["width"] = tile["tx1"] - tile["tx0"]
            tile["height"] = tile["ty1"] - tile["ty0"]
            tiles.append(tile)
    context["tiles"] = tiles
    for i in range(siz["Csiz"]):
        component = components[i]
        for tile in tiles:
            tc = {
                "tcx0": _ceil_div(tile["tx0"], component["XRsiz"]),
                "tcy0": _ceil_div(tile["ty0"], component["YRsiz"]),
                "tcx1": _ceil_div(tile["tx1"], component["XRsiz"]),
                "tcy1": _ceil_div(tile["ty1"], component["YRsiz"]),
            }
            tc["width"] = tc["tcx1"] - tc["tcx0"]
            tc["height"] = tc["tcy1"] - tc["tcy0"]
            tile["components"][i] = tc


def _get_blocks_dimensions(component: dict, r: int) -> dict:
    cod = component["codingStyleParameters"]
    if not cod["entropyCoderWithCustomPrecincts"]:
        ppx = ppy = 15
    else:
        ppx = cod["precinctsSizes"][r]["PPx"]
        ppy = cod["precinctsSizes"][r]["PPy"]
    return {
        "PPx": ppx,
        "PPy": ppy,
        "xcb_": min(cod["xcb"], ppx - 1 if r > 0 else ppx),
        "ycb_": min(cod["ycb"], ppy - 1 if r > 0 else ppy),
    }


def _build_precincts(resolution: dict, dimensions: dict) -> None:
    precinct_width = 1 << dimensions["PPx"]
    precinct_height = 1 << dimensions["PPy"]
    is_zero_res = resolution["resLevel"] == 0
    shift = 0 if is_zero_res else -1
    numwide = (
        _ceil_div(resolution["trx1"], precinct_width)
        - resolution["trx0"] // precinct_width
    ) if resolution["trx1"] > resolution["trx0"] else 0
    numhigh = (
        _ceil_div(resolution["try1"], precinct_height)
        - resolution["try0"] // precinct_height
    ) if resolution["try1"] > resolution["try0"] else 0
    resolution["precinctParameters"] = {
        "precinctWidth": precinct_width,
        "precinctHeight": precinct_height,
        "numprecinctswide": numwide,
        "numprecinctshigh": numhigh,
        "numprecincts": numwide * numhigh,
        "precinctWidthInSubband": 1 << (dimensions["PPx"] + shift),
        "precinctHeightInSubband": 1 << (dimensions["PPy"] + shift),
    }


def _build_codeblocks(subband: dict, dimensions: dict) -> None:
    xcb_ = dimensions["xcb_"]
    ycb_ = dimensions["ycb_"]
    cb_w = 1 << xcb_
    cb_h = 1 << ycb_
    cbx0 = subband["tbx0"] >> xcb_
    cby0 = subband["tby0"] >> ycb_
    cbx1 = (subband["tbx1"] + cb_w - 1) >> xcb_
    cby1 = (subband["tby1"] + cb_h - 1) >> ycb_
    pp = subband["resolution"]["precinctParameters"]
    codeblocks = []
    precincts: dict[int, dict] = {}
    for j in range(cby0, cby1):
        for i in range(cbx0, cbx1):
            cb = {
                "cbx": i,
                "cby": j,
                "tbx0": cb_w * i,
                "tby0": cb_h * j,
                "tbx1": cb_w * (i + 1),
                "tby1": cb_h * (j + 1),
            }
            cb["tbx0_"] = max(subband["tbx0"], cb["tbx0"])
            cb["tby0_"] = max(subband["tby0"], cb["tby0"])
            cb["tbx1_"] = min(subband["tbx1"], cb["tbx1"])
            cb["tby1_"] = min(subband["tby1"], cb["tby1"])
            pi = (cb["tbx0_"] - subband["tbx0"]) // pp["precinctWidthInSubband"]
            pj = (cb["tby0_"] - subband["tby0"]) // pp["precinctHeightInSubband"]
            cb["precinctNumber"] = pi + pj * pp["numprecinctswide"]
            cb["subbandType"] = subband["type"]
            cb["Lblock"] = 3
            if cb["tbx1_"] <= cb["tbx0_"] or cb["tby1_"] <= cb["tby0_"]:
                continue
            codeblocks.append(cb)
            precinct = precincts.get(cb["precinctNumber"])
            if precinct is None:
                precincts[cb["precinctNumber"]] = precinct = {
                    "cbxMin": i, "cbyMin": j, "cbxMax": i, "cbyMax": j,
                }
            else:
                precinct["cbxMin"] = min(precinct["cbxMin"], i)
                precinct["cbxMax"] = max(precinct["cbxMax"], i)
                precinct["cbyMin"] = min(precinct["cbyMin"], j)
                precinct["cbyMax"] = max(precinct["cbyMax"], j)
            cb["precinct"] = precinct
    subband["codeblocks"] = codeblocks
    subband["precincts"] = precincts


def _create_packet(resolution: dict, precinct_number: int,
                   layer_number: int) -> dict:
    codeblocks = [
        cb
        for sb in resolution["subbands"]
        for cb in sb["codeblocks"]
        if cb["precinctNumber"] == precinct_number
    ]
    return {"layerNumber": layer_number, "codeblocks": codeblocks}


def build_packets(context: dict, tile: dict) -> None:
    """Per-tile resolutions/subbands/precincts/codeblocks + iterator."""
    siz = context["SIZ"]
    for c in range(siz["Csiz"]):
        component = tile["components"][c]
        levels = component["codingStyleParameters"]["decompositionLevelsCount"]
        resolutions = []
        for r in range(levels + 1):
            dims = _get_blocks_dimensions(component, r)
            scale = 1 << (levels - r)
            resolution = {
                "trx0": _ceil_div(component["tcx0"], scale),
                "try0": _ceil_div(component["tcy0"], scale),
                "trx1": _ceil_div(component["tcx1"], scale),
                "try1": _ceil_div(component["tcy1"], scale),
                "resLevel": r,
            }
            _build_precincts(resolution, dims)
            resolutions.append(resolution)
            if r == 0:
                sb = {
                    "type": "LL",
                    "tbx0": resolution["trx0"],
                    "tby0": resolution["try0"],
                    "tbx1": resolution["trx1"],
                    "tby1": resolution["try1"],
                    "resolution": resolution,
                }
                _build_codeblocks(sb, dims)
                resolution["subbands"] = [sb]
            else:
                bscale = 1 << (levels - r + 1)
                subbands = []
                # B-15: detail band coordinates use (x - shift)/bscale with
                # half-sample shifts per band type.
                for btype, xs, ys in (("HL", 1, 0), ("LH", 0, 1),
                                      ("HH", 1, 1)):
                    sb = {
                        "type": btype,
                        "tbx0": _ceil_div(component["tcx0"] - (bscale // 2) * xs,
                                          bscale),
                        "tby0": _ceil_div(component["tcy0"] - (bscale // 2) * ys,
                                          bscale),
                        "tbx1": _ceil_div(component["tcx1"] - (bscale // 2) * xs,
                                          bscale),
                        "tby1": _ceil_div(component["tcy1"] - (bscale // 2) * ys,
                                          bscale),
                        "resolution": resolution,
                    }
                    _build_codeblocks(sb, dims)
                    subbands.append(sb)
                resolution["subbands"] = subbands
        component["resolutions"] = resolutions
    order = tile["codingStyleDefaultParameters"]["progressionOrder"]
    tile["packetsIterator"] = _progression_iterator(context, tile, order)


def _progression_iterator(context: dict, tile: dict, order: int):
    makers = {
        0: _iter_lrcp, 1: _iter_rlcp, 2: _iter_rpcl,
        3: _iter_pcrl, 4: _iter_cprl,
    }
    if order not in makers:
        raise JpxError(f"Unsupported progression order {order}")
    return makers[order](context, tile)


def _max_levels(tile: dict) -> int:
    return max(
        c["codingStyleParameters"]["decompositionLevelsCount"]
        for c in tile["components"]
    )


def _iter_lrcp(context: dict, tile: dict):
    layers = tile["codingStyleDefaultParameters"]["layersCount"]
    ncomp = len(tile["components"])
    for layer in range(layers):
        for r in range(_max_levels(tile) + 1):
            for c in range(ncomp):
                component = tile["components"][c]
                if r > component["codingStyleParameters"][
                        "decompositionLevelsCount"]:
                    continue
                resolution = component["resolutions"][r]
                for k in range(
                        resolution["precinctParameters"]["numprecincts"]):
                    yield _create_packet(resolution, k, layer)


def _iter_rlcp(context: dict, tile: dict):
    layers = tile["codingStyleDefaultParameters"]["layersCount"]
    ncomp = len(tile["components"])
    for r in range(_max_levels(tile) + 1):
        for layer in range(layers):
            for c in range(ncomp):
                component = tile["components"][c]
                if r > component["codingStyleParameters"][
                        "decompositionLevelsCount"]:
                    continue
                resolution = component["resolutions"][r]
                for k in range(
                        resolution["precinctParameters"]["numprecincts"]):
                    yield _create_packet(resolution, k, layer)


def _iter_rpcl(context: dict, tile: dict):
    layers = tile["codingStyleDefaultParameters"]["layersCount"]
    ncomp = len(tile["components"])
    max_levels = _max_levels(tile)
    max_precincts = [0] * (max_levels + 1)
    for r in range(max_levels + 1):
        for c in range(ncomp):
            resolutions = tile["components"][c]["resolutions"]
            if r < len(resolutions):
                max_precincts[r] = max(
                    max_precincts[r],
                    resolutions[r]["precinctParameters"]["numprecincts"])
    for r in range(max_levels + 1):
        for p in range(max_precincts[r]):
            for c in range(ncomp):
                component = tile["components"][c]
                if r > component["codingStyleParameters"][
                        "decompositionLevelsCount"]:
                    continue
                resolution = component["resolutions"][r]
                if p >= resolution["precinctParameters"]["numprecincts"]:
                    continue
                for layer in range(layers):
                    yield _create_packet(resolution, p, layer)


def _precinct_sizes_in_image_scale(tile: dict) -> dict:
    ncomp = len(tile["components"])
    min_w = min_h = float("inf")
    max_wide = max_high = 0
    per_component = []
    for c in range(ncomp):
        component = tile["components"][c]
        levels = component["codingStyleParameters"]["decompositionLevelsCount"]
        per_res = [None] * (levels + 1)
        cmin_w = cmin_h = float("inf")
        cmax_wide = cmax_high = 0
        scale = 1
        for r in range(levels, -1, -1):
            resolution = component["resolutions"][r]
            pp = resolution["precinctParameters"]
            w = scale * pp["precinctWidth"]
            h = scale * pp["precinctHeight"]
            cmin_w = min(cmin_w, w)
            cmin_h = min(cmin_h, h)
            cmax_wide = max(cmax_wide, pp["numprecinctswide"])
            cmax_high = max(cmax_high, pp["numprecinctshigh"])
            per_res[r] = {"width": w, "height": h}
            scale <<= 1
        min_w = min(min_w, cmin_w)
        min_h = min(min_h, cmin_h)
        max_wide = max(max_wide, cmax_wide)
        max_high = max(max_high, cmax_high)
        per_component.append({
            "resolutions": per_res,
            "minWidth": cmin_w, "minHeight": cmin_h,
            "maxNumWide": cmax_wide, "maxNumHigh": cmax_high,
        })
    return {
        "components": per_component,
        "minWidth": min_w, "minHeight": min_h,
        "maxNumWide": max_wide, "maxNumHigh": max_high,
    }


def _precinct_index_if_exists(px: int, py: int, size_in_image_scale: dict,
                              iteration_sizes: dict,
                              resolution: dict) -> int | None:
    # Mirrors the reference's getPrecinctIndexIfExist
    # (decodeJPX.js:1059-1077), including its width/height swap in the
    # position-to-index conversion — harmless for the square precincts
    # all real encoders emit, and parity demands the same arithmetic.
    pos_x = px * iteration_sizes["minWidth"]
    pos_y = py * iteration_sizes["minHeight"]
    if (pos_x % size_in_image_scale["width"] != 0
            or pos_y % size_in_image_scale["height"] != 0):
        return None
    start_row = ((pos_y // size_in_image_scale["width"])
                 * resolution["precinctParameters"]["numprecinctswide"])
    return pos_x // size_in_image_scale["height"] + start_row


def _iter_pcrl(context: dict, tile: dict):
    layers = tile["codingStyleDefaultParameters"]["layersCount"]
    ncomp = len(tile["components"])
    sizes = _precinct_sizes_in_image_scale(tile)
    for py in range(sizes["maxNumHigh"]):
        for px in range(sizes["maxNumWide"]):
            for c in range(ncomp):
                component = tile["components"][c]
                levels = component["codingStyleParameters"][
                    "decompositionLevelsCount"]
                for r in range(levels + 1):
                    resolution = component["resolutions"][r]
                    k = _precinct_index_if_exists(
                        px, py, sizes["components"][c]["resolutions"][r],
                        sizes, resolution)
                    if k is None:
                        continue
                    for layer in range(layers):
                        yield _create_packet(resolution, k, layer)


def _iter_cprl(context: dict, tile: dict):
    layers = tile["codingStyleDefaultParameters"]["layersCount"]
    ncomp = len(tile["components"])
    sizes = _precinct_sizes_in_image_scale(tile)
    for c in range(ncomp):
        component = tile["components"][c]
        comp_sizes = sizes["components"][c]
        levels = component["codingStyleParameters"][
            "decompositionLevelsCount"]
        for py in range(comp_sizes["maxNumHigh"]):
            for px in range(comp_sizes["maxNumWide"]):
                for r in range(levels + 1):
                    resolution = component["resolutions"][r]
                    k = _precinct_index_if_exists(
                        px, py, comp_sizes["resolutions"][r], comp_sizes,
                        resolution)
                    if k is None:
                        continue
                    for layer in range(layers):
                        yield _create_packet(resolution, k, layer)


# ---------------------------------------------------------------------------
# Packet header parsing (T.800 B.10)


class _PacketBitReader:
    """MSB-first reader with the 0xFF bit-stuffing rule (B.10.1)."""

    def __init__(self, data: bytes, offset: int):
        self.data = data
        self.offset = offset
        self.position = 0
        self.buffer = 0
        self.buffer_size = 0
        self.skip_next_bit = False

    def read_bits(self, count: int) -> int:
        while self.buffer_size < count:
            b = self.data[self.offset + self.position]
            self.position += 1
            if self.skip_next_bit:
                self.buffer = (self.buffer << 7) | b
                self.buffer_size += 7
                self.skip_next_bit = False
            else:
                self.buffer = (self.buffer << 8) | b
                self.buffer_size += 8
            if b == 0xFF:
                self.skip_next_bit = True
        self.buffer_size -= count
        return (self.buffer >> self.buffer_size) & ((1 << count) - 1)

    def skip_marker_if_equal(self, value: int) -> bool:
        d = self.data
        o = self.offset + self.position
        if d[o - 1] == 0xFF and d[o] == value:
            self.position += 1
            return True
        if d[o] == 0xFF and d[o + 1] == value:
            self.position += 2
            return True
        return False

    def align_to_byte(self) -> None:
        self.buffer_size = 0
        if self.skip_next_bit:
            self.position += 1
            self.skip_next_bit = False

    def read_coding_passes(self) -> int:
        if self.read_bits(1) == 0:
            return 1
        if self.read_bits(1) == 0:
            return 2
        value = self.read_bits(2)
        if value < 3:
            return value + 3
        value = self.read_bits(5)
        if value < 31:
            return value + 6
        return self.read_bits(7) + 37


def parse_tile_packets(context: dict, data: bytes, offset: int,
                       data_length: int) -> int:
    reader = _PacketBitReader(data, offset)
    tile = context["tiles"][context["currentTile"]["index"]]
    cod = tile["codingStyleDefaultParameters"]
    sop = cod["sopMarkerUsed"]
    eph = cod["ephMarkerUsed"]
    per_pass_term = cod["terminationOnEachCodingPass"]
    iterator = tile["packetsIterator"]
    while reader.position < data_length:
        reader.align_to_byte()
        if sop and reader.skip_marker_if_equal(0x91):
            reader.position += 4  # Lsop + packet sequence id
        packet = next(iterator)
        if not reader.read_bits(1):
            continue
        layer_number = packet["layerNumber"]
        queue = []
        for cb in packet["codeblocks"]:
            precinct = cb["precinct"]
            cb_column = cb["cbx"] - precinct["cbxMin"]
            cb_row = cb["cby"] - precinct["cbyMin"]
            included = False
            first_time = False
            if "included" in cb:
                included = bool(reader.read_bits(1))
            else:
                inclusion_tree = precinct.get("inclusionTree")
                if inclusion_tree is None:
                    width = precinct["cbxMax"] - precinct["cbxMin"] + 1
                    height = precinct["cbyMax"] - precinct["cbyMin"] + 1
                    inclusion_tree = InclusionTree(width, height, layer_number)
                    precinct["inclusionTree"] = inclusion_tree
                    precinct["zeroBitPlanesTree"] = TagTree(width, height)
                if inclusion_tree.reset(cb_column, cb_row, layer_number):
                    while True:
                        if reader.read_bits(1):
                            if not inclusion_tree.next_level():
                                cb["included"] = True
                                included = first_time = True
                                break
                        else:
                            inclusion_tree.increment_value(layer_number)
                            break
            if not included:
                continue
            if first_time:
                zbp_tree = precinct["zeroBitPlanesTree"]
                zbp_tree.reset(cb_column, cb_row)
                while True:
                    if reader.read_bits(1):
                        if not zbp_tree.next_level():
                            break
                    else:
                        zbp_tree.increment_value()
                cb["zeroBitPlanes"] = zbp_tree.value
            coding_passes = reader.read_coding_passes()
            while reader.read_bits(1):
                cb["Lblock"] += 1
            segment_lengths = None
            if per_pass_term:
                # B.10.7.2: per-pass termination makes each pass its own
                # codeword segment with an explicit length.
                segment_lengths = []
                coded_length = 0
                for _ in range(coding_passes):
                    seg = reader.read_bits(cb["Lblock"])
                    segment_lengths.append(seg)
                    coded_length += seg
            else:
                bits = cb["Lblock"] + _floor_log2(coding_passes)
                coded_length = reader.read_bits(bits)
            queue.append((cb, coding_passes, coded_length, segment_lengths))
        reader.align_to_byte()
        if eph:
            reader.skip_marker_if_equal(0x92)
        for cb, coding_passes, coded_length, segment_lengths in queue:
            cb.setdefault("data", []).append({
                "data": data,
                "start": offset + reader.position,
                "end": offset + reader.position + coded_length,
                "codingpasses": coding_passes,
                "segmentLengths": segment_lengths,
            })
            reader.position += coded_length
    return reader.position


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1 if x > 0 else 0


# ---------------------------------------------------------------------------
# Tier-1 decode + dequantization into subband coefficients


def _copy_coefficients(coefficients: np.ndarray, level_width: int,
                       subband: dict, delta: float, mb: int,
                       reversible: bool, options: dict,
                       x_parity: int, y_parity: int) -> None:
    x0 = subband["tbx0"]
    y0 = subband["tby0"]
    width = subband["tbx1"] - subband["tbx0"]
    interleave = subband["type"] != "LL"
    right = (1 - x_parity) if subband["type"][0] == "H" else x_parity
    bottom = ((1 - y_parity) if subband["type"][1] == "H" else y_parity
              ) * level_width

    for cb in subband["codeblocks"]:
        block_width = cb["tbx1_"] - cb["tbx0_"]
        block_height = cb["tby1_"] - cb["tby0_"]
        if block_width == 0 or block_height == 0 or "data" not in cb:
            continue

        model = BitModel(block_width, block_height, cb["subbandType"],
                         cb["zeroBitPlanes"],
                         options["verticallyCausalContext"])
        chunks = cb["data"]
        encoded = b"".join(
            item["data"][item["start"]:item["end"]] for item in chunks)
        total_passes = sum(item["codingpasses"] for item in chunks)

        # One continuous MQ codeword unless per-pass termination split the
        # contribution into per-pass segments (D.4.1).
        segments: list[tuple[int, int] | None] = []
        if options["terminationOnEachCodingPass"]:
            seg_start = 0
            for item in chunks:
                for seg_len in item["segmentLengths"]:
                    segments.append((seg_start, seg_start + seg_len))
                    seg_start += seg_len
        elif total_passes > 0:
            segments.append((0, len(encoded)))
            segments.extend([None] * (total_passes - 1))

        pass_type = 2  # the first coded bit-plane starts with cleanup
        for p, seg in enumerate(segments):
            if seg is not None:
                model.set_decoder(MQDecoder(encoded[seg[0]:seg[1]]))
            if options["resetContextProbabilities"] and p > 0:
                model.reset()
            if pass_type == 0:
                model.run_significance_propagation_pass()
            elif pass_type == 1:
                model.run_magnitude_refinement_pass()
            else:
                model.run_cleanup_pass()
                if options["segmentationSymbolUsed"]:
                    model.check_segmentation_symbol()
            pass_type = (pass_type + 1) % 3

        offset = cb["tbx0_"] - x0 + (cb["tby0_"] - y0) * width
        sign = model.coef_sign
        magnitude = model.coef_magnitude
        bits_decoded = model.bits_decoded
        correction = 0 if reversible else 0.5
        position = 0
        for _j in range(block_height):
            row = offset // width
            level_offset = 2 * row * (level_width - width) + right + bottom
            for _k in range(block_width):
                n = magnitude[position]
                if n != 0:
                    value = (n + correction) * delta
                    if sign[position]:
                        value = -value
                    nb = bits_decoded[position]
                    pos = level_offset + (offset << 1) if interleave else offset
                    if reversible and nb >= mb:
                        coefficients[pos] = value
                    else:
                        coefficients[pos] = value * (1 << (mb - nb))
                offset += 1
                position += 1
            offset += width - block_width


def _transform_tile(context: dict, tile: dict, c: int,
                    reduce_levels: int) -> dict:
    component = tile["components"][c]
    cod = component["codingStyleParameters"]
    qcd = component["quantizationParameters"]
    levels = cod["decompositionLevelsCount"]
    spqcds = qcd["SPqcds"]
    scalar_expounded = qcd["scalarExpounded"]
    guard_bits = qcd["guardBits"]
    precision = context["components"][c]["precision"]
    reversible = cod["reversibleTransformation"]
    options = {
        "segmentationSymbolUsed": cod["segmentationSymbolUsed"],
        "terminationOnEachCodingPass": cod["terminationOnEachCodingPass"],
        "resetContextProbabilities": cod["resetContextProbabilities"],
        "verticallyCausalContext": cod["verticallyCausalContext"],
    }

    subband_coefficients = []
    b = 0
    # Finest levels a reduced decode discards are never entropy-decoded.
    kept_levels = levels - min(reduce_levels, levels)
    for i in range(kept_levels + 1):
        resolution = component["resolutions"][i]
        width = resolution["trx1"] - resolution["trx0"]
        height = resolution["try1"] - resolution["try0"]
        coefficients = np.zeros(width * height, dtype=np.float64)
        x_parity = resolution["trx0"] & 1
        y_parity = resolution["try0"] & 1
        for subband in resolution["subbands"]:
            if not scalar_expounded:
                # formula E-5
                mu = spqcds[0]["mu"]
                epsilon = spqcds[0]["epsilon"] + (1 - i if i > 0 else 0)
            else:
                mu = spqcds[b]["mu"]
                epsilon = spqcds[b]["epsilon"]
                b += 1
            gain_log2 = SUBBAND_GAIN_LOG2[subband["type"]]
            delta = 1 if reversible else (
                2.0 ** (precision + gain_log2 - epsilon) * (1 + mu / 2048))
            mb = guard_bits + epsilon - 1
            _copy_coefficients(coefficients, width, subband, delta, mb,
                               reversible, options, x_parity, y_parity)
        subband_coefficients.append({
            "width": width,
            "height": height,
            "items": coefficients,
            "u0": resolution["trx0"],
            "v0": resolution["try0"],
        })

    items = _inverse_dwt(subband_coefficients, reversible)
    top = component["resolutions"][kept_levels]
    return {
        "left": top["trx0"],
        "top": top["try0"],
        "width": subband_coefficients[-1]["width"],
        "height": subband_coefficients[-1]["height"],
        "items": items,
    }


# ---------------------------------------------------------------------------
# Inverse DWT (T.800 Annex F), vectorised with numpy


def _extend_sym(padded: np.ndarray, pad: int, size: int) -> None:
    """Whole-sample symmetric extension of each row, 4 samples each side."""
    for k in range(1, pad + 1):
        padded[:, pad - k] = padded[:, pad + k]
        padded[:, pad + size - 1 + k] = padded[:, pad + size - 1 - k]


def _filter_rows_53(items: np.ndarray, parity: int) -> np.ndarray:
    """Reversible 1D_SR (F.3.8.2) over every row of a 2D int array.

    Mirrors the reference's ReversibleTransform.filter index ranges
    (decodeJPX.js:2580-2598): with o = offset - parity and
    m = (length - i1Parity + parity) >> 1, the even-update runs over
    o, o+2, ..., o+2m and the odd-update over o+1, ..., o+2m-1.
    """
    h, w = items.shape
    if w == 1:
        # F.3.6 length-one case (base-class behaviour for both filters).
        if parity != 0:
            return (items * 0.5).astype(items.dtype)
        return items
    pad = 4
    padded = np.empty((h, w + 2 * pad), dtype=np.int64)
    padded[:, pad:pad + w] = items
    _extend_sym(padded, pad, w)
    o = pad - parity
    i1_parity = (parity + w) & 1
    m = (w - i1_parity + parity) >> 1
    even = o + 2 * np.arange(m + 1)
    padded[:, even] -= (padded[:, even - 1] + padded[:, even + 1] + 2) >> 2
    if m > 0:
        odd = o + 1 + 2 * np.arange(m)
        padded[:, odd] += (padded[:, odd - 1] + padded[:, odd + 1]) >> 1
    return padded[:, pad:pad + w]


_ALPHA = -1.586134342059924
_BETA = -0.052980118572961
_GAMMA = 0.882911075530934
_DELTA = 0.443506852043971
_K = 1.230174104914001


def _filter_rows_97(items: np.ndarray, parity: int) -> np.ndarray:
    """Irreversible 1D_SR (F.4.8.2) over every row of a 2D float array."""
    h, w = items.shape
    if w == 1:
        if parity != 0:
            return items * 0.5
        return items
    pad = 4
    padded = np.empty((h, w + 2 * pad), dtype=np.float64)
    padded[:, pad:pad + w] = items
    _extend_sym(padded, pad, w)
    n = padded.shape[1]
    o = pad - parity
    ev = np.arange(0, n)
    ev = ev[(ev - o) % 2 == 0]
    od = np.arange(0, n)
    od = od[(od - o) % 2 == 1]
    # step 1/2: scale
    padded[:, ev] *= _K
    padded[:, od] *= 1.0 / _K
    # step 3: even -= delta * neighbours (interior only)
    ev_i = ev[(ev >= 1) & (ev < n - 1)]
    padded[:, ev_i] -= _DELTA * (padded[:, ev_i - 1] + padded[:, ev_i + 1])
    _re_extend(padded, pad, w)
    od_i = od[(od >= 1) & (od < n - 1)]
    padded[:, od_i] -= _GAMMA * (padded[:, od_i - 1] + padded[:, od_i + 1])
    _re_extend(padded, pad, w)
    padded[:, ev_i] -= _BETA * (padded[:, ev_i - 1] + padded[:, ev_i + 1])
    _re_extend(padded, pad, w)
    padded[:, od_i] -= _ALPHA * (padded[:, od_i - 1] + padded[:, od_i + 1])
    return padded[:, pad:pad + w]


def _re_extend(padded: np.ndarray, pad: int, size: int) -> None:
    """Refresh the symmetric border between lifting steps.

    The reference runs each lifting step over a widened index range so
    border reads see values consistent with symmetric periodic extension;
    re-mirroring after each full-array step is equivalent.
    """
    _extend_sym(padded, pad, size)


def _inverse_dwt(subbands: list[dict], reversible: bool) -> np.ndarray:
    """2D_SR synthesis: fold each detail level onto the running LL."""
    ll = subbands[0]
    cast = (lambda a: np.rint(a).astype(np.int64)) if reversible \
        else (lambda a: a.astype(np.float64))
    ll_items = cast(ll["items"]).reshape(ll["height"], ll["width"])
    filter_rows = _filter_rows_53 if reversible else _filter_rows_97
    for level in subbands[1:]:
        items = cast(level["items"]).reshape(level["height"], level["width"])
        x_parity = level["u0"] & 1
        y_parity = level["v0"] & 1
        # 2D interleave (F.3.2): LL goes to the (xParity, yParity) grid;
        # detail coefficients were written interleaved by copyCoefficients.
        items[y_parity::2, x_parity::2] = ll_items
        items = filter_rows(items, x_parity)
        items = filter_rows(np.ascontiguousarray(items.T), y_parity).T
        ll_items = items
    return np.ascontiguousarray(ll_items).astype(np.float64).reshape(-1)


# ---------------------------------------------------------------------------
# Component assembly (MCT + bit-depth normalisation)


def _transform_components(context: dict, reduce_levels: int) -> list[dict]:
    siz = context["SIZ"]
    components = context["components"]
    ncomp = siz["Csiz"]
    results = []
    for tile in context["tiles"]:
        transformed = [
            _transform_tile(context, tile, c, reduce_levels)
            for c in range(ncomp)
        ]
        tile0 = transformed[0]
        out = np.zeros((len(tile0["items"]), ncomp), dtype=np.float64)
        mct = tile["codingStyleDefaultParameters"][
            "multipleComponentTransform"]
        if mct:
            y0 = transformed[0]["items"]
            y1 = transformed[1]["items"]
            y2 = transformed[2]["items"]
            # The reference computes shift/offset once from component 0
            # (decodeJPX.js:1728, its stated same-precision assumption).
            precision = components[0]["precision"]
            reversible = tile["components"][0]["codingStyleParameters"][
                "reversibleTransformation"]
            half_range = 1 << (precision - 1)
            yy = y0 + half_range
            if reversible:
                yy = yy.astype(np.int64)
                y1i = y1.astype(np.int64)
                y2i = y2.astype(np.int64)
                g = yy - ((y2i + y1i) >> 2)
                out[:, 0] = g + y2i
                out[:, 1] = g
                out[:, 2] = g + y1i
            else:
                out[:, 0] = yy + 1.402 * y2
                out[:, 1] = yy - 0.34413 * y1 - 0.71414 * y2
                out[:, 2] = yy + 1.772 * y1
            for c in range(3, ncomp):
                out[:, c] = transformed[c]["items"] + half_range
            out8 = _normalise_to_8bit(out, precision)
        else:
            out8 = np.zeros_like(out)
            for c in range(ncomp):
                precision = components[c]["precision"]
                half_range = 1 << (precision - 1)
                col = transformed[c]["items"] + half_range
                out8[:, c] = _normalise_to_8bit(
                    col.reshape(-1, 1), precision).reshape(-1)
        results.append({
            "left": tile0["left"],
            "top": tile0["top"],
            "width": tile0["width"],
            "height": tile0["height"],
            "items": out8.astype(np.uint8).reshape(-1),
        })
    return results


def _normalise_to_8bit(values: np.ndarray, precision: int) -> np.ndarray:
    """MSB-align samples of any precision into 0..255 (clamped)."""
    shift = precision - 8
    if shift < 0:
        scaled = np.floor(values) * (1 << -shift)
    elif shift > 0:
        scaled = np.floor(values + 0.5).astype(np.int64) >> shift
    else:
        scaled = np.floor(values + 0.5)
    return np.clip(scaled, 0, 255)


# ---------------------------------------------------------------------------
# Codestream + JP2 parsing


def _parse_codestream(data: bytes, start: int, end: int,
                      reduce_levels: int) -> dict:
    context: dict = {"mainHeader": True}
    do_not_recover = False
    try:
        position = start
        while position + 1 < end:
            code = _u16(data, position)
            position += 2
            length = 0
            if code == 0xFF4F:  # SOC
                context["mainHeader"] = True
            elif code == 0xFFD9:  # EOC
                pass
            elif code == 0xFF51:  # SIZ
                length = _u16(data, position)
                siz = {
                    "Xsiz": _u32(data, position + 4),
                    "Ysiz": _u32(data, position + 8),
                    "XOsiz": _u32(data, position + 12),
                    "YOsiz": _u32(data, position + 16),
                    "XTsiz": _u32(data, position + 20),
                    "YTsiz": _u32(data, position + 24),
                    "XTOsiz": _u32(data, position + 28),
                    "YTOsiz": _u32(data, position + 32),
                    "Csiz": _u16(data, position + 36),
                }
                components = []
                j = position + 38
                for _ in range(siz["Csiz"]):
                    component = {
                        "precision": (data[j] & 0x7F) + 1,
                        "isSigned": bool(data[j] & 0x80),
                        "XRsiz": data[j + 1],
                        "YRsiz": data[j + 2],
                    }
                    j += 3
                    _calculate_component_dimensions(component, siz)
                    components.append(component)
                context["SIZ"] = siz
                context["components"] = components
                _calculate_tile_grids(context, components)
                context["QCC"] = {}
                context["COC"] = {}
            elif code in (0xFF5C, 0xFF5D):  # QCD / QCC
                length = _u16(data, position)
                j = position + 2
                cqcc = None
                if code == 0xFF5D:
                    if context["SIZ"]["Csiz"] < 257:
                        cqcc = data[j]
                        j += 1
                    else:
                        cqcc = _u16(data, j)
                        j += 2
                sqcd = data[j]
                j += 1
                style = sqcd & 0x1F
                if style == 0:
                    spqcd_size, scalar_expounded = 8, True
                elif style == 1:
                    spqcd_size, scalar_expounded = 16, False
                elif style == 2:
                    spqcd_size, scalar_expounded = 16, True
                else:
                    raise JpxError(f"Invalid SQcd value {sqcd}")
                qcd = {
                    "noQuantization": spqcd_size == 8,
                    "scalarExpounded": scalar_expounded,
                    "guardBits": sqcd >> 5,
                }
                spqcds = []
                while j < length + position:
                    if spqcd_size == 8:
                        spqcds.append({"epsilon": data[j] >> 3, "mu": 0})
                        j += 1
                    else:
                        spqcds.append({
                            "epsilon": data[j] >> 3,
                            "mu": ((data[j] & 0x7) << 8) | data[j + 1],
                        })
                        j += 2
                qcd["SPqcds"] = spqcds
                if context["mainHeader"]:
                    if code == 0xFF5C:
                        context["QCD"] = qcd
                    else:
                        context["QCC"][cqcc] = qcd
                elif code == 0xFF5C:
                    context["currentTile"]["QCD"] = qcd
                    context["currentTile"]["QCC"] = {}
                else:
                    context["currentTile"]["QCC"][cqcc] = qcd
            elif code == 0xFF52:  # COD
                length = _u16(data, position)
                j = position + 2
                scod = data[j]
                j += 1
                cod = {
                    "entropyCoderWithCustomPrecincts": bool(scod & 1),
                    "sopMarkerUsed": bool(scod & 2),
                    "ephMarkerUsed": bool(scod & 4),
                    "progressionOrder": data[j],
                    "layersCount": _u16(data, j + 1),
                    "multipleComponentTransform": data[j + 3],
                    "decompositionLevelsCount": data[j + 4],
                    "xcb": (data[j + 5] & 0xF) + 2,
                    "ycb": (data[j + 6] & 0xF) + 2,
                }
                block_style = data[j + 7]
                cod["selectiveArithmeticCodingBypass"] = bool(block_style & 1)
                cod["resetContextProbabilities"] = bool(block_style & 2)
                cod["terminationOnEachCodingPass"] = bool(block_style & 4)
                cod["verticallyCausalContext"] = bool(block_style & 8)
                cod["predictableTermination"] = bool(block_style & 16)
                cod["segmentationSymbolUsed"] = bool(block_style & 32)
                cod["reversibleTransformation"] = data[j + 8]
                j += 9
                if cod["entropyCoderWithCustomPrecincts"]:
                    sizes = []
                    while j < length + position:
                        ps = data[j]
                        j += 1
                        sizes.append({"PPx": ps & 0xF, "PPy": ps >> 4})
                    cod["precinctsSizes"] = sizes
                if cod["selectiveArithmeticCodingBypass"]:
                    # D.6 raw-pass bypass: unsupported, as in the reference
                    # (decodeJPX.js:433).
                    do_not_recover = True
                    raise JpxError(
                        "Unsupported COD option "
                        "(selectiveArithmeticCodingBypass)")
                if context["mainHeader"]:
                    context["COD"] = cod
                else:
                    context["currentTile"]["COD"] = cod
                    context["currentTile"]["COC"] = {}
            elif code == 0xFF90:  # SOT
                length = _u16(data, position)
                tile_part = {
                    "index": _u16(data, position + 2),
                    "length": _u32(data, position + 4),
                    "partIndex": data[position + 8],
                    "partsCount": data[position + 9],
                }
                tile_part["dataEnd"] = tile_part["length"] + position - 2
                context["mainHeader"] = False
                if tile_part["partIndex"] == 0:
                    tile_part["COD"] = context["COD"]
                    tile_part["COC"] = dict(context["COC"])
                    tile_part["QCD"] = context["QCD"]
                    tile_part["QCC"] = dict(context["QCC"])
                context["currentTile"] = tile_part
            elif code == 0xFF93:  # SOD
                tile_part = context["currentTile"]
                tile = context["tiles"][tile_part["index"]]
                if tile_part["partIndex"] == 0:
                    _initialize_tile(context, tile_part["index"])
                    build_packets(context, tile)
                length = tile_part["dataEnd"] - position
                parse_tile_packets(context, data, position, length)
            elif code == 0xFF53:  # COC — not implemented (as the reference)
                length = _u16(data, position)
            elif code in (0xFF55, 0xFF57, 0xFF58, 0xFF64):
                # TLM / PLM / PLT / COM: skip
                length = _u16(data, position)
            else:
                raise JpxError(f"Unknown codestream code: {code:x}")
            position += length
    except Exception as exc:
        # Recover with whatever decoded so far (the reference's behaviour,
        # decodeJPX.js:506-512) unless recovery would mask wrong pixels.
        if do_not_recover:
            raise JpxError(str(exc)) from exc
    if "tiles" not in context:
        raise JpxError("No tiles decoded")
    return context


def _initialize_tile(context: dict, tile_index: int) -> None:
    siz = context["SIZ"]
    tile = context["tiles"][tile_index]
    current = context["currentTile"]
    for c in range(siz["Csiz"]):
        component = tile["components"][c]
        component["quantizationParameters"] = current["QCC"].get(
            c, current["QCD"])
        component["codingStyleParameters"] = current["COC"].get(
            c, current["COD"])
    tile["codingStyleDefaultParameters"] = current["COD"]


@dataclass
class JpxImage:
    width: int = 0
    height: int = 0
    components_count: int = 0
    components_precision: list[int] = field(default_factory=list)
    tiles: list[dict] = field(default_factory=list)
    palette: dict | None = None
    component_mapping: list[dict] | None = None


def _parse_jp2_boxes(image: JpxImage, data: bytes,
                     reduce_levels: int) -> None:
    position = 0
    length = len(data)
    while position < length:
        header_size = 8
        lbox = _u32(data, position)
        tbox = _u32(data, position + 4)
        position += header_size
        if lbox == 1:
            lbox = (_u32(data, position) * 4294967296
                    + _u32(data, position + 4))
            position += 8
            header_size += 8
        if lbox == 0:
            lbox = length - position + header_size
        if lbox < header_size:
            raise JpxError("Invalid box field size")
        data_length = lbox - header_size
        jump = True
        if tbox == 0x6A703268:  # jp2h: descend into child boxes
            jump = False
        elif tbox == 0x70636C72:  # pclr (I.5.3.4)
            ne = _u16(data, position)
            npc = data[position + 2]
            pp = position + 3
            bit_depths = []
            for _ in range(npc):
                bit_depths.append((data[pp] & 0x7F) + 1)
                pp += 1
            lut = bytearray(ne * npc)
            for j in range(ne):
                for i in range(npc):
                    depth = bit_depths[i]
                    byte_len = (depth + 7) // 8
                    v = int.from_bytes(data[pp:pp + byte_len], "big")
                    pp += byte_len
                    lut[j * npc + i] = (
                        v >> (depth - 8) if depth >= 8 else v << (8 - depth)
                    ) & 0xFF
            image.palette = {"columns": npc, "lut": bytes(lut)}
        elif tbox == 0x636D6170:  # cmap (I.5.3.5)
            mapping = []
            p = position
            while p + 4 <= position + data_length:
                mapping.append({
                    "cmp": _u16(data, p),
                    "mtyp": data[p + 2],
                    "pcol": data[p + 3],
                })
                p += 4
            image.component_mapping = mapping
        elif tbox == 0x6A703263:  # jp2c
            _decode_codestream_into(image, data, position,
                                    position + data_length, reduce_levels)
        # jP\040\040 signature, ftyp, ihdr, colr, res, rreq: skipped
        if jump:
            position += data_length


def _decode_codestream_into(image: JpxImage, data: bytes, start: int,
                            end: int, reduce_levels: int) -> None:
    context = _parse_codestream(data, start, end, reduce_levels)
    effective_reduce = max(0, reduce_levels)
    if effective_reduce > 0:
        for tile in context["tiles"]:
            for component in tile["components"]:
                levels = component["codingStyleParameters"][
                    "decompositionLevelsCount"]
                effective_reduce = min(effective_reduce, levels)
    image.tiles = _transform_components(context, effective_reduce)
    siz = context["SIZ"]
    image.width = siz["Xsiz"] - siz["XOsiz"]
    image.height = siz["Ysiz"] - siz["YOsiz"]
    if effective_reduce > 0:
        image.width = max(
            (t["left"] + t["width"] for t in image.tiles), default=0)
        image.height = max(
            (t["top"] + t["height"] for t in image.tiles), default=0)
    image.components_count = siz["Csiz"]
    image.components_precision = [
        c["precision"] for c in context["components"]]


def decode_jpx(data: bytes, reduce_levels: int = 0,
               apply_internal_palette: bool = True) -> dict:
    """Decode a JPEG 2000 codestream or JP2 file.

    Returns ``{"width", "height", "components", "pixel_data"
    (np.uint8, h*w*components interleaved), "precision"}``.
    Raises :class:`JpxError` on unrecoverable streams.
    """
    if len(data) < 2:
        raise JpxError("Truncated JPX stream")
    image = JpxImage()
    if _u16(data, 0) == 0xFF4F:
        _decode_codestream_into(image, data, 0, len(data), reduce_levels)
    else:
        _parse_jp2_boxes(image, data, reduce_levels)
    if not image.tiles:
        raise JpxError("JPX stream produced no tiles")

    width = image.width
    height = image.height
    ncomp = image.components_count
    pixel_data = np.zeros(width * height * ncomp, dtype=np.uint8)
    for tile in image.tiles:
        tile_width = tile["width"]
        tile_height = tile["height"]
        items = tile["items"].reshape(tile_height, tile_width * ncomp)
        grid = pixel_data.reshape(height, width * ncomp)
        x0 = tile["left"] * ncomp
        grid[tile["top"]:tile["top"] + tile_height,
             x0:x0 + tile_width * ncomp] = items

    if image.palette and apply_internal_palette:
        # I.5.3.4/I.5.3.5: index samples expand through the palette; a PDF
        # /Indexed colour space overrides it (apply_internal_palette=False).
        columns = image.palette["columns"]
        lut = np.frombuffer(image.palette["lut"], dtype=np.uint8).reshape(
            -1, columns)
        mapping = image.component_mapping or [
            {"cmp": 0, "mtyp": 1, "pcol": c} for c in range(columns)]
        idx_precision = (image.components_precision[0]
                         if image.components_precision else 8)
        idx_shift = 8 - idx_precision if idx_precision < 8 else 0
        pixels = pixel_data.reshape(-1, ncomp)
        out = np.zeros((pixels.shape[0], len(mapping)), dtype=np.uint8)
        for c, m in enumerate(mapping):
            sample = pixels[:, m["cmp"]]
            if m["mtyp"] == 1:
                index = sample >> idx_shift if idx_shift else sample
                out[:, c] = lut[np.minimum(index, lut.shape[0] - 1), m["pcol"]]
            else:
                out[:, c] = sample
        return {
            "width": width,
            "height": height,
            "components": len(mapping),
            "pixel_data": out.reshape(-1),
            "precision": [8] * len(mapping),
        }

    return {
        "width": width,
        "height": height,
        "components": ncomp,
        "pixel_data": pixel_data,
        "precision": image.components_precision,
    }
