"""Built-in encodings of the symbolic base fonts.

Symbol positions follow Adobe's published symbol.txt mapping (the
Adobe Symbol encoding -> Unicode table distributed via unicode.org);
Wingdings positions follow the official Unicode mapping from proposal
N4384 (UTC L2/12-368) — 0xFF (Windows logo) was never encoded. Both
are public spec data.

Reference parity: js/pdf/fonts/standardEncodings.js symbolToUnicode /
wingdingsToUnicode + the repair rules of parsePdfFonts.js:1050-1099
and :1422-1438 — producers routinely ship Symbol/Wingdings text with
a ToUnicode that pushed the byte through Latin-1/WinAnsi/MacRoman, or
with Microsoft symbol-cmap PUA codepoints (0xF000 + position), so the
charts both fill missing entries and repair the artifacts.
"""

from __future__ import annotations

import re

SYMBOL_TO_UNICODE: dict[int, int] = {
    32: 0x0020, 33: 0x0021, 34: 0x2200, 35: 0x0023, 36: 0x2203,
    37: 0x0025, 38: 0x0026, 39: 0x220B, 40: 0x0028, 41: 0x0029,
    42: 0x2217, 43: 0x002B, 44: 0x002C, 45: 0x2212, 46: 0x002E,
    47: 0x002F, 48: 0x0030, 49: 0x0031, 50: 0x0032, 51: 0x0033,
    52: 0x0034, 53: 0x0035, 54: 0x0036, 55: 0x0037, 56: 0x0038,
    57: 0x0039, 58: 0x003A, 59: 0x003B, 60: 0x003C, 61: 0x003D,
    62: 0x003E, 63: 0x003F, 64: 0x2245,
    # uppercase Greek
    65: 0x0391, 66: 0x0392, 67: 0x03A7, 68: 0x0394, 69: 0x0395,
    70: 0x03A6, 71: 0x0393, 72: 0x0397, 73: 0x0399, 74: 0x03D1,
    75: 0x039A, 76: 0x039B, 77: 0x039C, 78: 0x039D, 79: 0x039F,
    80: 0x03A0, 81: 0x0398, 82: 0x03A1, 83: 0x03A3, 84: 0x03A4,
    85: 0x03A5, 86: 0x03C2, 87: 0x03A9, 88: 0x039E, 89: 0x03A8,
    90: 0x0396, 91: 0x005B, 92: 0x2234, 93: 0x005D, 94: 0x22A5,
    95: 0x005F, 96: 0xF8E5,
    # lowercase Greek
    97: 0x03B1, 98: 0x03B2, 99: 0x03C7, 100: 0x03B4, 101: 0x03B5,
    102: 0x03C6, 103: 0x03B3, 104: 0x03B7, 105: 0x03B9, 106: 0x03D5,
    107: 0x03BA, 108: 0x03BB, 109: 0x03BC, 110: 0x03BD, 111: 0x03BF,
    112: 0x03C0, 113: 0x03B8, 114: 0x03C1, 115: 0x03C3, 116: 0x03C4,
    117: 0x03C5, 118: 0x03D6, 119: 0x03C9, 120: 0x03BE, 121: 0x03C8,
    122: 0x03B6, 123: 0x007B, 124: 0x007C, 125: 0x007D, 126: 0x223C,
    # high region: operators, arrows, card suits, delimiters
    160: 0x20AC, 161: 0x03D2, 162: 0x2032, 163: 0x2264, 164: 0x2044,
    165: 0x221E, 166: 0x0192, 167: 0x2663, 168: 0x2666, 169: 0x2665,
    170: 0x2660, 171: 0x2194, 172: 0x2190, 173: 0x2191, 174: 0x2192,
    175: 0x2193, 176: 0x00B0, 177: 0x00B1, 178: 0x2033, 179: 0x2265,
    180: 0x00D7, 181: 0x221D, 182: 0x2202, 183: 0x2022, 184: 0x00F7,
    185: 0x2260, 186: 0x2261, 187: 0x2248, 188: 0x2026, 189: 0x23D0,
    190: 0x23AF, 191: 0x21B5, 192: 0x2135, 193: 0x2111, 194: 0x211C,
    195: 0x2118, 196: 0x2297, 197: 0x2295, 198: 0x2205, 199: 0x2229,
    200: 0x222A, 201: 0x2283, 202: 0x2287, 203: 0x2284, 204: 0x2282,
    205: 0x2286, 206: 0x2208, 207: 0x2209, 208: 0x2220, 209: 0x2207,
    210: 0x00AE, 211: 0x00A9, 212: 0x2122, 213: 0x220F, 214: 0x221A,
    215: 0x22C5, 216: 0x00AC, 217: 0x2227, 218: 0x2228, 219: 0x21D4,
    220: 0x21D0, 221: 0x21D1, 222: 0x21D2, 223: 0x21D3, 224: 0x25CA,
    225: 0x2329, 226: 0x00AE, 227: 0x00A9, 228: 0x2122, 229: 0x2211,
    230: 0x239B, 231: 0x239C, 232: 0x239D, 233: 0x23A1, 234: 0x23A2,
    235: 0x23A3, 236: 0x23A7, 237: 0x23A8, 238: 0x23A9, 239: 0x23AA,
    241: 0x232A, 242: 0x222B, 243: 0x2320, 244: 0x23AE, 245: 0x2321,
    246: 0x239E, 247: 0x239F, 248: 0x23A0, 249: 0x23A4, 250: 0x23A5,
    251: 0x23A6, 252: 0x23AB, 253: 0x23AC, 254: 0x23AD,
}

WINGDINGS_TO_UNICODE: dict[int, int] = {
    32: 0x0020, 33: 0x1F589, 34: 0x2702, 35: 0x2701, 36: 0x1F453,
    37: 0x1F56D, 38: 0x1F56E, 39: 0x1F56F, 40: 0x1F57F, 41: 0x2706,
    42: 0x1F582, 43: 0x1F583, 44: 0x1F4EA, 45: 0x1F4EB, 46: 0x1F4EC,
    47: 0x1F4ED, 48: 0x1F5C0, 49: 0x1F5C1, 50: 0x1F5CE, 51: 0x1F5CF,
    52: 0x1F5D0, 53: 0x1F5C4, 54: 0x23F3, 55: 0x1F5AE, 56: 0x1F5B0,
    57: 0x1F5B2, 58: 0x1F5B3, 59: 0x1F5B4, 60: 0x1F5AB, 61: 0x1F5AC,
    62: 0x2707, 63: 0x270D, 64: 0x1F58E, 65: 0x270C, 66: 0x1F58F,
    67: 0x1F44D, 68: 0x1F44E, 69: 0x261C, 70: 0x261E, 71: 0x261D,
    72: 0x1F597, 73: 0x1F590, 74: 0x263A, 75: 0x1F610, 76: 0x2639,
    77: 0x1F4A3, 78: 0x1F571, 79: 0x1F3F3, 80: 0x1F3F1, 81: 0x2708,
    82: 0x263C, 83: 0x1F322, 84: 0x2744, 85: 0x1F546, 86: 0x271E,
    87: 0x1F548, 88: 0x2720, 89: 0x2721, 90: 0x262A, 91: 0x262F,
    92: 0x1F549, 93: 0x2638, 94: 0x2648, 95: 0x2649, 96: 0x264A,
    97: 0x264B, 98: 0x264C, 99: 0x264D, 100: 0x264E, 101: 0x264F,
    102: 0x2650, 103: 0x2651, 104: 0x2652, 105: 0x2653, 106: 0x1F670,
    107: 0x1F675, 108: 0x26AB, 109: 0x1F53E, 110: 0x25FC,
    111: 0x1F78F, 112: 0x1F790, 113: 0x2751, 114: 0x2752,
    115: 0x1F79F, 116: 0x29EB, 117: 0x25C6, 118: 0x2756,
    119: 0x1F799, 120: 0x2327, 121: 0x2BB9, 122: 0x2318,
    123: 0x1F3F5, 124: 0x1F3F6, 125: 0x1F676, 126: 0x1F677,
    128: 0x1F10B, 129: 0x2780, 130: 0x2781, 131: 0x2782, 132: 0x2783,
    133: 0x2784, 134: 0x2785, 135: 0x2786, 136: 0x2787, 137: 0x2788,
    138: 0x2789, 139: 0x1F10C, 140: 0x278A, 141: 0x278B, 142: 0x278C,
    143: 0x278D, 144: 0x278E, 145: 0x278F, 146: 0x2790, 147: 0x2791,
    148: 0x2792, 149: 0x2793, 150: 0x1F662, 151: 0x1F660,
    152: 0x1F661, 153: 0x1F663, 154: 0x1F65E, 155: 0x1F65C,
    156: 0x1F65D, 157: 0x1F65F, 158: 0x2219, 159: 0x2022,
    160: 0x2B1D, 161: 0x2B58, 162: 0x1F786, 163: 0x1F788,
    164: 0x1F78A, 165: 0x1F78B, 166: 0x1F53F, 167: 0x25AA,
    168: 0x1F78E, 169: 0x1F7C1, 170: 0x1F7C5, 171: 0x2605,
    172: 0x1F7CB, 173: 0x1F7CF, 174: 0x1F7D3, 175: 0x1F7D1,
    176: 0x2BD0, 177: 0x2316, 178: 0x2BCE, 179: 0x2BCF, 180: 0x2BD1,
    181: 0x272A, 182: 0x2730, 183: 0x1F550, 184: 0x1F551,
    185: 0x1F552, 186: 0x1F553, 187: 0x1F554, 188: 0x1F555,
    189: 0x1F556, 190: 0x1F557, 191: 0x1F558, 192: 0x1F559,
    193: 0x1F55A, 194: 0x1F55B, 195: 0x2BB0, 196: 0x2BB1,
    197: 0x2BB2, 198: 0x2BB3, 199: 0x2BB4, 200: 0x2BB5, 201: 0x2BB6,
    202: 0x2BB7, 203: 0x1F66A, 204: 0x1F66B, 205: 0x1F655,
    206: 0x1F654, 207: 0x1F657, 208: 0x1F656, 209: 0x1F650,
    210: 0x1F651, 211: 0x1F652, 212: 0x1F653, 213: 0x232B,
    214: 0x2326, 215: 0x2B98, 216: 0x2B9A, 217: 0x2B99, 218: 0x2B9B,
    219: 0x2B88, 220: 0x2B8A, 221: 0x2B89, 222: 0x2B8B, 223: 0x1F868,
    224: 0x1F86A, 225: 0x1F869, 226: 0x1F86B, 227: 0x1F86C,
    228: 0x1F86D, 229: 0x1F86F, 230: 0x1F86E, 231: 0x1F878,
    232: 0x1F87A, 233: 0x1F879, 234: 0x1F87B, 235: 0x1F87C,
    236: 0x1F87D, 237: 0x1F87F, 238: 0x1F87E, 239: 0x21E6,
    240: 0x21E8, 241: 0x21E7, 242: 0x21E9, 243: 0x2B04, 244: 0x21F3,
    245: 0x2B01, 246: 0x2B00, 247: 0x2B03, 248: 0x2B02, 249: 0x1F8AC,
    250: 0x1F8AD, 251: 0x1F5F6, 252: 0x2713, 253: 0x1F5F7,
    254: 0x1F5F9,
}

# ZapfDingbats glyph number (aN) -> Unicode, per the Adobe AGLFN
# zapfdingbats list; most of the face landed in U+2700-27BF in font
# order, so the irregular entries are spelled out and the sequential
# runs constructed.
DINGBATS_GLYPH_UNICODE: dict[int, int] = {
    1: 0x2701, 2: 0x2702, 3: 0x2704, 4: 0x260E, 5: 0x2706,
    6: 0x271D, 7: 0x271E, 8: 0x271F, 9: 0x2720, 10: 0x2721,
    11: 0x261B, 12: 0x261E, 13: 0x270C, 14: 0x270D, 15: 0x270E,
    16: 0x270F, 17: 0x2711, 18: 0x2712, 19: 0x2713, 20: 0x2714,
    21: 0x2715, 22: 0x2716, 23: 0x2717, 24: 0x2718, 25: 0x2719,
    26: 0x271A, 27: 0x271B, 28: 0x271C, 35: 0x2605,
    71: 0x25CF, 72: 0x274D, 73: 0x25A0, 74: 0x274F, 75: 0x2751,
    76: 0x25B2, 77: 0x25BC, 78: 0x25C6, 79: 0x2756, 81: 0x25D7,
    82: 0x2758, 83: 0x2759, 84: 0x275A, 85: 0x276F, 86: 0x2771,
    87: 0x2772, 88: 0x2773, 89: 0x2768, 90: 0x2769, 91: 0x276C,
    92: 0x276D, 93: 0x276A, 94: 0x276B, 95: 0x2774, 96: 0x2775,
    97: 0x275B, 98: 0x275C, 99: 0x275D, 100: 0x275E, 101: 0x2761,
    102: 0x2762, 103: 0x2763, 104: 0x2764, 105: 0x2710, 106: 0x2765,
    107: 0x2766, 108: 0x2767, 109: 0x2660, 110: 0x2665, 111: 0x2666,
    112: 0x2663, 117: 0x2709, 118: 0x2708, 119: 0x2707,
    160: 0x2794, 161: 0x2192, 162: 0x27A3, 163: 0x2194, 164: 0x2195,
    165: 0x2799, 166: 0x279B, 174: 0x27A4, 175: 0x27A5, 176: 0x27A6,
    177: 0x27A7, 178: 0x27A8, 179: 0x27A9, 180: 0x27AB, 181: 0x27AD,
    182: 0x27AF, 183: 0x27B2, 184: 0x27B3, 185: 0x27B5, 186: 0x27B8,
    187: 0x27BA, 188: 0x27BB, 189: 0x27BC, 190: 0x27BD, 191: 0x27BE,
    192: 0x279A, 193: 0x27AA, 194: 0x27B6, 195: 0x27B9, 196: 0x2798,
    197: 0x27B4, 198: 0x27B7, 199: 0x27AC, 200: 0x27AE, 201: 0x27B1,
    202: 0x2703, 203: 0x2750, 204: 0x2752, 205: 0x276E, 206: 0x2770,
}
DINGBATS_GLYPH_UNICODE.update({n: 0x2722 + (n - 29)
                               for n in range(29, 35)})     # a29-a34
DINGBATS_GLYPH_UNICODE.update({n: 0x2729 + (n - 36)
                               for n in range(36, 71)})     # a36-a70
DINGBATS_GLYPH_UNICODE.update({n: 0x2460 + (n - 120)
                               for n in range(120, 130)})   # circled 1-10
DINGBATS_GLYPH_UNICODE.update({n: 0x2776 + (n - 130)
                               for n in range(130, 160)})   # neg/serif
DINGBATS_GLYPH_UNICODE.update({n: 0x279C + (n - 167)
                               for n in range(167, 174)})   # arrows

# ZapfDingbats built-in encoding: charCode -> glyph number (0 = space);
# PDF 32000-1 Annex D.5 (codes 32-126 and 161-254, 240 undefined).
DINGBATS_ENCODING: dict[int, int] = {32: 0}
for _c, _n in zip(range(33, 48),
                  (1, 2, 202, 3, 4, 5, 119, 118, 117,
                   11, 12, 13, 14, 15, 16)):
    DINGBATS_ENCODING[_c] = _n
for _c, _n in zip(range(48, 61),
                  (105, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28)):
    DINGBATS_ENCODING[_c] = _n
for _c, _n in zip(range(61, 66), (6, 7, 8, 9, 10)):
    DINGBATS_ENCODING[_c] = _n
DINGBATS_ENCODING.update({c: 29 + (c - 66) for c in range(66, 112)})
for _c, _n in zip(range(112, 127),
                  (203, 75, 204, 76, 77, 78, 79, 81, 82, 83, 84,
                   97, 98, 99, 100)):
    DINGBATS_ENCODING[_c] = _n
for _c, _n in zip(range(161, 172),
                  (101, 102, 103, 104, 106, 107, 108, 112, 111, 110,
                   109)):
    DINGBATS_ENCODING[_c] = _n
DINGBATS_ENCODING.update({c: 120 + (c - 172) for c in range(172, 214)})
for _c, _n in zip(range(214, 240),
                  (163, 164, 196, 165, 192, 166, 167, 168, 169, 170,
                   171, 172, 173, 162, 174, 175, 176, 177, 178, 179,
                   193, 180, 199, 181, 200, 182)):
    DINGBATS_ENCODING[_c] = _n
for _c, _n in zip(range(241, 255),
                  (201, 183, 184, 197, 185, 194, 198, 186, 195, 187,
                   188, 189, 190, 191)):
    DINGBATS_ENCODING[_c] = _n
del _c, _n


def dingbats_code_unicode(code: int) -> str | None:
    n = DINGBATS_ENCODING.get(code)
    if n is None:
        return None
    if n == 0:
        return " "
    cp = DINGBATS_GLYPH_UNICODE.get(n)
    return chr(cp) if cp is not None else None


def dingbats_name_unicode(glyph_name: str) -> str | None:
    if glyph_name == "space":
        return " "
    m = re.match(r"^a(\d+)$", glyph_name)
    if not m:
        return None
    cp = DINGBATS_GLYPH_UNICODE.get(int(m.group(1)))
    return chr(cp) if cp is not None else None


_WINGDINGS_NAME_RE = re.compile(r"^(?:.*\+)?Wingdings(?:-\w+)?$", re.I)
_SYMBOL_NAME_RE = re.compile(r"^Symbol(?:[-,]\w+|[A-Za-z\d]*)$", re.I)


def _win_mac_char(code: int) -> tuple[str | None, str | None]:
    win = mac = None
    b = bytes((code,))
    try:
        win = b.decode("cp1252")
    except UnicodeDecodeError:
        pass
    try:
        mac = b.decode("mac-roman")
    except UnicodeDecodeError:
        pass
    return win, mac


def apply_symbolic_font_charts(f, named_encoding_authoritative: bool,
                               has_named_base_encoding: bool = False
                               ) -> None:
    """Fill/repair ToUnicode and the encoding map for Symbol,
    Wingdings, and ZapfDingbats base fonts
    (parsePdfFonts.js:1050-1099, 1160-1175, 1422-1438)."""
    base = f.base_name or ""
    if not has_named_base_encoding and re.search(r"ZapfDingbats", base,
                                                 re.I):
        for code in DINGBATS_ENCODING:
            u = dingbats_code_unicode(code)
            if u is not None:
                f.encoding.setdefault(code, u)
        if not f.to_unicode:
            for code in DINGBATS_ENCODING:
                u = dingbats_code_unicode(code)
                if u is not None:
                    f.to_unicode[code] = u
        return
    if named_encoding_authoritative:
        return
    if _WINGDINGS_NAME_RE.match(base):
        for cid, ch in list(f.to_unicode.items()):
            if not ch:
                continue
            cp = ord(ch[0])
            win, mac = _win_mac_char(cid) if 32 <= cid <= 255 \
                else (None, None)
            wrong_artifact = (ch == chr(cid) if cid < 0x110000
                              else False) or ch == win or ch == mac
            if 0xF000 <= cp <= 0xF0FF \
                    and (cp & 0xFF) in WINGDINGS_TO_UNICODE:
                # Word writes the Microsoft symbol-cmap codepoint whose
                # low byte is the Wingdings position
                f.to_unicode[cid] = chr(WINGDINGS_TO_UNICODE[cp & 0xFF])
            elif cp <= 0xFF and cp in WINGDINGS_TO_UNICODE:
                f.to_unicode[cid] = chr(WINGDINGS_TO_UNICODE[cp])
            elif wrong_artifact and cid in WINGDINGS_TO_UNICODE:
                f.to_unicode[cid] = chr(WINGDINGS_TO_UNICODE[cid])
        for cc, u in WINGDINGS_TO_UNICODE.items():
            f.to_unicode.setdefault(cc, chr(u))
        # the declared MacRoman/WinAnsi encoding resolves to
        # meaningless Latin chars; correct it too (no artifact guard —
        # encoding codes ARE glyph positions by construction)
        for cid, ch in list(f.encoding.items()):
            cp = ord(ch[0]) if ch else None
            if cp is not None and cp <= 0xFF \
                    and cp in WINGDINGS_TO_UNICODE:
                f.encoding[cid] = chr(WINGDINGS_TO_UNICODE[cp])
            elif cid in WINGDINGS_TO_UNICODE:
                f.encoding[cid] = chr(WINGDINGS_TO_UNICODE[cid])
        for cc, u in WINGDINGS_TO_UNICODE.items():
            f.encoding.setdefault(cc, chr(u))
        return
    if _SYMBOL_NAME_RE.match(base):
        broken = bool(f.to_unicode) and f.to_unicode.get(65) == "A"
        if broken or not f.to_unicode:
            for cc, u in SYMBOL_TO_UNICODE.items():
                f.to_unicode[cc] = chr(u)
        else:
            # Word's Identity-H Symbol subsets map glyphs to the
            # Microsoft symbol-cmap PUA (0xF000 + Symbol position)
            for cid, ch in list(f.to_unicode.items()):
                if not ch:
                    continue
                cp = ord(ch[0])
                if 0xF000 <= cp <= 0xF0FF \
                        and (cp & 0xFF) in SYMBOL_TO_UNICODE:
                    f.to_unicode[cid] = chr(SYMBOL_TO_UNICODE[cp & 0xFF])
