"""Standard-14 font metrics: advance widths for PDFs that omit /Widths.

PDF 1.0-1.4 lets a document reference the 14 built-in Type1 fonts
(Helvetica / Times / Courier families, Symbol, ZapfDingbats) without a
/Widths array; a conforming reader must then supply the advances from
the fonts' published metrics. The numbers below are the Adobe Core 14
AFM values (public spec data distributed by Adobe with every PDF SDK,
"Font Metrics for PDF Core 14 Fonts") re-keyed to WinAnsiEncoding
(PDF 32000-1 Annex D.3: every otherwise-undefined slot in 0x7F-0x9F
maps to the bullet glyph, so those slots carry the bullet width).

Reference parity: js/pdf/fonts/standardFontMetrics.js (the same AFM
facts; this module is an independent implementation — name matching,
remap application and the MacRoman/Differences re-keying live in
fonts.load_font, mirroring parsePdfFonts.js:1466-1537 semantics).

Oblique/Italic variants: Helvetica and Courier obliques share their
upright advances (the AFM files publish identical widths); the four
Times faces each have their own table.
"""

from __future__ import annotations

import re

# charCode -> width, WinAnsiEncoding, codes 32-255 (224 entries/table).
_HELVETICA = (
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333, 278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278, 584, 584, 584, 556,
    1015, 667, 667, 722, 722, 667, 611, 778, 722, 278, 500, 667, 556, 833, 722, 778,
    667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556,
    333, 556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833, 556, 556,
    556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
    # 127-143: bullet, Euro, bullet, quotesinglbase..OE, bullet, Zcaron, bullet
    350, 556, 350, 222, 556, 333, 1000, 556, 556, 333, 1000, 667, 333, 1000, 350, 611, 350,
    # 144-159: bullet, quoteleft..oe, bullet, zcaron, Ydieresis
    350, 222, 222, 333, 333, 350, 556, 1000, 333, 1000, 500, 333, 944, 350, 500, 667,
    # 160-175: nbsp, exclamdown..macron
    278, 333, 556, 556, 556, 556, 260, 556, 333, 737, 370, 556, 584, 333, 737, 333,
    # 176-191: degree..questiondown
    400, 584, 333, 333, 333, 556, 537, 278, 333, 333, 365, 556, 834, 834, 834, 611,
    # 192-207: Agrave..Idieresis
    667, 667, 667, 667, 667, 667, 1000, 722, 667, 667, 667, 667, 278, 278, 278, 278,
    # 208-223: Eth..germandbls
    722, 722, 778, 778, 778, 778, 778, 584, 778, 722, 722, 722, 722, 667, 667, 611,
    # 224-239: agrave..idieresis
    556, 556, 556, 556, 556, 556, 889, 500, 556, 556, 556, 556, 278, 278, 278, 278,
    # 240-255: eth..ydieresis
    556, 556, 556, 556, 556, 556, 556, 584, 611, 556, 556, 556, 556, 500, 556, 500,
)

_HELVETICA_BOLD = (
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333, 278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 333, 333, 584, 584, 584, 611,
    975, 722, 722, 722, 722, 667, 611, 778, 722, 278, 556, 722, 611, 833, 722, 778,
    667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611, 333, 278, 333, 584, 556,
    333, 556, 611, 556, 611, 556, 333, 611, 611, 278, 278, 556, 278, 889, 611, 611,
    611, 611, 389, 556, 333, 611, 556, 778, 556, 556, 500, 389, 280, 389, 584,
    350, 556, 350, 278, 556, 500, 1000, 556, 556, 333, 1000, 667, 333, 1000, 350, 611, 350,
    350, 278, 278, 500, 500, 350, 556, 1000, 333, 1000, 556, 333, 944, 350, 500, 667,
    278, 333, 556, 556, 556, 556, 280, 556, 333, 737, 370, 556, 584, 333, 737, 333,
    400, 584, 333, 333, 333, 611, 556, 278, 333, 333, 365, 556, 834, 834, 834, 611,
    722, 722, 722, 722, 722, 722, 1000, 722, 667, 667, 667, 667, 278, 278, 278, 278,
    722, 722, 778, 778, 778, 778, 778, 584, 778, 722, 722, 722, 722, 667, 667, 611,
    556, 556, 556, 556, 556, 556, 889, 556, 556, 556, 556, 556, 278, 278, 278, 278,
    611, 611, 611, 611, 611, 611, 611, 584, 611, 611, 611, 611, 611, 556, 611, 556,
)

_TIMES_ROMAN = (
    250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278, 564, 564, 564, 444,
    921, 722, 667, 667, 722, 611, 556, 722, 722, 333, 389, 722, 611, 889, 722, 722,
    556, 722, 667, 556, 611, 722, 722, 944, 722, 722, 611, 333, 278, 333, 469, 500,
    333, 444, 500, 444, 500, 444, 333, 500, 500, 278, 278, 500, 278, 778, 500, 500,
    500, 500, 333, 389, 278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541,
    350, 500, 350, 333, 500, 444, 1000, 500, 500, 333, 1000, 556, 333, 889, 350, 611, 350,
    350, 333, 333, 444, 444, 350, 500, 1000, 333, 980, 389, 333, 722, 350, 444, 722,
    250, 333, 500, 500, 500, 500, 200, 500, 333, 760, 276, 500, 564, 333, 760, 333,
    400, 564, 300, 300, 333, 500, 453, 250, 333, 300, 310, 500, 750, 750, 750, 444,
    722, 722, 722, 722, 722, 722, 889, 667, 611, 611, 611, 611, 333, 333, 333, 333,
    722, 722, 722, 722, 722, 722, 722, 564, 722, 722, 722, 722, 722, 722, 556, 500,
    444, 444, 444, 444, 444, 444, 667, 444, 444, 444, 444, 444, 278, 278, 278, 278,
    500, 500, 500, 500, 500, 500, 500, 564, 500, 500, 500, 500, 500, 500, 500, 500,
)

_TIMES_BOLD = (
    250, 333, 555, 500, 500, 1000, 833, 278, 333, 333, 500, 570, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333, 570, 570, 570, 500,
    930, 722, 667, 722, 722, 667, 611, 778, 778, 389, 500, 778, 667, 944, 722, 778,
    611, 778, 722, 556, 667, 722, 722, 1000, 722, 722, 667, 333, 278, 333, 581, 500,
    333, 500, 556, 444, 556, 444, 333, 500, 556, 278, 333, 556, 278, 833, 556, 500,
    556, 556, 444, 389, 333, 556, 500, 722, 500, 500, 444, 394, 220, 394, 520,
    350, 500, 350, 333, 500, 500, 1000, 500, 500, 333, 1000, 556, 333, 1000, 350, 667, 350,
    350, 333, 333, 500, 500, 350, 500, 1000, 333, 1000, 389, 333, 722, 350, 444, 722,
    250, 333, 500, 500, 500, 500, 220, 500, 333, 747, 300, 500, 570, 333, 747, 333,
    400, 570, 300, 300, 333, 556, 540, 250, 333, 300, 330, 500, 750, 750, 750, 500,
    722, 722, 722, 722, 722, 722, 1000, 722, 667, 667, 667, 667, 389, 389, 389, 389,
    722, 722, 778, 778, 778, 778, 778, 570, 778, 722, 722, 722, 722, 722, 611, 556,
    500, 500, 500, 500, 500, 500, 722, 444, 444, 444, 444, 444, 278, 278, 278, 278,
    500, 556, 500, 500, 500, 500, 500, 570, 500, 556, 556, 556, 556, 500, 556, 500,
)

_TIMES_ITALIC = (
    250, 333, 420, 500, 500, 833, 778, 214, 333, 333, 500, 675, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333, 675, 675, 675, 500,
    920, 611, 611, 667, 722, 611, 611, 722, 722, 333, 444, 667, 556, 833, 667, 722,
    611, 722, 611, 500, 556, 722, 611, 833, 611, 556, 556, 389, 278, 389, 422, 500,
    333, 500, 500, 444, 500, 444, 278, 500, 500, 278, 278, 444, 278, 722, 500, 500,
    500, 500, 389, 389, 278, 500, 444, 667, 444, 444, 389, 400, 275, 400, 541,
    350, 500, 350, 333, 500, 556, 889, 500, 500, 333, 1000, 500, 333, 944, 350, 556, 350,
    350, 333, 333, 556, 556, 350, 500, 889, 333, 980, 389, 333, 667, 350, 389, 556,
    250, 389, 500, 500, 500, 500, 275, 500, 333, 760, 276, 500, 675, 333, 760, 333,
    400, 675, 300, 300, 333, 500, 523, 250, 333, 300, 310, 500, 750, 750, 750, 500,
    611, 611, 611, 611, 611, 611, 889, 667, 611, 611, 611, 611, 333, 333, 333, 333,
    722, 667, 722, 722, 722, 722, 722, 675, 722, 722, 722, 722, 722, 556, 611, 500,
    500, 500, 500, 500, 500, 500, 667, 444, 444, 444, 444, 444, 278, 278, 278, 278,
    500, 500, 500, 500, 500, 500, 500, 675, 500, 500, 500, 500, 500, 444, 500, 444,
)

_TIMES_BOLD_ITALIC = (
    250, 389, 555, 500, 500, 833, 778, 278, 333, 333, 500, 570, 250, 333, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 333, 333, 570, 570, 570, 500,
    832, 667, 667, 667, 722, 667, 667, 722, 778, 389, 500, 667, 611, 889, 722, 722,
    611, 722, 667, 556, 611, 722, 667, 889, 667, 611, 611, 333, 278, 333, 570, 500,
    333, 500, 500, 444, 500, 444, 333, 500, 556, 278, 278, 500, 278, 778, 556, 500,
    500, 500, 389, 389, 278, 556, 444, 667, 500, 444, 389, 348, 220, 348, 570,
    350, 500, 350, 333, 500, 500, 1000, 500, 500, 333, 1000, 556, 333, 944, 350, 611, 350,
    350, 333, 333, 500, 500, 350, 500, 1000, 333, 1000, 389, 333, 667, 350, 389, 611,
    250, 389, 500, 500, 500, 500, 220, 500, 333, 747, 266, 500, 606, 333, 747, 333,
    400, 570, 300, 300, 333, 576, 500, 250, 333, 300, 300, 500, 750, 750, 750, 500,
    667, 667, 667, 667, 667, 667, 944, 667, 667, 667, 667, 667, 389, 389, 389, 389,
    722, 722, 722, 722, 722, 722, 722, 570, 722, 722, 722, 722, 722, 611, 611, 500,
    500, 500, 500, 500, 500, 500, 722, 444, 444, 444, 444, 444, 278, 278, 278, 278,
    500, 556, 500, 500, 500, 500, 500, 570, 500, 556, 556, 556, 556, 444, 500, 444,
)

# Courier: fixed-pitch, every glyph 600 units (the 0x7F-0x9F bullet
# slots too, since Courier's bullet is also 600).
_COURIER = (600,) * 224

# Symbol / ZapfDingbats use the fonts' built-in encodings; only codes
# 32-126 are defined there (95 entries).
_SYMBOL = (
    250, 333, 713, 500, 549, 833, 778, 439, 333, 333, 500, 549, 250, 549, 250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278, 549, 549, 549, 444,
    549, 722, 667, 722, 612, 611, 763, 603, 722, 333, 631, 722, 686, 889, 722, 722,
    768, 741, 556, 592, 611, 690, 439, 768, 645, 795, 611, 333, 863, 333, 658, 500,
    500, 631, 549, 549, 494, 439, 521, 411, 603, 329, 603, 549, 549, 576, 521, 549,
    549, 521, 549, 603, 439, 576, 713, 686, 493, 686, 494, 480, 200, 480, 549,
)

_DINGBATS = (
    278, 974, 961, 974, 980, 719, 789, 790, 791, 690, 960, 939, 549, 855, 911, 933,
    911, 945, 974, 755, 846, 762, 761, 571, 677, 763, 760, 759, 754, 494, 552, 537,
    577, 692, 786, 788, 788, 790, 793, 794, 816, 823, 789, 841, 823, 833, 816, 831,
    923, 744, 723, 749, 790, 792, 695, 776, 768, 792, 759, 707, 708, 682, 701, 826,
    815, 789, 789, 707, 687, 696, 689, 786, 787, 713, 791, 785, 791, 873, 761, 762,
    762, 759, 759, 892, 892, 788, 784, 438, 138, 277, 415, 392, 392, 668, 668,
)

STANDARD_WIDTHS: dict[str, tuple[int, ...]] = {
    "Helvetica": _HELVETICA,
    "Helvetica-Bold": _HELVETICA_BOLD,
    "Helvetica-Oblique": _HELVETICA,
    "Helvetica-BoldOblique": _HELVETICA_BOLD,
    "Times-Roman": _TIMES_ROMAN,
    "Times-Bold": _TIMES_BOLD,
    "Times-Italic": _TIMES_ITALIC,
    "Times-BoldItalic": _TIMES_BOLD_ITALIC,
    "Courier": _COURIER,
    "Courier-Bold": _COURIER,
    "Courier-Oblique": _COURIER,
    "Courier-BoldOblique": _COURIER,
    "Symbol": _SYMBOL,
    "ZapfDingbats": _DINGBATS,
}

BASE14_NAMES = frozenset(STANDARD_WIDTHS)

# ZapfDingbats glyph name -> width (all 202 AFM glyphs). /Differences
# in Dingbats documents remap charCodes below 32, which the positional
# table (keyed from 32) cannot reach.
DINGBATS_GLYPH_WIDTHS: dict[str, int] = {
    "space": 278,
    "a1": 974, "a2": 961, "a3": 980, "a4": 719, "a5": 789, "a6": 494,
    "a7": 552, "a8": 537, "a9": 577, "a10": 692, "a11": 960, "a12": 939,
    "a13": 549, "a14": 855, "a15": 911, "a16": 933, "a17": 945,
    "a18": 974, "a19": 755, "a20": 846, "a21": 762, "a22": 761,
    "a23": 571, "a24": 677, "a25": 763, "a26": 760, "a27": 759,
    "a28": 754, "a29": 786, "a30": 788, "a31": 788, "a32": 790,
    "a33": 793, "a34": 794, "a35": 816, "a36": 823, "a37": 789,
    "a38": 841, "a39": 823, "a40": 833, "a41": 816, "a42": 831,
    "a43": 923, "a44": 744, "a45": 723, "a46": 749, "a47": 790,
    "a48": 792, "a49": 695, "a50": 776, "a51": 768, "a52": 792,
    "a53": 759, "a54": 707, "a55": 708, "a56": 682, "a57": 701,
    "a58": 826, "a59": 815, "a60": 789, "a61": 789, "a62": 707,
    "a63": 687, "a64": 696, "a65": 689, "a66": 786, "a67": 787,
    "a68": 713, "a69": 791, "a70": 785, "a71": 791, "a72": 873,
    "a73": 761, "a74": 762, "a75": 759, "a76": 892, "a77": 892,
    "a78": 788, "a79": 784, "a81": 438, "a82": 138, "a83": 277,
    "a84": 415, "a85": 509, "a86": 410, "a87": 234, "a88": 234,
    "a89": 390, "a90": 390, "a91": 276, "a92": 276, "a93": 317,
    "a94": 317, "a95": 334, "a96": 334, "a97": 392, "a98": 392,
    "a99": 668, "a100": 668, "a101": 732, "a102": 544, "a103": 544,
    "a104": 910, "a105": 911, "a106": 667, "a107": 760, "a108": 760,
    "a109": 626, "a110": 694, "a111": 595, "a112": 776, "a117": 690,
    "a118": 791, "a119": 790, "a120": 788, "a121": 788, "a122": 788,
    "a123": 788, "a124": 788, "a125": 788, "a126": 788, "a127": 788,
    "a128": 788, "a129": 788, "a130": 788, "a131": 788, "a132": 788,
    "a133": 788, "a134": 788, "a135": 788, "a136": 788, "a137": 788,
    "a138": 788, "a139": 788, "a140": 788, "a141": 788, "a142": 788,
    "a143": 788, "a144": 788, "a145": 788, "a146": 788, "a147": 788,
    "a148": 788, "a149": 788, "a150": 788, "a151": 788, "a152": 788,
    "a153": 788, "a154": 788, "a155": 788, "a156": 788, "a157": 788,
    "a158": 788, "a159": 788, "a160": 894, "a161": 838, "a162": 924,
    "a163": 1016, "a164": 458, "a165": 924, "a166": 918, "a167": 927,
    "a168": 928, "a169": 928, "a170": 834, "a171": 873, "a172": 828,
    "a173": 924, "a174": 917, "a175": 930, "a176": 931, "a177": 463,
    "a178": 883, "a179": 836, "a180": 867, "a181": 696, "a182": 874,
    "a183": 760, "a184": 946, "a185": 865, "a186": 831, "a187": 927,
    "a188": 970, "a189": 918, "a190": 748, "a191": 836, "a192": 748,
    "a193": 836, "a194": 771, "a195": 873, "a196": 748, "a197": 771,
    "a198": 888, "a199": 867, "a200": 696, "a201": 874, "a202": 974,
    "a203": 762, "a204": 759, "a205": 509, "a206": 410,
}

# fi/fl ligature advances (AFM ligature glyphs). Absent from
# WinAnsiEncoding, so the positional tables cannot carry them; a
# base-14 font reaches them via /Differences glyph names.
LIGATURE_WIDTHS: dict[str, dict[str, int]] = {
    "Times-Roman": {"fi": 556, "fl": 556},
    "Times-Bold": {"fi": 556, "fl": 556},
    "Times-Italic": {"fi": 500, "fl": 500},
    "Times-BoldItalic": {"fi": 556, "fl": 556},
    "Helvetica": {"fi": 500, "fl": 500},
    "Helvetica-Bold": {"fi": 556, "fl": 556},
    "Helvetica-Oblique": {"fi": 500, "fl": 500},
    "Helvetica-BoldOblique": {"fi": 556, "fl": 556},
    "Courier": {"fi": 600, "fl": 600},
    "Courier-Bold": {"fi": 600, "fl": 600},
    "Courier-Oblique": {"fi": 600, "fl": 600},
    "Courier-BoldOblique": {"fi": 600, "fl": 600},
}

_BOLD_RE = re.compile(r"bold|black", re.I)
_ITALIC_RE = re.compile(r"italic|oblique", re.I)
_SYMBOL_RE = re.compile(r"^symbol(?:[-,]\w+|[A-Za-z\d]*)$", re.I)


def normalize_base14_name(base_name: str | None) -> str | None:
    """Canonical base-14 name for a /BaseFont value, or None.

    Family detection is containment-based so subset-prefixed and
    foundry-decorated names ("ABCDEF+Helvetica", "ArialMT",
    "TimesNewRomanPS-BoldMT") resolve; Arial maps to Helvetica
    (metric-compatible per the PDF spec's substitution rules)."""
    if not base_name:
        return None
    if base_name in BASE14_NAMES:
        return base_name
    if _SYMBOL_RE.match(base_name):
        return "Symbol"
    if re.search(r"zapfdingbats", base_name, re.I):
        return "ZapfDingbats"
    lower = base_name.lower()
    bold = bool(_BOLD_RE.search(base_name))
    italic = bool(_ITALIC_RE.search(base_name))
    if "courier" in lower:
        return ("Courier-BoldOblique" if bold and italic
                else "Courier-Bold" if bold
                else "Courier-Oblique" if italic else "Courier")
    if "arial" in lower or "helvetica" in lower:
        return ("Helvetica-BoldOblique" if bold and italic
                else "Helvetica-Bold" if bold
                else "Helvetica-Oblique" if italic else "Helvetica")
    if "times" in lower:
        return ("Times-BoldItalic" if bold and italic
                else "Times-Bold" if bold
                else "Times-Italic" if italic else "Times-Roman")
    return None


def apply_standard_widths(base_name: str,
                          widths: dict[int, float]) -> float | None:
    """Populate ``widths`` (charCode -> advance) from the standard
    table for ``base_name``; return the ASCII-range (32-126) average
    as the default width, or None when the name is not base-14."""
    table = STANDARD_WIDTHS.get(base_name)
    if table is None:
        std = normalize_base14_name(base_name)
        if std is not None:
            table = STANDARD_WIDTHS.get(std)
    if table is None:
        return None
    total = 0
    for i, w in enumerate(table):
        if w > 0:
            widths[32 + i] = float(w)
        if i < 95:
            total += w
    return total / 95.0


def dingbats_glyph_width(glyph_name: str) -> int | None:
    return DINGBATS_GLYPH_WIDTHS.get(glyph_name)


def standard_ligature_width(base_name: str,
                            glyph_name: str) -> int | None:
    std = normalize_base14_name(base_name)
    if std is None:
        return None
    return LIGATURE_WIDTHS.get(std, {}).get(glyph_name)
