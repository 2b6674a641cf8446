"""Symbol / Wingdings built-in encodings and artifact repair
(parsePdfFonts.js:1050-1099, 1422-1438; standardEncodings charts)."""

from scribe_js_spark.operators.pdf.document import PdfDocument
from scribe_js_spark.operators.pdf.fonts import load_font
from tests.test_afm_metrics import _doc_with_font


def test_symbol_font_without_tounicode_maps_greek():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol "
        b"/FontDescriptor << /Flags 4 >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(ord("a")) == "α"   # alpha
    assert f.unicode_for(ord("W")) == "Ω"   # Omega
    assert f.unicode_for(0xB9) == "≠"       # not equal
    # widths come from the Symbol AFM table
    assert f.width_for(ord("a")) == 631.0


def test_symbol_broken_tounicode_replaced():
    """A ToUnicode that claims 'A' for code 65 is the Latin-passthrough
    artifact; the whole chart takes over."""
    cmap = (b"begincmap 1 begincodespacerange <00> <FF> "
            b"endcodespacerange 2 beginbfchar <41> <0041> <61> <0061> "
            b"endbfchar endcmap")
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol "
        b"/FontDescriptor << /Flags 4 >> /ToUnicode 4 0 R >>")
    # append the cmap object manually: rebuild with the stream present
    from tests.test_afm_metrics import _pdf_with_objs
    pdf = _pdf_with_objs([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol "
        b"/FontDescriptor << /Flags 4 >> /ToUnicode 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
        + b"\nendstream",
    ])
    doc = PdfDocument(pdf)
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(65) == "Α"  # Alpha, not 'A'
    assert f.unicode_for(97) == "α"


def test_symbol_pua_tounicode_decoded():
    """Microsoft symbol-cmap PUA codepoints (0xF000 + position) decode
    through the chart; a valid ToUnicode otherwise survives."""
    cmap = (b"begincmap 1 begincodespacerange <00> <FF> "
            b"endcodespacerange 2 beginbfchar <01> <F061> <02> <2200> "
            b"endbfchar endcmap")
    from tests.test_afm_metrics import _pdf_with_objs
    pdf = _pdf_with_objs([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol "
        b"/FontDescriptor << /Flags 4 >> /ToUnicode 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
        + b"\nendstream",
    ])
    doc = PdfDocument(pdf)
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(1) == "α"   # F061 -> position 0x61 alpha
    assert f.unicode_for(2) == "∀"   # untouched real mapping


def test_wingdings_fills_and_repairs():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+Wingdings "
        b"/FontDescriptor << /Flags 4 >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(0xFC) == "✓"  # check mark
    assert f.unicode_for(74) == "☺"    # smiling face


def test_nonsymbolic_named_encoding_wins_over_symbol_name():
    """A font merely NAMED Symbol* with a nonsymbolic WinAnsi encoding
    keeps Latin text (the Quartz re-encode shape)."""
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /SymbolLike "
        b"/Encoding /WinAnsiEncoding "
        b"/FontDescriptor << /Flags 32 >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(ord("a")) == "a"


def test_dingbats_builtin_encoding_and_differences():
    """ZapfDingbats without a named base encoding takes the built-in
    chart (PDF 32000-1 D.5); /Differences aN names resolve to their
    AGLFN zapfdingbats codepoints."""
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ZapfDingbats "
        b"/Encoding << /Type /Encoding /Differences [ 1 /a10 ] >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(33) == "✁"   # a1, upper blade scissors
    assert f.unicode_for(52) == "✔"   # a20, heavy check mark
    assert f.unicode_for(172) == "①"  # a120, circled digit one
    assert f.unicode_for(254) == "➾"  # a191
    assert f.unicode_for(1) == "✡"    # Differences a10
    assert f.unicode_for(32) == " "


def test_dingbats_chart_consistency():
    """Every encoded glyph number has a codepoint, and the positional
    AFM width order (afm._DINGBATS, codes 32-126) agrees with the
    encoding order's glyph widths by name."""
    from scribe_js_spark.operators.pdf.afm import (
        STANDARD_WIDTHS, DINGBATS_GLYPH_WIDTHS)
    from scribe_js_spark.operators.pdf.symbolenc import (
        DINGBATS_ENCODING, DINGBATS_GLYPH_UNICODE)

    for code, n in DINGBATS_ENCODING.items():
        if n:
            assert n in DINGBATS_GLYPH_UNICODE, (code, n)
    tbl = STANDARD_WIDTHS["ZapfDingbats"]
    for code in range(33, 127):
        n = DINGBATS_ENCODING[code]
        assert tbl[code - 32] == DINGBATS_GLYPH_WIDTHS[f"a{n}"], code
