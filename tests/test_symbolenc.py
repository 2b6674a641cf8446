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
