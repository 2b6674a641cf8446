"""Standard-14 AFM width fallback (parsePdfFonts.js:1466-1537 parity):
fonts that omit /Widths take the published Adobe Core 14 metrics, with
MacRoman / /Differences re-keying and fi-fl ligature advances."""

import pytest

from scribe_js_spark.operators.pdf.afm import (
    STANDARD_WIDTHS, apply_standard_widths, dingbats_glyph_width,
    normalize_base14_name, standard_ligature_width)
from scribe_js_spark.operators.pdf.document import PdfDocument
from scribe_js_spark.operators.pdf.fonts import load_font


def test_table_shapes_and_spot_values():
    for name in ("Helvetica", "Helvetica-Bold", "Times-Roman",
                 "Times-Bold", "Times-Italic", "Times-BoldItalic",
                 "Courier"):
        assert len(STANDARD_WIDTHS[name]) == 224, name
    assert len(STANDARD_WIDTHS["Symbol"]) == 95
    assert len(STANDARD_WIDTHS["ZapfDingbats"]) == 95
    helv = STANDARD_WIDTHS["Helvetica"]
    assert helv[ord(" ") - 32] == 278
    assert helv[ord("A") - 32] == 667
    assert helv[ord("i") - 32] == 222
    assert helv[ord("m") - 32] == 833
    assert helv[0xD7 - 32] == 584  # multiply
    assert STANDARD_WIDTHS["Times-Roman"][ord("W") - 32] == 944
    assert set(STANDARD_WIDTHS["Courier"]) == {600}
    # Oblique faces share upright advances
    assert STANDARD_WIDTHS["Helvetica-Oblique"] is helv


@pytest.mark.parametrize("raw,canon", [
    ("Helvetica", "Helvetica"),
    ("ABCDEF+Helvetica", "Helvetica"),
    ("ArialMT", "Helvetica"),
    ("Arial-BoldMT", "Helvetica-Bold"),
    ("Arial,BoldItalic", "Helvetica-BoldOblique"),
    ("TimesNewRomanPSMT", "Times-Roman"),
    ("TimesNewRomanPS-ItalicMT", "Times-Italic"),
    ("Times-Bold", "Times-Bold"),
    ("CourierNewPS-BoldObliqueMT", "Courier-BoldOblique"),
    ("Symbol", "Symbol"),
    ("SymbolMT", "Symbol"),
    ("ZapfDingbats", "ZapfDingbats"),
    ("Garamond", None),
    ("", None),
])
def test_normalize_base14_name(raw, canon):
    assert normalize_base14_name(raw) == canon


def test_apply_standard_widths_average():
    widths = {}
    avg = apply_standard_widths("Helvetica", widths)
    table = STANDARD_WIDTHS["Helvetica"]
    assert avg == pytest.approx(sum(table[:95]) / 95.0)
    assert widths[32] == 278.0 and widths[255] == 500.0
    assert len(widths) == 224
    assert apply_standard_widths("NotAFont", {}) is None


def test_ligature_and_dingbats_lookups():
    assert standard_ligature_width("Helvetica", "fi") == 500
    assert standard_ligature_width("Helvetica-Bold", "fl") == 556
    assert standard_ligature_width("Times-Italic", "fi") == 500
    assert standard_ligature_width("Garamond", "fi") is None
    assert dingbats_glyph_width("a10") == 692
    assert dingbats_glyph_width("a206") == 410
    assert dingbats_glyph_width("nosuch") is None


def _doc_with_font(font_body: bytes) -> PdfDocument:
    """Assemble a one-object PDF document wrapper around a font dict."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        font_body,
    ]
    out = [b"%PDF-1.4\n"]
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(sum(len(p) for p in out))
        out.append(f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_at = sum(len(p) for p in out)
    xref = [b"xref\n", f"0 {len(objs) + 1}\n".encode(),
            b"0000000000 65535 f \n"]
    xref += [f"{o:010d} 00000 n \n".encode() for o in offsets]
    out += xref
    out.append(
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode())
    return PdfDocument(b"".join(out))


def test_load_font_no_widths_uses_standard_metrics():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>")
    f = load_font(doc, doc.get_object(3))
    assert f.width_for(ord("i")) == 222.0
    assert f.width_for(ord("m")) == 833.0
    table = STANDARD_WIDTHS["Helvetica"]
    assert f.default_width == pytest.approx(sum(table[:95]) / 95.0)


def test_load_font_macroman_rekeys_high_codes():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
        b"/Encoding /MacRomanEncoding >>")
    f = load_font(doc, doc.get_object(3))
    # MacRoman 0x8A = adieresis (444 in Times, WinAnsi slot 0xE4).
    assert f.width_for(0x8A) == 444.0
    # MacRoman 0xE4 = perthousand (1000 in Times, WinAnsi slot 0x89).
    assert f.width_for(0xE4) == 1000.0
    # MacRoman 0xD5 = quoteright (333 in Times, WinAnsi slot 0x92).
    assert f.width_for(0xD5) == 333.0


def test_load_font_differences_rekey_and_ligature():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 142 /fi 200 /emdash ] >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.width_for(142) == 500.0      # AFM fi ligature
    assert f.width_for(200) == 1000.0     # emdash (WinAnsi 0x97)


def test_load_font_dingbats_differences_below_32():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ZapfDingbats "
        b"/Encoding << /Type /Encoding "
        b"/Differences [ 1 /a10 2 /a206 ] >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.width_for(1) == 692.0
    assert f.width_for(2) == 410.0
    assert f.width_for(33) == 974.0       # positional a1


def test_load_font_with_widths_keeps_explicit_values():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/FirstChar 65 /LastChar 66 /Widths [ 700 710 ] >>")
    f = load_font(doc, doc.get_object(3))
    assert f.width_for(65) == 700.0
    assert f.width_for(66) == 710.0
    assert f.default_width == pytest.approx(705.0)


def test_missing_width_and_descriptor_style_flags():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/FirstChar 65 /LastChar 66 /Widths [ 700 710 ] "
        b"/FontDescriptor << /Type /FontDescriptor /Flags 32 "
        b"/FontWeight 700 /ItalicAngle -12 /MissingWidth 480 >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.default_width == 480.0        # /MissingWidth beats the avg
    assert f.width_for(90) == 480.0
    assert f.bold and f.italic             # FontWeight>=700, |angle|<45


def test_missing_width_defaults_to_zero_with_descriptor():
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/FirstChar 65 /LastChar 65 /Widths [ 700 ] "
        b"/FontDescriptor << /Type /FontDescriptor /Flags 32 >> >>")
    f = load_font(doc, doc.get_object(3))
    assert f.default_width == 0.0          # PDF spec default


def test_cid_font_without_tounicode_falls_back_to_codepoints():
    """A Type0/Identity-H font with no ToUnicode and no embedded
    program must emit CIDs as codepoints (parsePdfDoc.js:1885
    String.fromCharCode fallback), not drop the text."""
    from scribe_js_spark.extract import extract_document

    text = "Hello"
    hexstr = "".join(f"{ord(c):04X}" for c in text)
    content = f"BT /F1 24 Tf 1 0 0 1 72 700 Tm <{hexstr}> Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /NoMap "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /NoMap "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 500 >>",
    ]
    out = [b"%PDF-1.4\n"]
    offs = []
    for i, body in enumerate(objs):
        offs.append(sum(map(len, out)))
        out.append(b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n")
    xa = sum(map(len, out))
    out.append(b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
               + b"".join(b"%010d 00000 n \n" % o for o in offs))
    out.append(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n"
               b"%d\n%%%%EOF\n" % (len(objs) + 1, xa))
    res = extract_document(b"".join(out))
    assert res.error is None, res.error
    assert res.text == text


def _pdf_with_objs(objs: list[bytes]) -> bytes:
    out = [b"%PDF-1.4\n"]
    offs = []
    for i, body in enumerate(objs):
        offs.append(sum(map(len, out)))
        out.append(b"%d 0 obj\n" % (i + 1) + body + b"\nendobj\n")
    xa = sum(map(len, out))
    out.append(b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
               + b"".join(b"%010d 00000 n \n" % o for o in offs))
    out.append(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n"
               b"%d\n%%%%EOF\n" % (len(objs) + 1, xa))
    return b"".join(out)


def test_case_flipped_tounicode_prefers_encoding_case():
    """>=2 consistent single-letter case flips in ToUnicode mark a
    broken OCR map; the WinAnsi encoding's case wins per code
    (parsePdfFonts.js:2247-2265). Non-conflicting entries (the 'x'
    ligature-ish mapping) keep their ToUnicode value."""
    from scribe_js_spark.extract import extract_document

    # charCodes: 'H'(72)->'h', 'W'(87)->'w' flips; 'x'(120)->'y' is a
    # genuine remap (different letters) and must survive.
    cmap = (b"/CIDInit /ProcSet findresource begin 12 dict begin "
            b"begincmap 1 begincodespacerange <00> <FF> "
            b"endcodespacerange 3 beginbfchar "
            b"<48> <0068> <57> <0077> <78> <0079> "
            b"endbfchar endcmap end end")
    content = b"BT /F1 24 Tf 1 0 0 1 72 700 Tm (HW x) Tj ET"
    pdf = _pdf_with_objs([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
        + b"\nendstream",
    ])
    res = extract_document(pdf)
    assert res.error is None, res.error
    assert res.text == "HW y"


def test_single_case_conflict_keeps_tounicode():
    """One conflict (or inconsistent directions) is not enough — the
    ToUnicode value stands."""
    from scribe_js_spark.extract import extract_document

    cmap = (b"begincmap 1 begincodespacerange <00> <FF> "
            b"endcodespacerange 1 beginbfchar <48> <0068> "
            b"endbfchar endcmap")
    content = b"BT /F1 24 Tf 1 0 0 1 72 700 Tm (H) Tj ET"
    pdf = _pdf_with_objs([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
        + b"\nendstream",
    ])
    res = extract_document(pdf)
    assert res.error is None, res.error
    assert res.text == "h"


def test_packed_width_values_clamped():
    """32-bit packed /Widths entries (0x00020002 = 131074) clamp to
    the sane-entry average; the poisoned array average driving
    default_width is repaired too (parsePdfFonts.js:2291-2305)."""
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/FirstChar 65 /LastChar 67 /Widths [ 131074 600 -50 ] >>")
    f = load_font(doc, doc.get_object(3))
    assert f.width_for(65) == 600.0
    assert f.width_for(66) == 600.0
    assert f.width_for(67) == 600.0
    assert f.default_width == 600.0


def _type0_pdf(enc_entry: bytes, show_bytes: bytes,
               cid_extra: bytes = b" /DW 1000",
               extra_objs: list[bytes] | None = None) -> bytes:
    content = (b"BT /F1 24 Tf 1 0 0 1 72 700 Tm <"
               + show_bytes.hex().encode() + b"> Tj ET")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /CJK "
        + enc_entry + b" /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /CJK "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 2 >>" + cid_extra + b" >>",
    ] + (extra_objs or [])
    return _pdf_with_objs(objs)


def test_predefined_rksj_cmap_decodes_shift_jis():
    """90ms-RKSJ-H: 2-byte Shift-JIS codes mixed with 1-byte ASCII —
    the codespace split keeps the ASCII, the charset decode yields
    the kana/kanji (parsePdfFonts.js:906-936)."""
    from scribe_js_spark.extract import extract_document

    text = "日本語"
    payload = text.encode("cp932") + b" ab"
    res = extract_document(_type0_pdf(b"/Encoding /90ms-RKSJ-H", payload))
    assert res.error is None, res.error
    # CJK chars become per-char words (parsePdfDoc.js:2671) and
    # writeText joins words with single spaces (writeText.js:81)
    assert res.text == " ".join(text) + " ab"


def test_predefined_gbk_cmap_decodes():
    from scribe_js_spark.extract import extract_document

    text = "中文测试"
    res = extract_document(
        _type0_pdf(b"/Encoding /GBK-EUC-H", text.encode("gbk")))
    assert res.error is None, res.error
    assert res.text == " ".join(text)  # per-char CJK words


def test_eten_b5_ascii_cid_widths():
    """ETen-B5-H: Big5 text decodes; 1-byte ASCII keys /W through the
    Adobe-CNS1 half-width block (space = CID 13648)."""
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.extract import extract_document

    text = "廣東話"
    pdf = _type0_pdf(b"/Encoding /ETen-B5-H",
                     text.encode("big5") + b" x",
                     cid_extra=b" /DW 1000 /W [13648 13648 500]")
    res = extract_document(pdf)
    assert res.error is None, res.error
    assert res.text == " ".join(text) + " x"
    from scribe_js_spark.operators.pdf.fonts import load_font
    doc = PdfDocument(pdf)
    f = load_font(doc, doc.get_object(5))
    assert f.width_for(0x20) == 500.0   # via code_to_cid 0x20 -> 13648
    assert f.cjk_codec == "big5hkscs"


def test_embedded_encoding_cmap_codespace_and_cids():
    """An embedded encoding CMap stream: 1-byte codespace + cidrange
    remap; /W is keyed by the mapped CID, and 1-byte code 32 takes
    word spacing."""
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.fonts import load_font

    cmap = (b"%!PS-Adobe-3.0 Resource-CMap\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"1 begincidrange <41> <43> 100 endcidrange\n"
            b"endcmap")
    extra = [b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
             + b"\nendstream"]
    pdf = _type0_pdf(b"/Encoding 7 0 R", b"ABC",
                     cid_extra=b" /DW 1000 /W [100 [750 760 770]]",
                     extra_objs=extra)
    doc = PdfDocument(pdf)
    f = load_font(doc, doc.get_object(5))
    assert f.codespace_ranges == [(1, 0x00, 0xFF)]
    assert f.code_to_cid == {0x41: 100, 0x42: 101, 0x43: 102}
    assert f.width_for(0x41) == 750.0
    assert f.width_for(0x43) == 770.0


def test_ucs2_cmap_ascii_cid_map():
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.fonts import load_font
    from scribe_js_spark.extract import extract_document

    text = "Hi 한국"
    pdf = _type0_pdf(b"/Encoding /UniKS-UCS2-H",
                     "".join(f"{ord(c):04X}" for c in text)
                     .encode().fromhex("".join(
                         f"{ord(c):04X}" for c in text)) if False else
                     b"".join(ord(c).to_bytes(2, "big") for c in text))
    res = extract_document(pdf)
    assert res.error is None, res.error
    assert res.text == text
    doc = PdfDocument(pdf)
    f = load_font(doc, doc.get_object(5))
    assert f.code_to_cid[0x41] == 0x41 - 0x1F
    assert f.cjk_codec is None


def test_cid_gidmap_recovery_via_truetype_cmap():
    """Adobe-Identity CIDFontType2 whose codes are GIDs (not
    codepoints), no ToUnicode: only the embedded TrueType cmap's
    GID->Unicode reverse map recovers the text
    (parsePdfFonts.js:76 buildGidToUnicodeFromTrueType + :1835-1851).
    The naive codepoint fallback would emit control garbage here."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.render_fonts import build_truetype_blank

    text = "Word"
    gid_of = {c: i + 2 for i, c in enumerate(sorted(set(text)))}
    tt = build_truetype_blank(
        max(gid_of.values()) + 1, set(),
        cmap={ord(c): g for c, g in gid_of.items()})
    hexstr = "".join(f"{gid_of[c]:04X}" for c in text)
    content = f"BT /F1 24 Tf 1 0 0 1 72 700 Tm <{hexstr}> Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /GidMap "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GidMap "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /FontDescriptor 7 0 R /DW 1000 "
        + b"/W [2 %d 500] >>" % max(gid_of.values()),
        b"<< /Type /FontDescriptor /FontName /GidMap /Flags 32 "
        b"/FontFile2 8 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(tt) + tt + b"\nendstream",
    ]
    res = extract_document(_pdf_with_objs(objs))
    assert res.error is None, res.error
    assert res.text == text


def test_cid_mac_glyph_order_fallback_without_font_file():
    """Non-embedded Adobe-Identity CIDFontType2: CID == GID and most
    TrueType fonts keep the Mac standard glyph order for low gids, so
    CID -> standardNames[CID] -> AGL (parsePdfFonts.js:1859-1869).
    'H' is Mac-order index 43, 'i' is 76."""
    from scribe_js_spark.extract import extract_document

    content = b"BT /F1 24 Tf 1 0 0 1 72 700 Tm <002B004C> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /MacOrd "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /MacOrd "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 1000 /W [43 [500] 76 [500]] >>",
    ]
    res = extract_document(_pdf_with_objs(objs))
    assert res.error is None, res.error
    assert res.text == "Hi"


def test_cid_gidmap_render_pdf_roundtrip():
    """render_pdf(cid_gidmap=True) end-to-end: the whole fixture
    corpus shape (TJ arrays, multi-page, 500-em grid) extracts
    byte-identically through the cmap recovery path."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.fixtures import build_doc_model, expected_text
    from scribe_js_spark.render_pdf import render_pdf

    for doc_id in (6, 23):
        model = build_doc_model(doc_id)
        pdf = render_pdf(model, cid_gidmap=True)
        assert b"/ToUnicode" not in pdf
        res = extract_document(pdf)
        assert res.error is None, res.error
        assert res.text == expected_text(model), f"doc {doc_id}"


def test_type0_noncid_cff_charset_names_fill_tounicode():
    """A Type0 font whose FontFile3 is a NON-CID CFF with an explicit
    charset: glyph names resolve through AGL to fill ToUnicode
    (parsePdfFonts.js:1747-1760) — here with no /ToUnicode at all,
    including a custom-SID uniXXXX name."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.operators.pdf.fontprog import (
        _CFF_STD_STRINGS_96)
    from scribe_js_spark.render_fonts import build_cff_simple

    # gids 1..3 = 'H', 'i', euro (custom SID via uni20AC)
    sids = [_CFF_STD_STRINGS_96.index("H"),
            _CFF_STD_STRINGS_96.index("i"), 391]
    cff = build_cff_simple(sids, custom_strings=[b"uni20AC"])
    content = b"BT /F1 24 Tf 1 0 0 1 72 700 Tm <000100020003> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SimpleCFF "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /SimpleCFF "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /FontDescriptor 7 0 R /DW 1000 "
        b"/W [1 3 500] >>",
        b"<< /Type /FontDescriptor /FontName /SimpleCFF /Flags 32 "
        b"/FontFile3 8 0 R >>",
        b"<< /Length %d /Subtype /Type1C >>\nstream\n" % len(cff)
        + cff + b"\nendstream",
    ]
    res = extract_document(_pdf_with_objs(objs))
    assert res.error is None, res.error
    assert res.text == "Hi€"


def test_predefined_cjk_halfwidth_latin_width_fill():
    """Predefined CJK CMaps standardize half-width Latin in the ROS;
    /W omits them, so absent the 500-em fill they'd take /DW 1000
    (parsePdfFonts.js:1733-1740)."""
    from scribe_js_spark.operators.pdf.fonts import PdfFont, \
        _apply_predefined_cjk_cmap

    f = PdfFont()
    f.cid = True
    f.default_width = 1000.0
    f.widths[65] = 480.0        # producer-specified survives
    _apply_predefined_cjk_cmap(f, "90ms-RKSJ-H")
    assert f.widths[65] == 480.0
    assert f.widths[0x20] == 500.0 and f.widths[0x7E] == 500.0
    assert 0x7F not in f.widths


def test_cid_gidmap_via_sibling_basefont_fontfile2():
    """CIDFontType2 with NO embedded program, but a sibling page font
    with the same subset-stripped /BaseFont carries the FontFile2
    (parsePdfFonts.js:1812-1836): the sibling's cmap supplies the
    GID->Unicode map."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.render_fonts import build_truetype_blank

    text = "Ok"
    gid_of = {c: i + 5 for i, c in enumerate(sorted(set(text)))}
    tt = build_truetype_blank(
        max(gid_of.values()) + 1, set(),
        cmap={ord(c): g for c, g in gid_of.items()})
    hexstr = "".join(f"{gid_of[c]:04X}" for c in text)
    content = f"BT /F1 24 Tf 1 0 0 1 72 700 Tm <{hexstr}> Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R /F2 7 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        # F1: subset-tagged, no FontFile anywhere
        b"<< /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Shared "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>",
        b"<< /Type /Font /Subtype /CIDFontType2 "
        b"/BaseFont /ABCDEF+Shared "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 1000 /W [5 %d 500] >>"
        % max(gid_of.values()),
        # F2: same BaseFont (different subset tag), embeds the program
        b"<< /Type /Font /Subtype /TrueType /BaseFont /GHIJKL+Shared "
        b"/FirstChar 32 /LastChar 32 /Widths [500] "
        b"/FontDescriptor 8 0 R >>",
        b"<< /Type /FontDescriptor /FontName /GHIJKL+Shared /Flags 32 "
        b"/FontFile2 9 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(tt) + tt + b"\nendstream",
    ]
    res = extract_document(_pdf_with_objs(objs))
    assert res.error is None, res.error
    assert res.text == text


def test_type1_pfa_builtin_encoding():
    """An embedded Type1 with no /BaseEncoding: the PFA header's
    cleartext `dup N /name put` encoding is the implicit base
    (parsePdfFonts.js:1136-1146) — here code 65 is remapped to
    /germandbls, which plain WinAnsi would read as 'A'."""
    from scribe_js_spark.extract import extract_document

    pfa = (b"%!PS-AdobeFont-1.0: Synth 001\n"
           b"/Encoding 256 array\n"
           b"0 1 255 {1 index exch /.notdef put} for\n"
           b"dup 65 /germandbls put\n"
           b"dup 66 /B put\n"
           b"readonly def\n"
           b"currentfile eexec\n" + b"\x00" * 32)
    content = b"BT /F1 24 Tf 1 0 0 1 72 700 Tm (AB) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /SynthT1 "
        b"/FirstChar 65 /LastChar 66 /Widths [500 500] "
        b"/FontDescriptor 6 0 R >>",
        b"<< /Type /FontDescriptor /FontName /SynthT1 /Flags 32 "
        b"/FontFile 7 0 R >>",
        b"<< /Length %d /Length1 %d /Length2 32 /Length3 0 >>"
        b"\nstream\n" % (len(pfa), len(pfa) - 32) + pfa
        + b"\nendstream",
    ]
    res = extract_document(_pdf_with_objs(objs))
    assert res.error is None, res.error
    assert res.text == "ßB"


def test_tounicode_identity_name_with_encoding_cmap():
    """/ToUnicode /Identity-H written as a NAME (not a stream):
    charCodes are Unicode directly; the embedded encoding CMap's
    charCode->CID pairs materialize the map
    (parsePdfFonts.js:861-871, 1760-1766)."""
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.fonts import load_font

    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 begincidchar <0041> 7 <0042> 9 endcidchar\n"
            b"endcmap end end\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /IdName "
        b"/Encoding 5 0 R /DescendantFonts [4 0 R] "
        b"/ToUnicode /Identity-H >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /IdName "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 500 >>",
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
        + b"\nendstream",
    ]
    doc = PdfDocument(_pdf_with_objs(objs))
    f = load_font(doc, doc.get_object(3))
    assert f.to_unicode.get(0x41) == "A"
    assert f.to_unicode.get(0x42) == "B"
    assert f.width_for(0x41) == 500.0  # code -> CID 7 -> DW


def test_basefont_hex_string_and_missing_firstchar():
    """/BaseFont may be a UTF-16BE hex string and /FirstChar may be
    omitted with /Widths + /LastChar present — the array anchors at
    LastChar - len + 1 (parsePdfFonts.js:809-840, 1451-1456)."""
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 "
        b"/BaseFont <FEFF0041007200690061006C002D0042006F006C0064> "
        b"/LastChar 66 /Widths [ 700 710 ] >>")
    f = load_font(doc, doc.get_object(3))
    assert f.base_name == "Arial-Bold"
    assert f.bold
    assert f.width_for(65) == 700.0 and f.width_for(66) == 710.0


def test_tex_cm_ot1_ligatures():
    """TeX Computer Modern text faces (CMR10 etc.) use OT1: codes
    11-15 are ff/fi/fl/ffi/ffl; CMSY/CMEX must not get the mapping
    (parsePdfFonts.js:2114-2131)."""
    doc = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /CMR10 "
        b"/FirstChar 11 /LastChar 12 /Widths [ 583 556 ] >>")
    f = load_font(doc, doc.get_object(3))
    assert f.unicode_for(11) == "ﬀ" and f.unicode_for(12) == "ﬁ"
    doc2 = _doc_with_font(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /CMSY10 "
        b"/FirstChar 11 /LastChar 12 /Widths [ 583 556 ] >>")
    f2 = load_font(doc2, doc2.get_object(3))
    assert f2.to_unicode.get(11) is None


def test_type3_charproc_metrics():
    """Type3 metrics come from the CharProcs (parseType3Font,
    parsePdfFonts.js:2179-2222): d0 advances scale through a
    non-0.001 FontMatrix, provably-blank glyphs read as spaces,
    drawn-but-unmapped glyphs get PUA placeholders, out-of-encoding
    codes advance nothing, and a sane FontBBox sets the line box."""
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.fonts import load_font

    drawn = b"50 0 d0 1 1 3 4 re f"
    blank = b"50 0 d0"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        b"<< /Type /Font /Subtype /Type3 /FontBBox [0 -20 60 80] "
        b"/FontMatrix [0.01 0 0 0.01 0 0] "
        b"/CharProcs << /gD 4 0 R /gB 5 0 R >> "
        b"/Encoding << /Type /Encoding /Differences [65 /gD /gB] >> "
        b"/FirstChar 65 /LastChar 66 /Widths [480 480] >>",
        b"<< /Length %d >>\nstream\n" % len(drawn) + drawn
        + b"\nendstream",
        b"<< /Length %d >>\nstream\n" % len(blank) + blank
        + b"\nendstream",
    ]
    doc = PdfDocument(_pdf_with_objs(objs))
    f = load_font(doc, doc.get_object(3))
    # d0 wx=50 em-units * 0.01 * 1000 = 500, overriding raw 480
    assert f.width_for(65) == 500.0
    # blank CharProc -> space; drawn unmapped -> PUA
    assert f.to_unicode[66] == " "
    assert f.to_unicode[65] == chr(0xE000 + 65)
    # out-of-encoding advance is 0
    assert f.width_for(90) == 0.0
    # FontBBox [0 -20 60 80] * fm3 0.01 -> ascent .8, descent -.2
    assert abs(f.ascent - 0.8) < 1e-9 and abs(f.descent + 0.2) < 1e-9


def test_dominant_offset_tounicode_repair():
    """>=80% of a Type0 font's single-char ToUnicode entries sharing
    one non-zero shift mark the identity-mapped leftovers as failed
    glyph-name lookups; they take the dominant offset too
    (parsePdfFonts.js:2411-2449)."""
    from scribe_js_spark.operators.pdf.fonts import (
        PdfFont, _repair_dominant_offset_tounicode)

    f = PdfFont()
    f.cid = True
    for cc in range(0x20, 0x2D):          # 13 entries shifted +0x1D00
        f.to_unicode[cc] = chr(cc + 0x1D00)
    f.to_unicode[0x2D] = chr(0x2D)        # broken identity leftover
    _repair_dominant_offset_tounicode(f)
    assert f.to_unicode[0x2D] == chr(0x2D + 0x1D00)
    # all-identity maps are left alone (offset 0 dominates)
    g = PdfFont()
    g.cid = True
    for cc in range(0x41, 0x50):
        g.to_unicode[cc] = chr(cc)
    _repair_dominant_offset_tounicode(g)
    assert g.to_unicode[0x41] == "A"


def test_family_tounicode_inheritance_type0():
    """A Type0 style variant without ToUnicode inherits from the
    same-family sibling when codespaces match and /W widths agree on
    >= 64 shared CIDs (parsePdfFonts.js:2452-2527). Ordering Japan1
    keeps the Identity-recovery ladder out of the way."""
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.fonts import load_font

    pairs = "\n".join(f"<{c:04X}> <{c + 0x30A0:04X}>"
                      for c in range(1, 81))
    tounicode = (
        "/CIDInit /ProcSet findresource begin\nbegincmap\n"
        "1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        f"80 beginbfchar\n{pairs}\nendbfchar\nendcmap end"
    ).encode()
    desc = (b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /%s "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
            b"/Supplement 2 >> /DW 1000 /W [1 80 500] >>")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        # target: Bold variant, no ToUnicode
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Mincho-Bold "
        b"/Encoding /Identity-H /DescendantFonts [5 0 R] >>",
        # donor: Regular variant with ToUnicode
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Mincho-Regular "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
        b"/ToUnicode 7 0 R >>",
        desc % b"Mincho-Bold",
        desc % b"Mincho-Regular",
        b"<< /Length %d >>\nstream\n" % len(tounicode) + tounicode
        + b"\nendstream",
    ]
    doc = PdfDocument(_pdf_with_objs(objs))
    fonts = {"F1": doc.get_object(3), "F2": doc.get_object(4)}
    f = load_font(doc, doc.get_object(3), sibling_fonts=fonts)
    assert f.to_unicode.get(1) == chr(1 + 0x30A0)
    assert f.to_unicode.get(80) == chr(80 + 0x30A0)


def test_simple_type1c_custom_encoding_fill():
    """A simple Type1C with a custom CFF Encoding and neither
    /Differences nor /ToUnicode: code -> gid -> charset name -> AGL
    fills the map (parsePdfFonts.js:2133-2177). Code 0xA1 here is the
    euro glyph via a custom SID."""
    from scribe_js_spark.extract import extract_document
    from scribe_js_spark.operators.pdf.fontprog import (
        _CFF_STD_STRINGS_96)
    from scribe_js_spark.render_fonts import build_cff_simple

    sids = [_CFF_STD_STRINGS_96.index("H"),
            _CFF_STD_STRINGS_96.index("i"), 391]
    cff = build_cff_simple(
        sids, custom_strings=[b"uni20AC"],
        encoding={1: 0x30, 2: 0x31, 3: 0xA1})  # gid -> charCode
    content = b"BT /F1 24 Tf 1 0 0 1 72 700 Tm <3031A1> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /ReEnc "
        b"/FirstChar 48 /LastChar 161 /Widths [%s] "
        b"/FontDescriptor 6 0 R >>"
        % b" ".join(b"500" for _ in range(48, 162)),
        b"<< /Type /FontDescriptor /FontName /ReEnc /Flags 4 "
        b"/FontFile3 7 0 R >>",
        b"<< /Length %d /Subtype /Type1C >>\nstream\n" % len(cff)
        + cff + b"\nendstream",
    ]
    res = extract_document(_pdf_with_objs(objs))
    assert res.error is None, res.error
    assert res.text == "Hi€"


def test_family_inheritance_rejects_incompatible_widths():
    """Two Type0 fonts sharing a family but with disagreeing /W must
    NOT inherit (parsePdfFonts.js:2475-2484: >= 98% width equality
    over >= 64 shared CIDs) — different-CID assignments would produce
    garbage text."""
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.fonts import load_font

    pairs = "\n".join(f"<{c:04X}> <{c + 0x30A0:04X}>"
                      for c in range(1, 81))
    tounicode = (
        "/CIDInit /ProcSet findresource begin\nbegincmap\n"
        "1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        f"80 beginbfchar\n{pairs}\nendbfchar\nendcmap end").encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Gothic-Bold "
        b"/Encoding /Identity-H /DescendantFonts [5 0 R] >>",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Gothic-Light "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
        b"/ToUnicode 7 0 R >>",
        # target widths 500; donor widths 720 -> ratio 0 < 0.98
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Gothic-Bold "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 2 >> /DW 1000 /W [1 80 500] >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /Gothic-Light "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 2 >> /DW 1000 /W [1 80 720] >>",
        b"<< /Length %d >>\nstream\n" % len(tounicode) + tounicode
        + b"\nendstream",
    ]
    doc = PdfDocument(_pdf_with_objs(objs))
    fonts = {"F1": doc.get_object(3), "F2": doc.get_object(4)}
    f = load_font(doc, doc.get_object(3), sibling_fonts=fonts)
    assert not f.to_unicode  # no inheritance

    # Same-style-key fallback: widths overlap >= 95% both ways but
    # differ in VALUE -> the primary gate fails, the style-key path
    # accepts a single same-key donor (parsePdfFonts.js:2490-2522).
    objs2 = list(objs)
    objs2[2] = (b"<< /Type /Font /Subtype /Type0 "
                b"/BaseFont /AAAAAA+Gothic-Light "
                b"/Encoding /Identity-H /DescendantFonts [5 0 R] >>")
    doc2 = PdfDocument(_pdf_with_objs(objs2))
    fonts2 = {"F1": doc2.get_object(3), "F2": doc2.get_object(4)}
    f2 = load_font(doc2, doc2.get_object(3), sibling_fonts=fonts2)
    assert f2.to_unicode.get(1) == chr(1 + 0x30A0)
