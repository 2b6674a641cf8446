"""PDF image-XObject inventory (js/pdf/parsePdfImages.js:199,257)."""

import pytest

from scribe_js_spark.fixtures import build_image_models
from scribe_js_spark.operators.pdf.images import (
    codec_ext, extract_images, extract_inline_images)


def test_codec_ext():
    assert codec_ext(["DCTDecode"]) == "jpg"
    assert codec_ext(["FlateDecode", "DCTDecode"]) == "jpg"
    assert codec_ext(["JPXDecode"]) == "jp2"
    assert codec_ext(["FlateDecode"]) == "raw"
    assert codec_ext([]) == "raw"


@pytest.mark.parametrize("doc_id", sorted({*range(0, 24, 3), 2, 4, 7}))
def test_image_inventory_matches_golden(doc_id):
    # docs 2 and 4 pin the YCCK (APP14 transform 2) and
    # /Decode-inverted CMYK DCT variants respectively; doc 7 carries
    # inline (BI/ID/EI) images appended after the XObjects
    m = build_image_models(doc_id)
    got = (extract_images(m["pdf"], with_pixels=True)
           + extract_inline_images(m["pdf"], with_pixels=True))
    assert len(got) == len(m["expected"])
    for n, (g, e) in enumerate(zip(got, m["expected"])):
        flat = {k: v for k, v in g.items() if k != "objnum"}
        flat["image_n"] = n
        assert flat == e, (doc_id, n)
    if doc_id % 3 == 1:
        assert sum(g["inline"] for g in got) == 2


def test_inventory_on_existing_scan_fixture():
    """The OCR-selection family's scan pages embed Flate images the
    doc-wide sweep must also inventory."""
    from scribe_js_spark.fixtures import build_ocrsel_models
    from scribe_js_spark.render_pdf import render_pdf

    m = build_ocrsel_models(0)
    pdf = render_pdf(m["model"], rotate=False, outline=False,
                     form_xobject=False)
    imgs = extract_images(pdf)
    assert imgs, "scan fixture should carry at least one image"
    for rec in imgs:
        assert rec["width"] > 0 and rec["height"] > 0
        assert rec["ext"] == "raw"  # Flate-compressed raster


def test_decode_image_pixels_fax_and_raw():
    """decode_image_pixels: CCITT G4 fax payloads, Flate RGB samples
    and raw bilevel masks decode to pixel arrays; stubbed codecs
    (JPX) surface as errors and extract_images(with_pixels=True)
    turns them into a None mean (never fatal)."""
    from scribe_js_spark.fixtures import build_image_models
    from scribe_js_spark.operators.pdf.images import extract_images

    m = build_image_models(3)
    recs = extract_images(m["pdf"], with_pixels=True)
    _check_fax_and_raw(m, recs)


def _check_fax_and_raw(m, recs):
    by_filter = {}
    for r in recs:
        by_filter.setdefault(r["filter"], []).append(r)
    fax = by_filter["CCITTFaxDecode"][0]
    assert fax["pixels_mean_e6"] is not None
    rgb = by_filter["FlateDecode"][0]
    assert rgb["pixels_mean_e6"] is not None
    assert len(recs) == len(m["expected"])
    for r, want in zip(recs, m["expected"]):
        assert r["pixels_mean_e6"] == want["pixels_mean_e6"], r


def _one_fax_pdf(dict_body: str, data: bytes) -> bytes:
    """Minimal single-image PDF wrapping a CCITT payload."""
    from scribe_js_spark.render_pdf import _Writer

    w = _Writer()
    content = b"q 100 0 0 80 72 600 cm /Im0 Do Q"
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
          b"/MediaBox [0 0 612 792] >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
          b"/Resources << /XObject << /Im0 5 0 R >> >> >>")
    w.add(b"<< /Length %d >>\nstream\n" % len(content)
          + content + b"\nendstream")
    w.add((f"<< {dict_body} /Length {len(data)} >>\nstream\n"
           ).encode() + data + b"\nendstream")
    return w.build()


def _fax_pixels(dict_body: str, data: bytes):
    from scribe_js_spark.operators.pdf.document import PdfDocument
    from scribe_js_spark.operators.pdf.images import decode_image_pixels

    doc = PdfDocument(_one_fax_pdf(dict_body, data))
    obj = doc.get_object(5)
    return decode_image_pixels(doc, obj)


def test_fax_k0_continuous_and_encoded_byte_align():
    """PDF K=0 default is a continuous bitstream; /EncodedByteAlign
    opts into per-row byte alignment (ref decodeCCITT.js:477 reads the
    flag with default false). Width 17 forces rows to end mid-byte so
    the two layouts genuinely differ."""
    from scribe_js_spark.textops.ccitt import encode_mh

    wd, ht = 17, 9
    bits = [[1 if (x * 7 + y * 13) % 256 < 128 else 0
             for x in range(wd)] for y in range(ht)]
    want = (1 - __import__("numpy").array(bits, dtype="uint8")) * 255

    base = (f"/Subtype /Image /Width {wd} /Height {ht} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            f"/Filter /CCITTFaxDecode ")
    packed = encode_mh(bits, wd, byte_align=False)
    px = _fax_pixels(
        base + f"/DecodeParms << /K 0 /Columns {wd} /Rows {ht} >>",
        packed)
    assert (px == want).all()

    aligned = encode_mh(bits, wd, byte_align=True)
    px = _fax_pixels(
        base + f"/DecodeParms << /K 0 /Columns {wd} /Rows {ht} "
               f"/EncodedByteAlign true >>",
        aligned)
    assert (px == want).all()


def test_fax_blackis1_decode_net_inversion():
    """BlackIs1 and /Decode [1 0] each invert; set together they
    cancel. A file setting only one must come out inverted relative to
    the default (the pre-fix code ignored both)."""
    from scribe_js_spark.textops.ccitt import encode_g4

    wd, ht = 16, 8
    bits = [[1 if (x + y) % 3 == 0 else 0 for x in range(wd)]
            for y in range(ht)]
    ink_black = (1 - __import__("numpy").array(
        bits, dtype="uint8")) * 255
    ink_white = 255 - ink_black
    fax = encode_g4(bits, wd)
    base = (f"/Subtype /Image /Width {wd} /Height {ht} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            f"/Filter /CCITTFaxDecode ")
    parms = f"/K -1 /Columns {wd} /Rows {ht}"
    cases = [
        (f"/DecodeParms << {parms} >>", ink_black),
        (f"/DecodeParms << {parms} /BlackIs1 true >>", ink_white),
        (f"/Decode [1 0] /DecodeParms << {parms} >>", ink_white),
        (f"/Decode [1 0] /DecodeParms << {parms} /BlackIs1 true >>",
         ink_black),
    ]
    for dict_body, want in cases:
        px = _fax_pixels(base + dict_body, fax)
        assert (px == want).all(), dict_body


def test_jbig2_generic_region_in_pdf():
    """JBIG2Decode images decode through the MQ path; doc 4
    (doc_id % 3 == 1) stores the page-information segment in a
    separate /JBIG2Globals stream, doc 9 uses MMR, doc 6 arithmetic
    template 0, doc 10 TPGDON, and docs 2/7 (doc_id % 5 == 2) the
    symbol-dictionary + text-region form — all must hit the analytic
    pixel mean."""
    from scribe_js_spark.fixtures import build_image_models
    from scribe_js_spark.operators.pdf.images import extract_images

    for doc_id in (2, 4, 6, 7, 9, 10):
        m = build_image_models(doc_id)
        recs = extract_images(m["pdf"], with_pixels=True)
        jb = [r for r in recs if r["filter"] == "JBIG2Decode"]
        assert len(jb) == 1, doc_id
        want = next(e for e in m["expected"]
                    if e["filter"] == "JBIG2Decode")
        assert jb[0]["pixels_mean_e6"] == want["pixels_mean_e6"], doc_id
        assert jb[0]["pixels_mean_e6"] is not None


def test_jbig2_unsupported_families_surface_as_errors():
    """Huffman+refinement symbol dictionaries raise
    NotImplementedError naming the family — the pipeline turns that
    into an error column, never a crash. (The reference throws on
    these too.)"""
    import struct

    import pytest

    from scribe_js_spark.textops.jbig2 import decode_jbig2

    huffref_dict = struct.pack(">I", 0) + bytes([0x00, 0x00, 0x01]) \
        + struct.pack(">I", 2) + struct.pack(">H", 3)
    with pytest.raises(NotImplementedError,
                       match="huffman refinement"):
        decode_jbig2(huffref_dict)


def test_jbig2_standalone_refinement_region_roundtrip():
    """Standalone generic refinement regions (segment types 40/42/43)
    refine the co-located page area in place — BEYOND the reference,
    whose processSegment default case throws on these types
    (decodeJBIG2.js:1059-1240 has no case for them). Both refinement
    templates, all three segment types."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_refinement_page, decode_jbig2)

    rng = np.random.default_rng(1207)
    base = (rng.random((22, 31)) < 0.35).astype(int).tolist()
    refined = [row[:] for row in base]
    # flip a scattering of pixels so the refinement pass is decisive
    for i, j in ((0, 0), (3, 7), (11, 30), (21, 4), (14, 14), (9, 28)):
        refined[i][j] ^= 1
    for template in (0, 1):
        for seg_type in (40, 42, 43):
            stream = build_jbig2_refinement_page(
                base, refined, template=template, seg_type=seg_type)
            out = decode_jbig2(stream)
            assert out.tolist() == refined, (template, seg_type)
    # decisiveness: without the refinement segment the page is base
    from scribe_js_spark.textops.jbig2 import build_jbig2_embedded
    assert decode_jbig2(build_jbig2_embedded(base)).tolist() == base
    assert refined != base


def test_jbig2_refinement_tpgron_roundtrip():
    """TPGRON typical prediction in refinement regions — the reference
    reads the SLTP bit and then throws 'prediction is not supported'
    (decodeJBIG2.js:497); we decode it. Flipped pixels are restricted
    to positions whose reference 3x3 neighborhood is mixed (typical
    pixels must, by definition, agree with the reference)."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        _ref_typical, build_jbig2_refinement_page, decode_jbig2)

    rng = np.random.default_rng(88)
    base = (rng.random((20, 27)) < 0.4).astype(int).tolist()
    h, w = 20, 27
    refined = [row[:] for row in base]
    flipped = 0
    for i in range(h):
        for j in range(w):
            if _ref_typical(base, h, w, i, j) is None and (i * w + j) % 17 == 0:
                refined[i][j] ^= 1
                flipped += 1
    assert flipped >= 5
    for template in (0, 1):
        stream = build_jbig2_refinement_page(
            base, refined, template=template, tpgron=True)
        assert decode_jbig2(stream).tolist() == refined, template


def test_jbig2_symbol_text_region_roundtrip():
    """Symbol-dictionary + text-region coding (the scanner-encoder
    shape): glyphs decode through the shared-context dictionary and
    place through the strip machinery; docs 2/7/12/17/22 carry this
    form in the pdf_images family (doc_id % 5 == 2)."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_symbol_text, decode_jbig2)

    def glyph(seed, w, h):
        return [[1 if (x * 3 + y * 5 + seed) % 4 < 2 else 0
                 for x in range(w)] for y in range(h)]

    symbols = [glyph(0, 6, 9), glyph(1, 5, 9), glyph(2, 7, 8),
               glyph(3, 4, 11)]
    placements = [(0, 3, 2), (1, 12, 2), (2, 20, 2), (0, 30, 2),
                  (3, 3, 20), (2, 10, 20), (1, 40, 20), (0, 5, 40)]
    data = build_jbig2_symbol_text(symbols, placements, 60, 60)
    page = decode_jbig2(data)
    want = np.zeros((60, 60), np.uint8)
    for i, x, y in placements:
        g = np.array(symbols[i], np.uint8)
        want[y:y + g.shape[0], x:x + g.shape[1]] |= g
    assert page.shape == (60, 60)
    assert (page == want).all()


def test_jbig2_integer_codec_roundtrip():
    """The arithmetic integer coder covers every bucket boundary and
    OOB (T.88 Annex A)."""
    from scribe_js_spark.textops.jbig2 import (
        _IntCtx, decode_int, encode_int)
    from scribe_js_spark.textops.mq import MQDecoder, MQEncoder

    values = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
              100000, -1, -4, -20, -84, -340, -4436, -99999,
              None, 7, None, -2]
    enc = MQEncoder()
    ctx = _IntCtx()
    for v in values:
        encode_int(enc, ctx, v)
    dec = MQDecoder(enc.flush())
    ctx2 = _IntCtx()
    got = [decode_int(dec, ctx2) for _ in values]
    assert got == values


def test_jbig2_text_region_refinement_roundtrip():
    """Per-instance generic refinement inside a text region (IARI +
    RDW/RDH/RDX/RDY + shared GR contexts; decodeRefinement,
    decodeJBIG2.js:461-529): refined instances decode to their own
    bitmap, unrefined ones to the dictionary symbol."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_symbol_text, decode_jbig2)

    def glyph(seed, w, h):
        return [[1 if (x * 3 + y * 5 + seed) % 4 < 2 else 0
                 for x in range(w)] for y in range(h)]

    symbols = [glyph(0, 6, 9), glyph(1, 5, 9)]
    ref0 = [row[:] + [1 if y % 2 else 0]
            for y, row in enumerate(glyph(0, 6, 9))]
    ref0[2][3] ^= 1
    ref0[5][1] ^= 1
    placements = [(0, 3, 2), (1, 14, 2), (0, 25, 2, ref0),
                  (1, 3, 20), (0, 14, 20, ref0), (0, 30, 20)]
    data = build_jbig2_symbol_text(symbols, placements, 50, 40)
    page = decode_jbig2(data)
    want = np.zeros((40, 50), np.uint8)
    for p in placements:
        g = np.array(p[3] if len(p) > 3 and p[3] is not None
                     else symbols[p[0]], np.uint8)
        want[p[2]:p[2] + g.shape[0], p[1]:p[1] + g.shape[1]] |= g
    assert (page == want).all()


def test_jbig2_huffman_symbol_text_roundtrip():
    """The HUFFMAN organization (T.88 Annex B): standard tables
    B.1-B.15, runcode-coded symbol-ID lengths, uncompressed collective
    bitmaps sliced by recorded widths, strip placement via B.6/B.8/
    B.11 — doc 12 (variant (doc_id // 5) % 3 == 2) carries this form
    in the pdf_images family."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_symbol_text_huffman, decode_jbig2)

    def glyph(seed, w, h):
        return [[1 if (x * 3 + y * 5 + seed) % 4 < 2 else 0
                 for x in range(w)] for y in range(h)]

    symbols = [glyph(0, 6, 9), glyph(1, 5, 9), glyph(2, 7, 8),
               glyph(3, 4, 11)]
    placements = [(0, 3, 2), (1, 12, 2), (2, 20, 2), (0, 30, 2),
                  (3, 3, 20), (2, 10, 20), (1, 40, 20), (0, 5, 40)]
    data = build_jbig2_symbol_text_huffman(symbols, placements, 60, 60)
    page = decode_jbig2(data)
    want = np.zeros((60, 60), np.uint8)
    for i, x, y in placements:
        g = np.array(symbols[i], np.uint8)
        want[y:y + g.shape[0], x:x + g.shape[1]] |= g
    assert (page == want).all()


def test_jbig2_standard_table_codec():
    """Annex B standard tables: canonical codes from the spec lengths
    encode/decode every bucket boundary, lower-range tails and OOB."""
    from scribe_js_spark.textops.jbig2_huffman import (
        BitReader, BitWriter, std_table)

    cases = {
        1: [0, 15, 16, 271, 272, 65807, 65808, 100000],
        2: [0, 2, 3, 10, 11, 74, 75, 5000, None],
        3: [-256, -1, -257, -5000, 0, 74, 75, 3000, None],
        6: [-2048, -2049, -9999, -1, 0, 127, 2047, 2048, 99999],
        8: [-15, -3, -2, 0, 1, 645, 1669, 1670, 20000, -16, -999,
            None],
        11: [1, 140, 141, 5000],
        15: [-24, -25, -500, 0, 24, 25, 500],
    }
    for n, values in cases.items():
        t = std_table(n)
        w = BitWriter()
        for v in values:
            t.encode(w, v)
        r = BitReader(w.bytes())
        assert [t.decode(r) for _ in values] == values, n


def test_jbig2_halftone_region_roundtrip():
    """Pattern dictionary + halftone region (T.88 6.6/6.7): gray-coded
    bit planes select density patterns per grid cell; arithmetic and
    MMR pattern dictionaries both decode (doc 17 carries the halftone
    variant in the pdf_images family)."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_halftone, decode_jbig2)

    def density(level):
        return [[1 if (x * 3 + y * 2 + 1) % 4 < level else 0
                 for x in range(6)] for y in range(6)]

    patterns = [density(k) for k in range(4)]
    grid = [[(x + y) % 4 for x in range(7)] for y in range(5)]
    want = np.zeros((30, 42), np.uint8)
    for gy, row in enumerate(grid):
        for gx, v in enumerate(row):
            want[gy * 6:(gy + 1) * 6, gx * 6:(gx + 1) * 6] = \
                np.array(patterns[v])
    for mmr in (False, True):
        page = decode_jbig2(build_jbig2_halftone(
            patterns, grid, mmr_patterns=mmr))
        assert page.shape == (30, 42) and (page == want).all(), mmr


def test_jbig2_refagg_symbol_dictionary_roundtrip():
    """SDREFAGG dictionaries (T.88 6.5.8 single-instance refinement,
    decodeSymbolDictionary :566-578): a second dictionary refines a
    symbol imported from the first, and the text region places the
    combined export set; doc 22 carries this variant."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_refagg, decode_jbig2)

    def glyph(seed, w, h):
        return [[1 if (x * 3 + y * 5 + seed) % 4 < 2 else 0
                 for x in range(w)] for y in range(h)]

    base = [glyph(0, 6, 9), glyph(1, 5, 9)]
    b0r = [row[:] for row in base[0]]
    b0r[3][2] ^= 1
    b0r[7][4] ^= 1
    placements = [(0, 2, 2), (1, 12, 2), (2, 22, 2), (2, 2, 16),
                  (0, 12, 16)]
    page = decode_jbig2(build_jbig2_refagg(
        base, [(0, b0r)], placements, 40, 30))
    combined = base + [b0r]
    want = np.zeros((30, 40), np.uint8)
    for i, x, y in placements:
        g = np.array(combined[i], np.uint8)
        want[y:y + g.shape[0], x:x + g.shape[1]] |= g
    assert (page == want).all()


def test_jbig2_multi_instance_aggregation_roundtrip():
    """IAAI > 1 aggregates (T.88 6.5.8.2): a new dictionary symbol
    composed by a nested text region over the pool, sharing the
    dictionary's context cache like the reference's DecodingContext
    (decodeSymbolDictionary :566-571)."""
    import numpy as np

    from scribe_js_spark.textops.jbig2 import (
        build_jbig2_refagg, decode_jbig2)

    def glyph(seed, w, h):
        return [[1 if (x * 3 + y * 5 + seed) % 4 < 2 else 0
                 for x in range(w)] for y in range(h)]

    base = [glyph(0, 6, 9), glyph(1, 5, 9)]
    agg = [[0] * 13 for _ in range(9)]
    agg_pl = [(0, 0, 0), (1, 8, 0)]
    for i, x, y in agg_pl:
        for yy in range(9):
            for xx in range(len(base[i][0])):
                agg[y + yy][x + xx] |= base[i][yy][xx]
    refined = [(0, [row[:] for row in base[0]]),
               ("agg", agg_pl, agg)]
    refined[0][1][3][2] ^= 1
    placements = [(0, 2, 2), (1, 12, 2), (2, 22, 2), (3, 2, 16),
                  (0, 20, 16)]
    page = decode_jbig2(build_jbig2_refagg(
        base, refined, placements, 40, 30))
    combined = base + [refined[0][1], agg]
    want = np.zeros((30, 40), np.uint8)
    for i, x, y in placements:
        g = np.array(combined[i], np.uint8)
        want[y:y + g.shape[0], x:x + g.shape[1]] |= g
    assert (page == want).all()


def test_jbig2_custom_table_segment():
    """Custom huffman table segments (type 53, T.88 B.2 syntax):
    delta-coded range lines + lower/upper 32-bit tails + optional OOB
    decode and re-encode across every bucket; referred-segment
    resolution returns the index-th table among the referred ids."""
    import struct

    from scribe_js_spark.textops.jbig2_huffman import (
        BitReader, BitWriter, custom_table, decode_tables_segment)

    w = BitWriter()
    for pl, rl in ((2, 2), (2, 2), (2, 2), (3, 2)):
        w.write_bits(pl, 3)
        w.write_bits(rl, 3)
    w.write_bits(4, 3)            # lower-range tail
    w.write_bits(5, 3)            # upper-range tail
    w.write_bits(5, 3)            # OOB (flags bit 0)
    body = bytes([1 | (2 << 1) | (2 << 4)]) \
        + struct.pack(">i", 0) + struct.pack(">i", 16) + w.bytes()
    t = decode_tables_segment(body)
    vals = [0, 3, 4, 9, 12, 15, 16, 100, -1, -50, None, 7]
    w2 = BitWriter()
    for v in vals:
        t.encode(w2, v)
    r = BitReader(w2.bytes())
    assert [t.decode(r) for _ in vals] == vals

    assert custom_table(0, [5, 7], {7: t}) is t
    import pytest

    with pytest.raises(ValueError, match="custom table"):
        custom_table(1, [5, 7], {7: t})
