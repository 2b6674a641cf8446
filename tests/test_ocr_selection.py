"""OCR-page-selection gate tests (ocrPageSelection.js semantics)."""

from scribe_js_spark.fixtures import build_ocrsel_models
from scribe_js_spark.operators.pdf.ocr_selection import (
    compute_requires_ocr,
    is_empty,
    merge_placements,
    select_ocr_pages,
)
from scribe_js_spark.operators.pdf.parse import (
    pdf_document_type,
    pdf_page_stats,
)
from scribe_js_spark.render_pdf import render_pdf


def _stats(doc_id=0):
    m = build_ocrsel_models(doc_id)
    data = render_pdf(m["model"], rotate=False, tj_mode=False,
                      ligatures=False, cid_font=False)
    return pdf_page_stats(data), pdf_document_type(data), m


def test_masks_match_expected():
    stats, ptype, m = _stats(3)
    assert ptype == "text"
    sh = select_ocr_pages(stats, ptype, "autoShallow")
    dp = select_ocr_pages(stats, ptype, "autoDeep")
    exp_sh = [e[1] for e in m["expected"]]
    exp_dp = [e[2] for e in m["expected"]]
    assert sh == exp_sh
    assert dp == exp_dp


def test_scope_overrides_and_doc_gates():
    stats, _, _ = _stats()
    assert select_ocr_pages(stats, "text", "all") == [True] * 7
    assert select_ocr_pages(stats, "text", "none") == [False] * 7
    # non-text documents OCR wholesale
    assert select_ocr_pages(stats, "image", "autoShallow") == [True] * 7
    # 'ocr' docs with a trusted layer fall through to per-page gates:
    # the bare scan (page 1) still OCRs, the layered scan (page 2)
    # does not
    assert select_ocr_pages(
        stats, "ocr", "autoShallow",
        use_pdf_text_ocr_main=True) == [False, True, False, False, False,
                                False, False]
    assert select_ocr_pages(
        stats, "ocr", "autoShallow",
        use_pdf_text_ocr_main=False) == [True] * 7


def test_requires_ocr_and_empty():
    stats, _, _ = _stats()
    assert compute_requires_ocr(stats)   # scan pages present
    assert not is_empty(stats[0])        # text page
    assert not is_empty(stats[1])        # full-page image is not empty


def test_existing_ocr_layer_respects_trust_flag():
    stats, ptype, _ = _stats()
    trusted = select_ocr_pages(stats, ptype, "autoShallow",
                               use_pdf_text_ocr_main=True)
    # page 2 (scan + invisible layer) is skipped when the layer is
    # trusted; page 1 (bare scan) still OCRs
    assert trusted[1] is True
    assert trusted[2] is False


def test_merge_placements_reassembles_strips():
    strips = [(100, 700 - i * 10, 500, 710 - i * 10) for i in range(20)]
    merged = merge_placements(strips)
    assert len(merged) == 1
    left, bottom, right, top = merged[0]
    assert (left, right) == (100, 500)
    assert top - bottom == 200


def test_type3_filler_discount():
    """The filler font (/F6: one outline stamped across 4 PUA-mapped
    charCodes + 3 clean glyphs) must NOT classify broken; the same font
    WITHOUT glyph hashes (no discount possible) must classify broken —
    parsePdfDoc.js:513-550."""
    from scribe_js_spark.operators.pdf.ocr_selection import (
        broken_to_unicode_font,
    )
    from scribe_js_spark.operators.pdf.fonts import PdfFont

    f = PdfFont()
    f.type3 = True
    f.to_unicode = {97: "", 98: "", 99: "",
                    100: "", 101: "e", 102: "f", 103: "g"}
    f.type3_glyph_hash = {97: "H", 98: "H", 99: "H", 100: "H",
                          101: "A", 102: "B", 103: "C"}
    assert broken_to_unicode_font(f) is False

    g = PdfFont()
    g.type3 = True
    g.to_unicode = dict(f.to_unicode)
    g.type3_glyph_hash = None  # no CharProcs parsed -> no discount
    assert broken_to_unicode_font(g) is True
