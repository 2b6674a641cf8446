"""PDF image-XObject inventory (js/pdf/parsePdfImages.js:199,257)."""

import pytest

from scribe_js_spark.fixtures import build_image_models
from scribe_js_spark.operators.pdf.images import codec_ext, extract_images


def test_codec_ext():
    assert codec_ext(["DCTDecode"]) == "jpg"
    assert codec_ext(["FlateDecode", "DCTDecode"]) == "jpg"
    assert codec_ext(["JPXDecode"]) == "jp2"
    assert codec_ext(["FlateDecode"]) == "raw"
    assert codec_ext([]) == "raw"


@pytest.mark.parametrize("doc_id", range(0, 24, 3))
def test_image_inventory_matches_golden(doc_id):
    m = build_image_models(doc_id)
    got = extract_images(m["pdf"], with_pixels=True)
    assert len(got) == len(m["expected"])
    for n, (g, e) in enumerate(zip(got, m["expected"])):
        flat = {k: v for k, v in g.items() if k != "objnum"}
        flat["image_n"] = n
        assert flat == e, (doc_id, n)


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
