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
    got = extract_images(m["pdf"])
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
