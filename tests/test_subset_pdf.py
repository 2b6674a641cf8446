"""PDF page subsetting (subsetPdf core)."""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_doc_model
from scribe_js_spark.operators.pdf.subset import subset_pdf
from scribe_js_spark.render_pdf import render_pdf


def test_page_concat_equals_full_document():
    model = build_doc_model(2, n_pages=3)
    pdf = render_pdf(model, rotate=False)
    full = extract_document(pdf)
    assert full.error is None
    parts = [extract_document(subset_pdf(pdf, [i])).text
             for i in range(3)]
    assert "\n".join(parts) == full.text


def test_reorder_and_multi_page():
    model = build_doc_model(5, n_pages=3)
    pdf = render_pdf(model, rotate=False)
    p0 = extract_document(subset_pdf(pdf, [0])).text
    p2 = extract_document(subset_pdf(pdf, [2])).text
    swapped = extract_document(subset_pdf(pdf, [2, 0]))
    assert swapped.error is None
    assert swapped.text == p2 + "\n" + p0


def test_garbage_collection_shrinks_output():
    model = build_doc_model(1, n_pages=3)
    pdf = render_pdf(model, rotate=False)
    assert len(subset_pdf(pdf, [0])) < len(pdf)


@pytest.mark.parametrize("variant", ["xref_stream", "outline", "encrypted"])
def test_layout_variants(variant):
    model = build_doc_model(4, n_pages=3)
    kwargs = {"rotate": False}
    if variant == "xref_stream":
        kwargs["xref_stream"] = True
    elif variant == "outline":
        kwargs["outline"] = True
    else:
        kwargs["encrypt_mode"] = "rc4_128"
    pdf = render_pdf(model, **kwargs)
    res = extract_document(subset_pdf(pdf, [1]))
    assert res.error is None and len(res.text) > 0


def test_out_of_range_raises():
    pdf = render_pdf(build_doc_model(0, n_pages=2), rotate=False)
    with pytest.raises(ValueError):
        subset_pdf(pdf, [2])


def test_merge_pdfs_roundtrip_and_composition():
    """merge: page order preserved across heterogeneous layouts
    (classic / xref-stream / encrypted); composes with subset."""
    from scribe_js_spark.operators.pdf.subset import merge_pdfs

    a = render_pdf(build_doc_model(1, n_pages=2), rotate=False)
    b = render_pdf(build_doc_model(6, n_pages=1), rotate=False,
                   xref_stream=True)
    c = render_pdf(build_doc_model(3, n_pages=2), rotate=False,
                   encrypt_mode="rc4_128")
    texts = [extract_document(x).text for x in (a, b, c)]
    merged = merge_pdfs([a, b, c])
    got = extract_document(merged)
    assert got.error is None
    assert got.text == "\n".join(texts)
    assert extract_document(subset_pdf(merged, [2])).text == texts[1]

    with pytest.raises(ValueError):
        merge_pdfs([])
