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


# ---------------------------------- entry-wise index filtering (r3 #4)


def test_subset_keeps_surviving_bookmarks():
    """Bookmarks to kept pages survive a subset with correct targets;
    bookmarks to dropped pages (incl. named-dest ones) disappear."""
    from scribe_js_spark.operators.pdf.outline import parse_outline

    pdf = render_pdf(build_doc_model(4, n_pages=3), rotate=False,
                     outline=True)
    src = [(n["title"], n["page_index"]) for n in parse_outline(pdf)]
    assert src == [("Page 1", 0), ("Page 2", 1), ("Page 3", 2),
                   ("Named", 2)]

    sub = subset_pdf(pdf, [0, 2])
    got = [(n["title"], n["page_index"]) for n in parse_outline(sub)]
    assert got == [("Page 1", 0), ("Page 3", 1), ("Named", 1)]

    sub01 = subset_pdf(pdf, [0, 1])
    got01 = [(n["title"], n["page_index"]) for n in parse_outline(sub01)]
    assert got01 == [("Page 1", 0), ("Page 2", 1)]

    # text path unaffected
    assert extract_document(sub).error is None


def test_outline_promotion_semantics():
    """Dropped node's surviving descendants promote to the nearest
    surviving ancestor (outlineObjects.js:107-133); structural and
    action nodes always survive."""
    from scribe_js_spark.operators.pdf.subset import _filter_outline_nodes

    def node(title, page, children=()):
        return {"title": title, "page": page, "view": [], "action": None,
                "open": True, "children": list(children)}

    tree = [
        node(b"A", 10, [
            node(b"A1", 99, [node(b"A1a", 10), node(b"A1b", 99)]),
            node(b"A2", 11),
        ]),
        node(b"B", None, [node(b"B1", 99)]),   # structural survives
        node(b"C", 99),
    ]
    out = _filter_outline_nodes(tree, kept={10, 11})
    assert [n["title"] for n in out] == [b"A", b"B"]
    # A1 dropped -> A1a promoted beside A2 under A
    assert [n["title"] for n in out[0]["children"]] == [b"A1a", b"A2"]
    assert out[1]["children"] == []


def test_subset_annots_entrywise():
    """A GoTo link to a dropped page is removed; URI links and plain
    annotations on the same page survive (subsetPdf.js:73-80)."""
    from scribe_js_spark.operators.pdf.annots import extract_pdf_annotations
    from scribe_js_spark.operators.pdf.document import PdfDocument

    model = build_doc_model(2, n_pages=3)
    model["pages"][0]["annots"] = [
        {"subtype": "Link", "rect": (10, 10, 60, 30),
         "uri": "https://example.test/stays"},
        {"subtype": "Link", "rect": (10, 40, 60, 60), "goto_page": 2},
        {"subtype": "Link", "rect": (10, 70, 60, 90), "goto_page": 1},
        {"subtype": "Text", "rect": (10, 100, 30, 120),
         "contents": "sticky"},
    ]
    pdf = render_pdf(model, rotate=False)

    def page0_subtypes(data):
        doc = PdfDocument(data)
        page = doc.get_pages()[0]
        return [(a["subtype"], a["uri"]) for a in
                extract_pdf_annotations(doc, page)]

    assert len(page0_subtypes(pdf)) == 4
    sub = subset_pdf(pdf, [0, 1])          # page 2 dropped
    got = page0_subtypes(sub)
    assert ("Link", "https://example.test/stays") in got
    assert ("Text", None) in got
    assert len(got) == 3                   # goto_page=2 link removed
    assert extract_document(sub).error is None
