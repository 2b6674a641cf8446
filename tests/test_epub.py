"""EPUB (OCF container) conversion."""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_epub_models


def test_epub_byte_identity():
    for doc_id in range(6):
        m = build_epub_models(doc_id)
        res = extract_document(m["epub"])
        assert res.error is None
        assert res.fmt == "epub"
        assert res.text == m["expected"]
        assert len(res.pages) == m["n_chapters"]


def test_epub_subdir_href_resolution():
    m = build_epub_models(1)  # odd: chapters under OEBPS/
    res = extract_document(m["epub"])
    assert res.error is None and res.text == m["expected"]


def test_epub_never_fatal_on_corruption():
    m = build_epub_models(2)
    data = m["epub"]
    # truncation, header corruption, missing container
    assert extract_document(data[: len(data) // 2]).error is not None
    broken = bytearray(data)
    broken[30:60] = b"\x00" * 30
    res = extract_document(bytes(broken))
    assert res.error is not None or isinstance(res.text, str)


def test_docx_still_detected_before_epub():
    """DOCX is also a zip; the sniff order must keep routing it."""
    from scribe_js_spark.fixtures import build_doc_model
    from scribe_js_spark.render_docx import render_docx

    data = render_docx(build_doc_model(3))
    res = extract_document(data)
    assert res.error is None and res.fmt == "docx"
