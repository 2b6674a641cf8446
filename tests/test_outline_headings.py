"""Outline-anchored heading promotion.

Covers js/pdf/outlineIndex.js (headingShaped gate, heading index build,
named destinations) and the analyzeLayout.js:1783-1787 promotion rule.
"""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_heading_models
from scribe_js_spark.operators.layout_doc import (
    analyze_layout_doc,
    collect_par_roles,
)
from scribe_js_spark.operators.pdf.outline import (
    build_outline_heading_index,
    heading_shaped,
    normalize_heading_text,
)


def test_heading_shaped_gate():
    assert heading_shaped("Chapter One Overview")
    assert heading_shaped("iDrive Setup")  # camelCase brand token
    assert heading_shaped("RESULTS")
    # sentence-shaped / enumerator / fragment rejections
    assert not heading_shaped("This ends like a sentence.")
    assert not heading_shaped("Did it work?")
    assert not heading_shaped("1. introduction paragraph")
    assert not heading_shaped("(a) list item text")
    assert not heading_shaped("lowercase fragment")
    assert not heading_shaped("* depending on model")
    assert not heading_shaped("...")
    assert not heading_shaped("")
    assert not heading_shaped(" ".join(["Word"] * 13))  # > 12 words
    assert not heading_shaped("X" * 81)  # > 80 chars


def test_normalize_heading_text():
    assert normalize_heading_text("  Results:  Summary. ") \
        == "results: summary"
    assert normalize_heading_text("A B") != ""  # no crash on nbsp


@pytest.mark.parametrize("doc_id", [0, 1, 4, 6, 9, 13])
def test_heading_family_end_to_end(doc_id):
    """Heading line split out of its paragraph (page 0), whole-par
    promotion (page 1); OCR-producer docs (doc 4/9) and outline-less
    docs (doc 6/13) stay all-body."""
    m = build_heading_models(doc_id)
    res = extract_document(m["pdf"])
    assert res.error is None
    analyze_layout_doc(
        res.pages,
        outline_headings=build_outline_heading_index(m["pdf"]))
    got = [{"page_n": r["page_n"], "par_n": r["par_n"],
            "par_type": r["par_type"]} for r in collect_par_roles(res.pages)]
    assert got == m["expected"]


def test_index_gates():
    # OCR producer disables the whole index
    m = build_heading_models(4)
    assert build_outline_heading_index(m["pdf"]) is None
    # no outline -> None
    m = build_heading_models(6)
    assert build_outline_heading_index(m["pdf"]) is None
    # normal doc: anchors on both pages, decoys filtered by shape
    m = build_heading_models(0)
    idx = build_outline_heading_index(m["pdf"])
    assert idx is not None
    assert "chapter part0 overview" in idx[0]
    assert "results summary" in idx[1]
    assert "unmatched heading" in idx[0]  # shape-valid, just unmatched
    assert all("sentence" not in a for s in idx.values() for a in s)
