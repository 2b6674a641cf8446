"""Struct-tag-corroborated layout roles.

Covers the analyzeLayout.js struct-role consumption: TD/TH pin body
before the footnote rules (:2905), LI pins body before the heading
rules (:2970), BlockQuote/Quote promote without the geometric inset
(:2213-2234); OCR-producer and untagged docs fall back to geometry.
"""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_struct_models
from scribe_js_spark.operators.layout_doc import (
    analyze_layout_doc,
    collect_par_roles,
)
from scribe_js_spark.operators.pdf.document import PdfDocument
from scribe_js_spark.operators.pdf.structtree import build_struct_elem_map
from scribe_js_spark.render_pdf import render_pdf


def _roles(doc_id):
    m = build_struct_models(doc_id)
    pdf = render_pdf(m["model"], rotate=False, tj_mode=False,
                     outline=False, form_xobject=False, xref_stream=False)
    res = extract_document(pdf)
    assert res.error is None
    try:
        elem_map = build_struct_elem_map(PdfDocument(pdf))
    except Exception:
        elem_map = None
    st = ({k: v["tag"] for k, v in elem_map.items()}
          if elem_map else None)
    analyze_layout_doc(res.pages, struct_tags=st)
    got = [{"page_n": r["page_n"], "par_n": r["par_n"],
            "par_type": r["par_type"]} for r in collect_par_roles(res.pages)]
    return got, m["roles"]


@pytest.mark.parametrize("doc_id", [0, 1, 3, 4, 7, 19])
def test_struct_roles_end_to_end(doc_id):
    """doc 0/1: tagged (LI pins the big lead par; BlockQuote promotes);
    doc 3/7: OCR producer (map vetoed -> title + body);
    doc 4/19: untagged (geometry only -> title + body)."""
    got, expected = _roles(doc_id)
    assert got == expected


def test_li_pin_beats_title_rule():
    got, _ = _roles(0)  # tagged, trusted producer
    assert got[0]["par_type"] == "body"  # big font, but /LI pins it


def test_geometry_title_without_tags():
    got, _ = _roles(4)  # untagged
    assert got[0]["par_type"] == "title"
    assert all(r["par_type"] != "blockquote" for r in got)
