"""Font-program parsing: CFF summary, validCIDs skip semantics, and
the TrueType blank-glyph-to-space remap."""

import sys

sys.path.insert(0, ".")

from scribe_js_spark.fixtures import (  # noqa: E402
    CFF_DROP_CODES,
    CFF_UNMAPPED_CODES,
    build_doc_model,
    expected_text,
    strip_model_chars,
)
from scribe_js_spark.extract import extract_document  # noqa: E402
from scribe_js_spark.operators.pdf.fontprog import (  # noqa: E402
    parse_cff_summary,
    truetype_empty_glyphs,
)
from scribe_js_spark.render_fonts import (  # noqa: E402
    build_cff_cid,
    build_truetype_blank,
)
from scribe_js_spark.render_pdf import render_pdf  # noqa: E402


def test_cff_summary_roundtrip():
    cids = [32, 65, 66, 97, 98, 122, 500, 41000]
    s = parse_cff_summary(build_cff_cid(cids))
    assert s["ok"] and s["is_cid"]
    assert s["n_glyphs"] == len(cids) + 1
    assert sorted(s["cid_to_gid"]) == sorted(cids)
    # gid 0 is .notdef; charset gids start at 1
    assert set(s["cid_to_gid"].values()) == set(range(1, len(cids) + 1))


def test_cff_summary_tolerant_on_garbage():
    assert parse_cff_summary(b"") == {
        "ok": False, "is_cid": False, "n_glyphs": 0,
        "cid_to_gid": None, "predefined_charset": False,
        "charset_names": None, "encoding_map": None}
    assert not parse_cff_summary(b"\xff\x10garbage")["ok"]
    whole = build_cff_cid([32, 65])
    for cut in (3, 10, 25, len(whole) - 2):
        assert parse_cff_summary(whole[:cut])["ok"] is False


def test_truetype_empty_glyphs():
    tt = build_truetype_blank(12, {0, 3, 11})
    assert truetype_empty_glyphs(tt) == {0, 3, 11}
    assert truetype_empty_glyphs(b"not a font") is None
    assert truetype_empty_glyphs(tt[:40]) is None


def test_cffsub_extraction_drops_undefined_cids():
    """Byte identity on the malformed-subset family: chars whose CID
    the embedded CFF charset omits disappear with no advance; in-charset
    unmapped chars come through via the chr(code) fallback."""
    for doc_id in range(6):
        model = build_doc_model(doc_id, seed=42)
        pdf = render_pdf(model, cff_subset={
            "drop": CFF_DROP_CODES, "unmapped": CFF_UNMAPPED_CODES})
        exp = expected_text(strip_model_chars(model, CFF_DROP_CODES))
        r = extract_document(pdf)
        assert r.error is None
        assert r.text == exp
        # the family must actually exercise the drop path
        assert exp != expected_text(model)


def test_cffsub_without_fontfile_keeps_all_chars():
    """Same content stream, no embedded program: no validCIDs, so no
    chars are dropped (ToUnicode still covers the mapped set; unmapped
    CID codes fall to the no-emission path only when un-inferable)."""
    model = build_doc_model(1, seed=42)
    pdf_plain = render_pdf(model, cid_font=True)
    r = extract_document(pdf_plain)
    assert r.error is None
    assert r.text == expected_text(model)


def test_blank_glyph_remap_to_space():
    from scribe_js_spark.operators.pdf.fonts import (
        PdfFont,
        _remap_blank_glyphs,
    )

    f = PdfFont()
    f.cid = True
    # CID 5: control-char mapping, positive width, blank glyph -> space.
    # CID 6: control-char mapping but a real outline -> untouched.
    # CID 7: control-char mapping, blank, but zero width -> untouched.
    f.to_unicode = {5: "\x02", 6: "\x03", 7: "\x04", 8: "A"}
    f.widths = {5: 500.0, 6: 500.0, 7: 0.0, 8: 500.0}
    tt = build_truetype_blank(10, {5, 7})
    _remap_blank_glyphs(tt, f)
    assert f.to_unicode[5] == " "
    assert f.to_unicode[6] == "\x03"
    assert f.to_unicode[7] == "\x04"
    assert f.to_unicode[8] == "A"
