"""PDF metadata inspection + scrubbing.

Mirrors the reference's metadata feature (js/pdf/metadata/
metadataInspect.js, scrubMetadata.js, imageMetadata.js): the fixture
family embeds every identifying-metadata category, the inspector must
report each one exactly, and the scrubber must remove them all while
leaving the extracted text byte-identical.
"""

import pytest

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_metadata_models
from scribe_js_spark.operators.pdf.metadata import (
    inspect_jpeg_metadata,
    inspect_jpx_metadata,
    inspect_metadata,
    scrub_metadata,
    _strip_jpeg,
    _strip_jpx,
)


def _flat(rep: dict) -> dict:
    return {
        "title": rep["info"].get("Title"),
        "author": rep["info"].get("Author"),
        "producer": rep["info"].get("Producer"),
        "n_custom_info": len(rep["custom_info_keys"]),
        "has_doc_id": rep["doc_id"] is not None,
        "encrypted": rep["encrypted"],
        "has_xmp": rep["xmp_catalog_bytes"] > 0,
        "n_xmp_objects": rep["xmp_objects"],
        "n_piece_info": rep["piece_info"],
        "ocg_names": ",".join(sorted(rep["ocg_names"])),
        "n_embedded_files": len(rep["embedded_files"]),
        "open_action": rep["open_action"],
        "has_javascript": rep["javascript"],
        "lang": rep["lang"],
        "page_labels": rep["page_labels"],
        "viewer_prefs": rep["viewer_prefs"],
        "n_signatures": len(rep["signatures"]),
        "n_hidden_info": rep["hidden_info"],
        "annot_authors": ",".join(sorted(rep["annotation_authors"])),
        "n_image_meta": len(rep["image_meta"]),
        "prior_revisions": rep["prior_revisions"],
    }


@pytest.mark.parametrize("doc_id", range(24))
def test_inspect_matches_golden(doc_id):
    m = build_metadata_models(doc_id)
    assert _flat(inspect_metadata(m["pdf"])) == m["expected"]


@pytest.mark.parametrize("doc_id", [0, 3, 5, 7, 9, 10, 12, 16, 21])
def test_scrub_removes_all_leaks_and_keeps_text(doc_id):
    m = build_metadata_models(doc_id)
    before = extract_document(m["pdf"])
    assert before.error is None
    clean = scrub_metadata(m["pdf"])
    after = extract_document(clean)
    assert after.error is None
    assert after.text == before.text  # byte-identical content
    rep = inspect_metadata(clean)
    assert rep["info"] == {}
    assert rep["xmp_catalog_bytes"] == 0 and rep["xmp_objects"] == 0
    assert rep["piece_info"] == 0 and rep["hidden_info"] == 0
    assert rep["annotation_authors"] == []
    assert not rep["open_action"] and not rep["javascript"]
    assert rep["image_meta"] == []
    assert rep["prior_revisions"] == 1  # /Prev chain collapsed
    assert not rep["encrypted"]  # encrypted input re-emitted decrypted
    # leaky OCG names rewritten, clean ones kept
    assert all(".psd" not in n and ":" not in n for n in rep["ocg_names"])
    if m["expected"]["ocg_names"]:
        assert "Diagram Layer" in rep["ocg_names"]
        assert any(n.startswith("Layer ") for n in rep["ocg_names"])
    # structural keys survive the scrub
    if m["expected"]["lang"]:
        assert rep["lang"] == m["expected"]["lang"]
    assert rep["page_labels"] == m["expected"]["page_labels"]
    assert rep["viewer_prefs"] == m["expected"]["viewer_prefs"]


def test_jpeg_inspect_and_strip():
    payload = b"Exif\x00\x00II*\x00" + b"\x25\x88" + b"CamSerial 12345"
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    com = b"\xff\xfe\x00\x07hello"
    # keepers: APP0 (JFIF) and a DQT table segment
    app0 = b"\xff\xe0\x00\x07JFIF\x00"
    dqt = b"\xff\xdb\x00\x05\x00\x01\x02"
    scan = b"\xff\xda\x00\x04\x00\x00" + b"\x12\x34" + b"\xff\xd9"
    jpg = b"\xff\xd8" + app0 + app1 + com + dqt + scan
    rep = inspect_jpeg_metadata(jpg)
    assert rep["has_exif"] and rep["gps_present"]
    stripped = _strip_jpeg(jpg)
    assert b"Exif" not in stripped and b"hello" not in stripped
    assert b"JFIF" in stripped and stripped.startswith(b"\xff\xd8")
    assert stripped.endswith(scan)  # scan copied verbatim
    assert not inspect_jpeg_metadata(stripped)["has_exif"]
    # not-a-jpeg passthrough
    assert _strip_jpeg(b"\x00\x01") == b"\x00\x01"


def test_jpx_inspect_and_strip():
    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    jp2 = (box(b"jP  ", b"\r\n\x87\n") + box(b"ftyp", b"jp2 ")
           + box(b"xml ", b"<xmp/>") + box(b"uuid", b"\x00" * 16)
           + box(b"jp2c", b"\xff\x4f\xff\x51"))
    rep = inspect_jpx_metadata(jp2)
    assert rep["has_xml"] and rep["has_uuid"]
    stripped = _strip_jpx(jp2)
    assert b"<xmp/>" not in stripped
    assert b"jp2c" in stripped and b"ftyp" in stripped
    assert not inspect_jpx_metadata(stripped)["has_xml"]
    # raw codestream passthrough
    raw = b"\xff\x4f\xff\x51" + b"\x00" * 8
    assert _strip_jpx(raw) == raw


def test_totality_on_corrupt_bytes():
    """inspect_metadata / extract_images / count_xref_revisions are
    total: corrupt or truncated documents degrade, never raise."""
    import random

    from scribe_js_spark.operators.pdf.images import extract_images
    from scribe_js_spark.operators.pdf.metadata import (
        count_xref_revisions,
    )

    rng = random.Random(7)
    base = build_metadata_models(3)["pdf"]
    for _ in range(60):
        b = bytearray(base)
        for _ in range(rng.randint(1, 12)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        if rng.random() < 0.3:
            b = bytes(b[: rng.randrange(len(b))])
        rep = inspect_metadata(bytes(b))
        assert isinstance(rep, dict)
        assert isinstance(extract_images(bytes(b)), list)
        assert isinstance(count_xref_revisions(bytes(b)), int)
