"""Inline image (BI/ID/EI) skipping in the content tokenizer
(contentStream.js:264-330 parity): binary payloads can contain the
bytes "EI", so the end is found by computed raw length (unfiltered)
or a whitespace-bounded scan (filtered)."""

from scribe_js_spark.operators.pdf.content import ContentTokenizer


def _ops(stream: bytes):
    return [op for _ops_, op in ContentTokenizer(stream)]


def test_unfiltered_embedded_ei_skipped_by_computed_length():
    # 4x2 gray 8bpc => exactly 8 data bytes, which contain "EI" twice
    data8 = b"xEIyzEIq"
    s = (b"BT (before) Tj ET "
         b"BI /W 4 /H 2 /BPC 8 /CS /G ID " + data8 + b"\nEI\n"
         b"BT (after) Tj ET")
    assert _ops(s) == [b"BT", b"Tj", b"ET", b"BT", b"Tj", b"ET"]


def test_rgb_and_imagemask_lengths():
    rgb = bytes(range(2 * 1 * 3))  # 2x1 RGB
    s = b"BI /W 2 /H 1 /BPC 8 /CS /RGB ID " + rgb + b"\nEI\nq Q"
    assert _ops(s) == [b"q", b"Q"]
    mask = b"\xa5"                 # 7x1 1-bpc mask => 1 byte
    s2 = b"BI /W 7 /H 1 /BPC 1 /IM true ID " + mask + b"\nEI\nW n"
    assert _ops(s2) == [b"W", b"n"]


def test_filtered_image_uses_whitespace_bounded_scan():
    # /F present: length not computable; embedded 'EI' without a
    # whitespace boundary must not terminate the scan
    s = (b"BI /W 2 /H 2 /F /AHx ID 4142EI43 \nEI q "
         b"BT (tail) Tj ET")
    got = _ops(s)
    assert got[0] == b"q" and b"Tj" in got


def test_truncated_inline_image_consumes_to_end():
    assert _ops(b"BI /W 9 /H 9 ID \x00\x01\x02") == []
    assert _ops(b"BI /W 9 /H 9 /F /Fl ID ") == []
    assert _ops(b"BI /W 2") == []  # no ID at all


def test_indexed_colorspace_falls_back_to_scan():
    # unknown /CS: computed length unavailable -> scan finds the
    # whitespace-bounded EI
    s = b"BI /W 2 /H 2 /BPC 8 /CS /I ID \x01\x02\x03\x04 \nEI\nS"
    assert _ops(s) == [b"S"]
