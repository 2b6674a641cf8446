"""Property-based coverage for the CCITT codec and table-merge helpers."""

from hypothesis import given, settings
from hypothesis import strategies as st

from scribe_js_spark.textops.ccitt import (
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)


@st.composite
def bilevel_image(draw):
    w = draw(st.integers(min_value=1, max_value=120))
    h = draw(st.integers(min_value=1, max_value=24))
    rows = [
        draw(st.lists(st.integers(min_value=0, max_value=1),
                      min_size=w, max_size=w))
        for _ in range(h)
    ]
    return w, h, rows


@settings(max_examples=60, deadline=None)
@given(bilevel_image())
def test_g4_roundtrip_any_image(img):
    w, h, rows = img
    assert decode_g4(encode_g4(rows, w), w, h) == rows


@settings(max_examples=60, deadline=None)
@given(bilevel_image(), st.booleans())
def test_mh_roundtrip_any_image(img, eols):
    w, h, rows = img
    assert decode_mh(encode_mh(rows, w, eols=eols), w, h,
                     eols=eols) == rows


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=200),
       st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=8))
def test_decoders_never_hang_on_garbage(data, w, h):
    """Arbitrary bytes either decode or raise — never loop forever
    (the forward-progress guards) and never return malformed rows."""
    for fn in (lambda: decode_g4(data, w, h),
               lambda: decode_mh(data, w, h)):
        try:
            rows = fn()
        except Exception:
            continue
        assert len(rows) == h
        assert all(len(r) == w for r in rows)
        assert all(v in (0, 1) for r in rows for v in r)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=0, max_value=1000, allow_nan=False),
    st.floats(min_value=0, max_value=200, allow_nan=False),
    st.floats(min_value=1, max_value=300, allow_nan=False)),
    min_size=0, max_size=30))
def test_merge_collinear_preserves_extent(segs):
    """merge_collinear_segments: output extents cover exactly the
    input pieces (union of parts == union of inputs per position
    group) and parts stay sorted within each merged line."""
    from scribe_js_spark.operators.pdf.tables_pdf import (
        merge_collinear_segments)

    items = [{"y": y, "left": left, "right": left + wd}
             for left, y, wd in segs]
    out = merge_collinear_segments(items, "y", "left", "right")
    assert sum(len(m["segments"]) for m in out) == len(items)
    for m in out:
        parts = m["segments"]
        assert m["left"] == min(p["left"] for p in parts)
        assert m["right"] >= max(p["right"] for p in parts) - 1e-9
        assert parts == sorted(parts, key=lambda p: p["left"])
