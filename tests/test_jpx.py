"""JPEG 2000 codec roundtrips (textops/jpx + jpx_encode).

Parity target: the reference's ``js/pdf/codecs/decodeJPX.js`` —
JP2 boxes, all five progression orders, tiles and tile-parts,
custom precincts with SOP/EPH, layers, the coding-style variants
(segmentation symbol, vertically-causal contexts, per-pass
termination, context reset), reversible 5/3 and irreversible 9/7,
RCT/ICT, palettes with the PDF /Indexed override, partial decode
via reduce_levels, and corrupt-stream recovery.  The encoder is
fixture machinery; every assertion is against pixels the test
computed itself.
"""

import numpy as np
import pytest

from scribe_js_spark.textops.jpx import JpxError, decode_jpx
from scribe_js_spark.textops.jpx_encode import encode_jpx, wrap_jp2


def _gray(h, w, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w), dtype=np.uint8)


def _rt(px, decode_kw=None, **kw):
    out = decode_jpx(encode_jpx(px, **kw), **(decode_kw or {}))
    return np.asarray(out["pixel_data"]).reshape(
        out["height"], -1), out


def test_reversible_gray_roundtrip_shapes():
    # (33, 29) at levels=2 is the shape that exposed the MQ-flush
    # SETBITS bug (trailing codeword bits must read back as ones).
    for h, w, lv in [(21, 17, 2), (33, 29, 2), (32, 32, 1),
                     (33, 29, 3), (8, 8, 0), (64, 48, 4)]:
        px = _gray(h, w)
        got, _ = _rt(px, levels=lv)
        assert np.array_equal(got, px), (h, w, lv)


def test_reversible_random_sweep():
    for seed in range(25):
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got, _ = _rt(px, levels=int(rng.integers(0, 4)))
        assert np.array_equal(got, px), seed


def test_rgb_rct_and_untransformed():
    px = np.random.default_rng(3).integers(
        0, 256, (19, 23, 3), dtype=np.uint8)
    for mct in (True, False):
        got, out = _rt(px, mct=mct)
        assert out["components"] == 3
        assert np.array_equal(got.reshape(px.shape), px), mct


def test_irreversible_97_close():
    px = _gray(33, 29)
    for mct, shape in ((None, (33, 29)), (True, (17, 19, 3))):
        p = np.random.default_rng(5).integers(
            0, 256, shape, dtype=np.uint8)
        got, _ = _rt(p, reversible=False, mct=mct)
        err = np.abs(got.reshape(p.shape).astype(int) - p.astype(int))
        assert err.max() <= 3, err.max()


def test_tiles_and_tile_parts():
    px = _gray(40, 40)
    got, _ = _rt(px, tile_size=(16, 16))
    assert np.array_equal(got, px)
    got, _ = _rt(px, tile_size=(16, 16), tile_parts=2,
                 vertically_causal=True, segmentation=True,
                 reset_probabilities=True)
    assert np.array_equal(got, px)


def test_all_progression_orders():
    px = _gray(33, 29)
    for prog in range(5):
        got, _ = _rt(px, progression=prog)
        assert np.array_equal(got, px), prog


def test_precincts_sop_eph():
    px = _gray(33, 29)
    for prog in range(5):
        got, _ = _rt(px, progression=prog,
                     precincts=[(5, 5), (5, 5), (5, 5)],
                     sop=True, eph=True)
        assert np.array_equal(got, px), prog


def test_layers_need_per_pass_termination():
    px = _gray(16, 16)
    with pytest.raises(ValueError, match="per-pass termination"):
        encode_jpx(px, layers=2)
    for layers in (2, 3):
        got, _ = _rt(px, layers=layers, per_pass_termination=True)
        assert np.array_equal(got, px), layers


def test_sub8_and_above8_precision_normalize_to_8bit():
    # decodeJPX.js:1685-1814 normalizes every component to 8 bits.
    idx = _gray(12, 14) >> 4
    got, out = _rt(idx.astype(np.uint8), precision=4)
    assert out["precision"] == [4]
    assert np.array_equal(got, idx << 4)
    px12 = np.random.default_rng(9).integers(0, 4096, (16, 16))
    got, _ = _rt(px12, precision=12)
    assert np.array_equal(got, (px12 >> 4).astype(np.uint8))


def test_reduce_levels_partial_decode():
    px = _gray(33, 29)
    cs = encode_jpx(px, levels=2)
    out = decode_jpx(cs, reduce_levels=1)
    assert (out["width"], out["height"]) == (15, 17)
    out = decode_jpx(cs, reduce_levels=2)
    assert (out["width"], out["height"]) == (8, 9)


def test_jp2_container_and_palette():
    px = _gray(21, 17)
    cs = encode_jpx(px)
    out = decode_jpx(wrap_jp2(cs, width=17, height=21, ncomp=1))
    assert np.array_equal(
        np.asarray(out["pixel_data"]).reshape(21, 17), px)

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0],
                    [0, 0, 255]], dtype=np.uint8)
    idx = (np.random.default_rng(4).integers(0, 4, (10, 10))
           .astype(np.uint8))
    jp2 = wrap_jp2(encode_jpx(idx, precision=2), width=10, height=10,
                   ncomp=1, precision=2, palette=pal)
    out = decode_jpx(jp2)
    assert out["components"] == 3
    got = np.asarray(out["pixel_data"]).reshape(10, 10, 3)
    assert np.array_equal(got, pal[idx])
    # The PDF /Indexed override consumes raw index samples
    # (decodeJPX.js:18-30): the pclr palette must not be applied.
    out = decode_jpx(jp2, apply_internal_palette=False)
    assert out["components"] == 1
    raw = np.asarray(out["pixel_data"]).reshape(10, 10)
    assert np.array_equal(raw >> 6, idx)  # 2-bit indices scaled to 8


def test_truncated_stream_recovers_partial():
    px = _gray(33, 29)
    cs = encode_jpx(px)
    out = decode_jpx(cs[:len(cs) // 2])
    assert (out["width"], out["height"]) == (29, 33)


def test_garbage_raises_jpx_error():
    with pytest.raises((JpxError, Exception)):
        decode_jpx(b"\x00\x01\x02\x03" * 8)


def test_jpx_never_hangs_on_mutations():
    """Bit-flip/truncate fuzz: decode returns or raises, never hangs
    or allocates unboundedly (same contract as the JBIG2 fuzz)."""
    rng = np.random.default_rng(11)
    base = encode_jpx(_gray(20, 18), levels=1)
    jbase = wrap_jp2(base, width=18, height=20, ncomp=1)
    for src in (base, jbase):
        for _ in range(60):
            buf = bytearray(src)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = int(
                    rng.integers(0, 256))
            trunc = int(rng.integers(4, len(buf)))
            for payload in (bytes(buf), bytes(buf[:trunc])):
                try:
                    decode_jpx(payload)
                except Exception:
                    pass


def test_jpx_decodes_inside_pdf():
    """JPXDecode image XObjects decode through decode_image_pixels;
    the /Indexed colourspace path keeps raw indices."""
    from scribe_js_spark.fixtures import build_image_models
    from scribe_js_spark.operators.pdf.images import extract_images

    for doc_id in (0, 3, 6, 9, 12):
        m = build_image_models(doc_id)
        recs = extract_images(m["pdf"], with_pixels=True)
        jp = [r for r in recs if "JPXDecode" in r["filter"]]
        assert len(jp) == 1, doc_id
        want = next(e for e in m["expected"]
                    if e["filter"] == "JPXDecode")
        assert jp[0]["pixels_mean_e6"] == want["pixels_mean_e6"], doc_id
        assert jp[0]["pixels_mean_e6"] is not None, doc_id
