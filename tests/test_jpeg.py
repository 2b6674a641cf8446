"""From-scratch baseline JPEG codec tests."""

import numpy as np
import pytest

from scribe_js_spark.textops.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _block_image(bw, bh):
    bx, by = np.meshgrid(np.arange(bw), np.arange(bh))
    blocks = ((bx * 31 + by * 17) % 256).astype(np.uint8)
    return np.kron(blocks, np.ones((8, 8), dtype=np.uint8))


def test_blockwise_constant_roundtrip_lossless():
    px = _block_image(5, 4)
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(px)), px)


def test_mcu_trim_non_multiple_dims():
    px = _block_image(4, 3)[:19, :29]
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert dec.shape == (19, 29)
    assert np.array_equal(dec, px)


def test_gradient_roundtrip_within_quantization_error():
    g = np.clip(np.add.outer(np.arange(40) * 3, np.arange(56) * 2),
                0, 255).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(g))
    # AC quant step is 16 -> reconstruction stays within a few levels
    assert int(np.abs(dec.astype(int) - g.astype(int)).max()) <= 8


def test_random_noise_exercises_zrl_and_high_categories():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(24, 24), dtype=np.uint8).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert dec.shape == px.shape  # decodes cleanly; lossy by design


def test_lossless_arithmetic_rejected_honestly():
    # sequential (SOF9) AND progressive (SOF10) arithmetic decode for
    # real now (tests/test_jpeg_arith.py); the lossless/hierarchical
    # modes stay honest rejections
    px = _block_image(2, 2)
    data = bytearray(encode_jpeg_gray(px))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xCB  # flip SOF0 -> SOF11 (arithmetic lossless)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(bytes(data))


def test_truncated_stream_raises_value_error():
    px = _block_image(3, 3)
    data = encode_jpeg_gray(px)
    with pytest.raises((ValueError, Exception)):
        decode_jpeg_gray(data[: len(data) // 3])


def test_decode_media_surfaces_jpeg_and_errors(spark):
    from scribe_js_spark.textops.multimodal import decode_media

    px = _block_image(3, 2)
    good = encode_jpeg_gray(px)
    bad = bytearray(good)
    i = bytes(bad).find(b"\xff\xc0")
    bad[i + 1] = 0xCB  # lossless-arithmetic SOF: honest rejection
    corrupt = bytearray(good)
    corrupt[i + 1] = 0xC2  # progressive SOF over a baseline scan header
    df = spark.createDataFrame(
        [(1, good), (2, bytes(bad)), (3, bytes(corrupt))],
        ["media_id", "data"])
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[1]["kind"] == "jpeg"
    assert rows[1]["width"] == 24 and rows[1]["height"] == 16
    assert rows[1]["error"] is None
    assert abs(rows[1]["mean_byte"] - float(px.mean())) < 1e-9
    assert rows[2]["error"].startswith("not_implemented")
    assert rows[3]["error"].startswith("decode_failure")


# ----------------------------------------------------- color (YCbCr)

def _mb_luma(h, w):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((xs // 16) * 31 + (ys // 16) * 17) % 160 + 40).astype(np.uint8)


def _expected_rgb(y, cb, cr):
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64)
    crf = cr.astype(np.float64)
    r = np.clip(np.round(yf + 1.402 * (crf - 128.0)), 0, 255)
    g = np.clip(np.round(yf - 0.344136 * (cbf - 128.0)
                         - 0.714136 * (crf - 128.0)), 0, 255)
    b = np.clip(np.round(yf + 1.772 * (cbf - 128.0)), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("sampling", [(2, 2), (2, 1), (1, 1)])
def test_color_constant_chroma_lossless(sampling):
    from scribe_js_spark.textops.jpeg import decode_jpeg, encode_jpeg_ycbcr

    h, w = 32, 48
    y = _mb_luma(h, w)
    cb = np.full((h, w), 120, np.uint8)
    cr = np.full((h, w), 140, np.uint8)
    rgb = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, sampling=sampling))
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb, _expected_rgb(y, cb, cr))


def test_color_444_blockwise_chroma_and_restart_markers():
    from scribe_js_spark.textops.jpeg import decode_jpeg, encode_jpeg_ycbcr

    h, w = 32, 48
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    y = _mb_luma(h, w)
    cb = (((xs // 8) * 13) % 64 + 96).astype(np.uint8)
    cr = (((ys // 8) * 7) % 64 + 96).astype(np.uint8)
    data = encode_jpeg_ycbcr(y, cb, cr, sampling=(1, 1), restart_interval=3)
    assert b"\xff\xdd" in data      # DRI present
    assert b"\xff\xd0" in data      # at least one RST marker
    assert np.array_equal(decode_jpeg(data), _expected_rgb(y, cb, cr))


def test_color_420_odd_dims_mcu_trim():
    from scribe_js_spark.textops.jpeg import decode_jpeg, encode_jpeg_ycbcr

    h, w = 17, 23
    y = _mb_luma(h, w)
    cb = np.full((h, w), 112, np.uint8)
    cr = np.full((h, w), 144, np.uint8)
    rgb = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, sampling=(2, 2),
                                        restart_interval=1))
    assert rgb.shape == (h, w, 3)
    assert np.array_equal(rgb, _expected_rgb(y, cb, cr))


def test_color_gradient_roundtrip_within_quantization_error():
    from scribe_js_spark.textops.jpeg import decode_jpeg, encode_jpeg_ycbcr

    h, w = 24, 40
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    y = np.clip(60 + xs * 3 + ys * 2, 0, 255).astype(np.uint8)
    cb = np.clip(100 + xs, 0, 255).astype(np.uint8)
    cr = np.clip(100 + ys, 0, 255).astype(np.uint8)
    rgb = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, sampling=(2, 2)))
    exp = _expected_rgb(y, cb, cr)
    # lossy: AC step 16 + 2x2 chroma pooling; stays within a few levels
    assert int(np.abs(rgb.astype(int) - exp.astype(int)).max()) <= 24
    assert abs(float(rgb.mean()) - float(exp.mean())) < 2.0


def test_decode_jpeg_gray_rejects_color():
    from scribe_js_spark.textops.jpeg import encode_jpeg_ycbcr

    y = _mb_luma(16, 16)
    c = np.full((16, 16), 128, np.uint8)
    with pytest.raises(ValueError):
        decode_jpeg_gray(encode_jpeg_ycbcr(y, c, c))


# ------------------------------------------------- progressive (SOF2)

def test_progressive_equals_baseline_gray():
    """Progressive streams built from the same quantized coefficients
    must decode bit-identically to the baseline stream — spectral
    selection + successive approximation round through the refinement
    passes exactly."""
    from scribe_js_spark.textops.jpeg import (
        decode_jpeg, encode_jpeg_progressive)

    rng = np.random.RandomState(11)
    for (h, w) in [(16, 24), (19, 29), (8, 8)]:
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_gray(px))
        prog = decode_jpeg(encode_jpeg_progressive(px))
        assert np.array_equal(prog, base), (h, w)


def test_progressive_equals_baseline_color():
    from scribe_js_spark.textops.jpeg import (
        decode_jpeg, encode_jpeg_progressive, encode_jpeg_ycbcr)

    rng = np.random.RandomState(12)
    for samp in [(2, 2), (2, 1), (1, 1)]:
        for (h, w) in [(32, 48), (17, 23)]:
            y = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            cb = rng.randint(80, 176, size=(h, w)).astype(np.uint8)
            cr = rng.randint(80, 176, size=(h, w)).astype(np.uint8)
            base = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, sampling=samp))
            prog = decode_jpeg(
                encode_jpeg_progressive(y, cb, cr, sampling=samp))
            assert np.array_equal(prog, base), (samp, h, w)


def test_progressive_blockwise_constant_lossless():
    from scribe_js_spark.textops.jpeg import (
        decode_jpeg, encode_jpeg_progressive)

    px = _block_image(3, 2)
    dec = decode_jpeg(encode_jpeg_progressive(px))
    assert np.array_equal(dec, px)
