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


def test_progressive_rejected_honestly():
    px = _block_image(2, 2)
    data = bytearray(encode_jpeg_gray(px))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
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
    bad[i + 1] = 0xC2
    df = spark.createDataFrame(
        [(1, good), (2, bytes(bad))], ["media_id", "data"])
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[1]["kind"] == "jpeg"
    assert rows[1]["width"] == 24 and rows[1]["height"] == 16
    assert rows[1]["error"] is None
    assert abs(rows[1]["mean_byte"] - float(px.mean())) < 1e-9
    assert rows[2]["error"].startswith("not_implemented")
