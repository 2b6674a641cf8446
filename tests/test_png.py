"""From-scratch PNG decoder tests."""

import numpy as np
import pytest

from scribe_js_spark.textops.multimodal import (
    _decode_one,
    decode_png,
    encode_png_gray,
)


def test_roundtrip_all_filters():
    rng = np.random.RandomState(3)
    for _ in range(4):
        h, w = rng.randint(2, 50), rng.randint(2, 50)
        px = rng.randint(0, 256, (h, w)).astype(np.uint8)
        for cyc in (False, True):
            width, height, channels, out = decode_png(
                encode_png_gray(px, cycle_filters=cyc))
            assert (width, height, channels) == (w, h, 1)
            assert np.array_equal(out[:, :, 0], px)


def test_decode_one_png_metadata():
    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    rec = _decode_one(encode_png_gray(px))
    assert rec["kind"] == "png"
    assert (rec["width"], rec["height"]) == (8, 6)
    assert rec["mean_byte"] == px.mean()
    assert rec["error"] is None


def test_malformed_png_raises():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\x08garbage")
    # truncated scanlines
    good = encode_png_gray(np.zeros((4, 4), np.uint8))
    with pytest.raises(Exception):
        decode_png(good[:40])


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("cyc", [False, True])
def test_sub_byte_gray_roundtrip(depth, cyc):
    """1/2/4-bit grayscale: samples replicate to 8-bit levels
    (0..2^d-1 -> 0..255), exact for every depth; widths that don't
    fill the last row byte exercise the padding crop."""
    rng = np.random.RandomState(11 * depth)
    for h, w in ((5, 13), (7, 8), (3, 3)):
        px = rng.randint(0, 1 << depth, (h, w)).astype(np.uint8)
        width, height, channels, out = decode_png(
            encode_png_gray(px, bit_depth=depth, cycle_filters=cyc))
        assert (width, height, channels) == (w, h, 1)
        assert np.array_equal(out[:, :, 0],
                              px * (255 // ((1 << depth) - 1)))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub_byte_adam7_roundtrip(depth):
    rng = np.random.RandomState(7 + depth)
    px = rng.randint(0, 1 << depth, (11, 13)).astype(np.uint8)
    w, h, c, out = decode_png(
        encode_png_gray(px, bit_depth=depth, interlace=True))
    assert (w, h, c) == (13, 11, 1)
    assert np.array_equal(out[:, :, 0],
                          px * (255 // ((1 << depth) - 1)))


def test_sub_byte_palette_keeps_indices():
    """color type 3 at depth 4: the raw index plane comes back (no
    level replication), matching the 8-bit palette contract."""
    import struct
    import zlib

    px = (np.arange(60, dtype=np.uint8) % 7).reshape(6, 10)
    gray = encode_png_gray(px, bit_depth=4)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", 10, 6, 4, 3, 0, 0, 0)
    plte = bytes(v for i in range(7) for v in (i * 30, 0, 255 - i * 30))
    idat_start = gray.find(b"IDAT") - 4
    iend_start = gray.find(b"IEND") - 4
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", plte) + gray[idat_start:iend_start]
            + chunk(b"IEND", b""))
    w, h, c, out = decode_png(data)
    assert (w, h, c) == (10, 6, 1)
    assert np.array_equal(out[:, :, 0], px)


def test_sub_byte_color_type_combinations_rejected():
    import struct
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    # RGB (color type 2) at depth 4 is illegal per the PNG spec
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(data)


def _grad(h, w):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return ((xs * 7 + ys * 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("dims", [(13, 23), (1, 1), (3, 5), (16, 17)])
@pytest.mark.parametrize("cycle", [False, True])
def test_adam7_roundtrip(dims, cycle):
    h, w = dims
    px = _grad(h, w)
    rw, rh, _c, out = decode_png(
        encode_png_gray(px, cycle_filters=cycle, interlace=True))
    assert (rw, rh) == (w, h)
    assert np.array_equal(out[:, :, 0], px)


@pytest.mark.parametrize("interlace", [False, True])
def test_16bit_roundtrip_and_msb_mean(interlace):
    px16 = (_grad(13, 23).astype(np.uint16) * 257)
    data = encode_png_gray(px16, cycle_filters=True, bit_depth=16,
                           interlace=interlace)
    _w, _h, _c, out = decode_png(data)
    assert out.dtype == np.uint16
    assert np.array_equal(out[:, :, 0], px16)
    rec = _decode_one(data)
    # mean_byte is the MSB mean: MSB of v*257 is v
    assert rec["mean_byte"] == float((px16 >> 8).mean())
    assert rec["error"] is None


def test_corrupt_jpeg_surfaces_as_error():
    # JPEG decode is implemented (textops/jpeg.py) as of round 3;
    # corrupt input raises ValueError -> the decode_failure column.
    with pytest.raises(ValueError):
        _decode_one(b"\xff\xd8\xff\xe0rest")
