"""Lossless (SOF3) JPEG — exact round-trips across every predictor.

BEYOND the reference: decodeJPEG.js is baseline-only, and decode_jpeg
previously surfaced SOF3 as an honest NotImplementedError. Lossless
means the decode must reproduce the input byte-for-byte, so each
assert is an exact-equality oracle.
"""

import numpy as np
import pytest

from scribe_js_spark.textops.jpeg import decode_jpeg
from scribe_js_spark.textops.jpeg_lossless import (
    decode_jpeg_lossless, encode_jpeg_lossless)


def _gray(seed=5, h=23, w=31):
    rng = np.random.default_rng(seed)
    # smooth-ish field plus noise: exercises small and large diffs
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 5) % 200
    return ((base + rng.integers(0, 56, (h, w))) % 256).astype(np.uint8)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_gray_roundtrip_every_predictor(predictor):
    px = _gray()
    out = decode_jpeg_lossless(encode_jpeg_lossless(px, predictor))
    assert out.dtype == np.uint8
    assert np.array_equal(out, px), predictor


def test_lossless_rgb_roundtrip_and_dispatch():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (17, 13, 3)).astype(np.uint8)
    data = encode_jpeg_lossless(px, predictor=4)
    # through the main decode_jpeg SOF dispatch (same return contract)
    out = decode_jpeg(data)
    assert out.shape == (17, 13, 3)
    assert np.array_equal(out, px)


def test_lossless_restart_intervals():
    px = _gray(seed=77, h=19, w=29)
    data = encode_jpeg_lossless(px, predictor=7, restart_interval=64)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    assert np.array_equal(decode_jpeg_lossless(data), px)


def test_lossless_extreme_diffs():
    """Alternating 0/255 forces the widest difference categories."""
    px = np.zeros((8, 8), dtype=np.uint8)
    px[::2, :] = 255
    px[:, ::2] ^= 255
    for predictor in (1, 2, 4):
        out = decode_jpeg_lossless(encode_jpeg_lossless(px, predictor))
        assert np.array_equal(out, px), predictor
