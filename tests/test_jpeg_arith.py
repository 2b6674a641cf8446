"""Arithmetic-coded (QM) sequential JPEG — T.81 Annex D/F.

External arithmetic sample streams don't exist in this sandbox, so
the oracle is layered: the raw coder roundtrips adversarial decision
sequences (carry, stacked-FF and stuffing paths), and the full codec
must decode to EXACTLY the pixels the Huffman path produces from the
same quantized coefficients — the models and coder sit under an
identical DCT/quantization front end, so any disagreement is a codec
bug, not rounding.
"""

import random

import numpy as np
import pytest

from scribe_js_spark.textops.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_ycbcr,
)
from scribe_js_spark.textops.jpeg_arith import (
    _ARITH_TAB,
    ArithDecoder,
    ArithEncoder,
    encode_jpeg_arith,
    fixed_stats,
    new_stats,
)


def test_state_table_invariants():
    assert len(_ARITH_TAB) == 114
    for i, (qe, nlps, nmps, switch) in enumerate(_ARITH_TAB):
        assert 0 < qe <= 0x5B12
        assert 0 <= nlps < 114 and 0 <= nmps < 114
        if switch:
            assert qe >= 0x5000  # MPS flips only near p=0.5
    # the fixed bin never adapts
    assert _ARITH_TAB[113][1] == 113 and _ARITH_TAB[113][2] == 113
    assert _ARITH_TAB[113][3] == 0


def test_raw_coder_roundtrip_stress():
    random.seed(1234)
    for _ in range(60):
        nbins = random.randint(1, 6)
        bias = random.choice([0.02, 0.2, 0.5, 0.8, 0.98])
        seq = [(random.randrange(nbins), int(random.random() < bias))
               for _ in range(random.randint(1, 800))]
        enc = ArithEncoder()
        st = new_stats(nbins)
        for b, d in seq:
            enc.code(st, b, d)
        data = enc.flush() + b"\xff\xd9"
        dec = ArithDecoder(data, 0)
        st2 = new_stats(nbins)
        for b, d in seq:
            assert dec.decode(st2, b) == d


def test_raw_coder_skewed_streams_hit_carry_and_stuffing():
    """All-MPS streams drive A hard against the carry logic; the
    encoded bytes must still roundtrip and any 0xFF data byte must
    be followed by a stuffed 0x00."""
    for d_const in (0, 1):
        enc = ArithEncoder()
        st = new_stats(1)
        for _ in range(3000):
            enc.code(st, 0, d_const)
        data = enc.flush()
        for i, b in enumerate(data[:-1]):
            if b == 0xFF:
                assert data[i + 1] == 0x00
        dec = ArithDecoder(data + b"\xff\xd9", 0)
        st2 = new_stats(1)
        assert all(dec.decode(st2, 0) == d_const for _ in range(3000))


def _block(bw, bh):
    bx, by = np.meshgrid(np.arange(bw), np.arange(bh))
    return np.kron(((bx * 31 + by * 17) % 256).astype(np.uint8),
                   np.ones((8, 8), np.uint8))


def test_gray_equals_huffman_and_lossless():
    px = _block(5, 4)
    da = decode_jpeg(encode_jpeg_arith(px))
    assert np.array_equal(da, decode_jpeg(encode_jpeg_gray(px)))
    assert np.array_equal(da, px)  # DC-only content is lossless


def test_gray_gradient_and_noise_equal_huffman():
    g = np.clip(np.add.outer(np.arange(40) * 3, np.arange(56) * 2),
                0, 255).astype(np.uint8)
    rng = np.random.RandomState(7)
    nz = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    for px in (g, nz, _block(3, 2)[:19, :21]):
        assert np.array_equal(decode_jpeg(encode_jpeg_arith(px)),
                              decode_jpeg(encode_jpeg_gray(px)))


@pytest.mark.parametrize("sampling", [(2, 2), (2, 1), (1, 1)])
@pytest.mark.parametrize("ri", [0, 2])
def test_color_equals_huffman(sampling, ri):
    h, w = 32, 48
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lum = (((xs // 16) * 31 + (ys // 16) * 17) % 160 + 40).astype(
        np.uint8)
    cb = np.full((h, w), 112, np.uint8)
    cr = np.full((h, w), 120, np.uint8)
    a = decode_jpeg(encode_jpeg_arith(lum, cb, cr, sampling=sampling,
                                      restart_interval=ri))
    b = decode_jpeg(encode_jpeg_ycbcr(lum, cb, cr, sampling=sampling,
                                      restart_interval=ri))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("dc_cond,kx",
                         [((0, 1), 5), ((1, 3), 1), ((2, 5), 63),
                          ((0, 0), 10), ((4, 8), 30)])
def test_dac_conditioning_variants(dc_cond, kx):
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (17, 23)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg_arith(px, dc_cond=dc_cond, ac_kx=kx))
    assert np.array_equal(a, decode_jpeg(encode_jpeg_gray(px)))


def test_gray_restart_interval():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    for ri in (1, 3, 7):
        a = decode_jpeg(encode_jpeg_arith(px, restart_interval=ri))
        assert np.array_equal(a, decode_jpeg(encode_jpeg_gray(px)))


def test_lossless_arithmetic_still_rejected():
    px = _block(2, 2)
    data = bytearray(encode_jpeg_arith(px))
    i = bytes(data).find(b"\xff\xc9")
    data[i + 1] = 0xCB  # SOF11: lossless arithmetic
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_progressive_arith_equals_huffman():
    """SOF10: the full scan ladder (DC first + bands + DC/AC
    refinements) reconstructs exactly the sequential decoding of the
    same quantized coefficients, at every starting precision."""
    rng = np.random.RandomState(7)
    nz = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    g = np.clip(np.add.outer(np.arange(40) * 3, np.arange(56) * 2),
                0, 255).astype(np.uint8)
    from scribe_js_spark.textops.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    for im in (nz, g, _block(3, 2)):
        for al in (1, 2, 3):
            a = decode_jpeg(encode_jpeg_arith_progressive(im, al=al))
            assert np.array_equal(a, decode_jpeg(encode_jpeg_gray(im)))


@pytest.mark.parametrize("sampling", [(2, 2), (2, 1), (1, 1)])
def test_progressive_arith_color_equals_huffman(sampling):
    from scribe_js_spark.textops.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.RandomState(19)
    h, w = 48, 32
    lum = rng.randint(30, 220, (h, w)).astype(np.uint8)
    cb = rng.randint(100, 150, (h, w)).astype(np.uint8)
    cr = rng.randint(100, 150, (h, w)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg_arith_progressive(
        lum, cb, cr, sampling=sampling, al=2))
    b = decode_jpeg(encode_jpeg_ycbcr(lum, cb, cr, sampling=sampling))
    assert np.array_equal(a, b)


def test_truncated_arith_stream_never_hangs():
    px = _block(3, 3)
    data = encode_jpeg_arith(px)
    # zero-fill past the cut keeps decoding total; output is garbage
    # or a raised error, never a hang/crash
    for cut in (len(data) // 3, len(data) - 3):
        try:
            out = decode_jpeg(data[:cut] + b"\xff\xd9")
            assert out.shape == (24, 24)
        except Exception:
            pass


def test_decode_media_surfaces_arith_jpeg(spark):
    from scribe_js_spark.textops.multimodal import decode_media

    px = _block(3, 2)
    df = spark.createDataFrame(
        [(1, encode_jpeg_arith(px))], ["media_id", "data"])
    row = decode_media(df).collect()[0]
    assert row["kind"] == "jpeg" and row["error"] is None
    assert (row["width"], row["height"]) == (24, 16)
    assert abs(row["mean_byte"] - float(px.mean())) < 1e-9
