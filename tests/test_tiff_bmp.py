"""TIFF / BMP codecs + G.711 telephony audio."""

import numpy as np
import pytest

from scribe_js_spark.textops.multimodal import (
    _alaw_compress,
    _alaw_expand,
    _mulaw_compress,
    _mulaw_expand,
    decode_bmp,
    decode_wav,
    encode_bmp,
)
from scribe_js_spark.textops.tiff import decode_tiff, encode_tiff


def _gray(w=37, h=23):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return ((xs * 7 + ys * 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_roundtrip(comp, pred):
    gray = _gray()
    rgb = np.stack([gray, (gray + 30) % 256, (gray + 60) % 256],
                   -1).astype(np.uint8)
    for img, spp in ((gray, 1), (rgb, 3)):
        w, h, got_spp, px = decode_tiff(
            encode_tiff(img, compression=comp, predictor=pred))
        assert (w, h, got_spp) == (37, 23, spp)
        exp = img[:, :, None] if img.ndim == 2 else img
        assert np.array_equal(px, exp)


def test_tiff_white_is_zero_and_rejects():
    gray = _gray()
    _w, _h, _s, px = decode_tiff(encode_tiff(gray, photometric=0))
    assert np.array_equal(px[:, :, 0], 255 - gray)
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00\x10\x00\x00\x00")
    data = bytearray(encode_tiff(gray))
    # flip compression tag value to CCITT G4 (4): honest rejection
    i = data.find((259).to_bytes(2, "little"))
    data[i + 8] = 4
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(data))


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip(top_down):
    gray = _gray(21, 13)
    rgb = np.stack([gray, (gray + 9) % 256, (gray + 77) % 256],
                   -1).astype(np.uint8)
    _w, _h, _c, px = decode_bmp(encode_bmp(gray, top_down=top_down))
    assert np.array_equal(px, np.stack([gray] * 3, -1))
    _w, _h, _c, px = decode_bmp(encode_bmp(rgb, top_down=top_down))
    assert np.array_equal(px, rgb)


def test_g711_companding_error_bounded():
    x = np.linspace(-30000, 30000, 4001).astype(np.int16)
    for comp, exp in ((_mulaw_compress, _mulaw_expand),
                      (_alaw_compress, _alaw_expand)):
        err = np.abs(exp(comp(x)).astype(np.int64) - x).max()
        assert err < 1100  # segment-step quantization bound


def test_g711_wav_decodes():
    import struct

    s = (np.linspace(-20000, 20000, 800)).astype(np.int16)
    for tag, comp in ((7, _mulaw_compress), (6, _alaw_compress)):
        enc = comp(s).tobytes()
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(enc)) + enc)
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, ch, bits, frames, got = decode_wav(data)
        assert (rate, ch, frames) == (8000, 1, 800)
        err = np.abs(got[:, 0].astype(np.int64) - s).max()
        assert err < 1100


def test_netpbm_roundtrips():
    from scribe_js_spark.textops.multimodal import (
        decode_netpbm, encode_netpbm)

    g = _gray(19, 11)
    rgb = np.stack([g, (g.astype(np.int32) + 9) % 256,
                    (g.astype(np.int32) + 77) % 256], -1).astype(np.uint8)
    g16 = g.astype(np.uint16) * 257
    for img in (g, rgb):
        for binary in (True, False):
            _w, _h, _c, px = decode_netpbm(
                encode_netpbm(img, binary=binary))
            exp = img[:, :, None] if img.ndim == 2 else img
            assert np.array_equal(px, exp)
    _w, _h, _c, px = decode_netpbm(encode_netpbm(g16))
    assert px.dtype == np.uint16 and np.array_equal(px[:, :, 0], g16)
    with pytest.raises(ValueError):
        decode_netpbm(b"P5 3 3 255\n\x00")  # truncated
    with pytest.raises(ValueError):
        decode_netpbm(b"P7 weird")
