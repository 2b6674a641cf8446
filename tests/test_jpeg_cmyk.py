"""CMYK/YCCK 4-component JPEG decode (reference decodeJPEG.js parity).

The vectorized decoder tail (`_cmyk_to_rgb`, `_upsample_component`) is
cross-checked against literal per-pixel ports of the reference's
semantics (decodeJPEG.js:767-948): YCCK inversion with clamping,
decodeInvert complement, the pdf.js SWOP polynomial, and bilinear
chroma upsampling with edge clamping.
"""

import struct

import numpy as np
import pytest

from scribe_js_spark.textops.jpeg import (
    decode_jpeg,
    encode_jpeg_cmyk,
    encode_jpeg_gray,
    _cmyk_to_rgb,
)


def _swop_px(c, m, y, k):
    """Literal per-pixel port of the reference polynomial
    (decodeJPEG.js:905-930; 0-255 in, 0-255 RGB out)."""
    cn, mn, yn, kn = c / 255.0, m / 255.0, y / 255.0, k / 255.0
    ri = 255 \
        + cn * (-4.387332384609988 * cn + 54.48615194189176 * mn
                + 18.82290502165302 * yn + 212.25662451639585 * kn
                - 285.2331026137004) \
        + mn * (1.7149763477362134 * mn - 5.6096736904047315 * yn
                - 17.873870861415444 * kn - 5.497006427196366) \
        + yn * (-2.5217340131683033 * yn - 21.248923337353073 * kn
                + 17.5119270841813) \
        + kn * (-21.86122147463605 * kn - 189.48180835922747)
    gi = 255 \
        + cn * (8.841041422036149 * cn + 60.118027045597366 * mn
                + 6.871425592049007 * yn + 31.159100130055922 * kn
                - 79.2970844816548) \
        + mn * (-15.310361306967817 * mn + 17.575251261109482 * yn
                + 131.35250912493976 * kn - 190.9453302588951) \
        + yn * (4.444339102852739 * yn + 9.8632861493405 * kn
                - 24.86741582555878) \
        + kn * (-20.737325471181034 * kn - 187.80453709719578)
    bi = 255 \
        + cn * (0.8842522430003296 * cn + 8.078677503112928 * mn
                + 30.89978309703729 * yn - 0.23883238689178934 * kn
                - 14.183576799673286) \
        + mn * (10.49593273432072 * mn + 63.02378494754052 * yn
                + 50.606957656360734 * kn - 112.23884253719248) \
        + yn * (0.03296041114873217 * yn + 115.60384449646641 * kn
                - 193.58209356861505) \
        + kn * (-22.33816807309886 * kn - 180.12613974708367)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else round(v))
    return clamp(ri), clamp(gi), clamp(bi)


def _block_planes(n, seeds):
    """Four blockwise-constant (3x2 blocks of 8x8) uint8 planes —
    constant per 8x8 block so baseline coding is lossless."""
    planes = []
    for s in seeds[:n]:
        bx, by = np.meshgrid(np.arange(3), np.arange(2))
        blocks = ((bx * 53 + by * 29 + s) % 256).astype(np.uint8)
        planes.append(np.kron(blocks, np.ones((8, 8), dtype=np.uint8)))
    return planes


def test_swop_vectorized_matches_literal_port():
    vals = np.arange(0, 256, 51, dtype=np.uint8)  # 0,51,...,255
    grid = np.stack(np.meshgrid(vals, vals, vals, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    for k in (0, 128, 255):
        planes = [grid[:, 0].reshape(1, -1), grid[:, 1].reshape(1, -1),
                  grid[:, 2].reshape(1, -1),
                  np.full((1, grid.shape[0]), k, dtype=np.uint8)]
        out = _cmyk_to_rgb(planes, None, False)
        for i in range(0, grid.shape[0], 17):
            exp = _swop_px(int(grid[i, 0]), int(grid[i, 1]),
                           int(grid[i, 2]), k)
            # np.round is banker's rounding vs JS round-half-up
            assert np.abs(out[0, i].astype(int)
                          - np.array(exp)).max() <= 1


def test_cmyk_4444_roundtrip_exact():
    planes = _block_planes(4, (0, 97, 181, 11))
    data = encode_jpeg_cmyk(planes, sampling=(1, 1), transform=0)
    out = decode_jpeg(data)
    assert out.shape == (16, 24, 3)
    exp = _cmyk_to_rgb([p.astype(np.float64) for p in planes], 0, False)
    assert np.array_equal(out, exp)


def test_ycck_transform2_applies_inversion():
    planes = _block_planes(4, (40, 130, 200, 70))
    data = encode_jpeg_cmyk(planes, sampling=(1, 1), transform=2)
    out = decode_jpeg(data)
    # literal per-pixel YCCK -> CMYK -> RGB (decodeJPEG.js:881-903)
    Y, Cb, Cr, K = (p.astype(float) for p in planes)
    px, py = 5, 9
    yv, cb, cr, k = Y[px, py], Cb[px, py], Cr[px, py], K[px, py]
    r = min(255.0, max(0.0, yv + 1.402 * (cr - 128)))
    g = min(255.0, max(0.0, yv - 0.344136 * (cb - 128)
                       - 0.714136 * (cr - 128)))
    b = min(255.0, max(0.0, yv + 1.772 * (cb - 128)))
    exp = _swop_px(255 - r, 255 - g, 255 - b, k)
    assert np.abs(out[px, py].astype(int) - np.array(exp)).max() <= 1
    # and differs from the transform-0 interpretation of the same scan
    out0 = decode_jpeg(encode_jpeg_cmyk(planes, transform=0))
    assert not np.array_equal(out, out0)


def test_decode_invert_complements_inks():
    planes = _block_planes(4, (10, 60, 110, 160))
    data = encode_jpeg_cmyk(planes, sampling=(1, 1), transform=0)
    inv = decode_jpeg(data, decode_invert=True)
    exp = _cmyk_to_rgb(
        [255.0 - p.astype(np.float64) for p in planes], 0, False)
    assert np.array_equal(inv, exp)


def test_cmyk_subsampled_bilinear_upsampling():
    # gradient planes; comp0 at (2,2), comps 1-3 box-averaged to half
    # resolution and bilinearly upsampled on decode
    h, w = 16, 16
    g = np.clip(np.add.outer(np.arange(h) * 9, np.arange(w) * 7),
                0, 255).astype(np.uint8)
    planes = [np.full((h, w), 200, np.uint8), g, g.T.copy(),
              np.full((h, w), 30, np.uint8)]
    data = encode_jpeg_cmyk(planes, sampling=(2, 2), transform=0)
    out = decode_jpeg(data)
    assert out.shape == (h, w, 3)
    # independent check: decode the stored half-res samples from a
    # separate 4:4:4:4 encoding of the pooled planes, then literal
    # bilinear (decodeJPEG.js:833-855) + polynomial at two pixels
    pooled = [planes[0]] + [
        np.round(p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
        .astype(np.uint8) for p in planes[1:]]
    for (py_, px_) in ((3, 11), (15, 15)):
        comp = [float(pooled[0][py_, px_])]
        for ci in range(1, 4):
            buf = pooled[ci].astype(float)
            ch, cw = buf.shape
            fx, fy = px_ * 0.5, py_ * 0.5
            x0, y0 = int(fx), int(fy)
            x1, y1 = min(x0 + 1, cw - 1), min(y0 + 1, ch - 1)
            dx, dy = fx - x0, fy - y0
            v = ((buf[y0, x0] * (1 - dx) + buf[y0, x1] * dx) * (1 - dy)
                 + (buf[y1, x0] * (1 - dx) + buf[y1, x1] * dx) * dy)
            comp.append(float(int(v + 0.5)))
        exp = _swop_px(*comp)
        # quantization noise in the stored samples dominates; the
        # polynomial is locally Lipschitz ~1, so stay within the
        # per-plane coding error budget
        assert np.abs(out[py_, px_].astype(int) - np.array(exp)).max() <= 12


def test_16bit_quant_table_decodes():
    bx, by = np.meshgrid(np.arange(3), np.arange(2))
    px = np.kron(((bx * 31 + by * 17) % 256).astype(np.uint8),
                 np.ones((8, 8), dtype=np.uint8))
    data = encode_jpeg_gray(px)
    i = data.find(b"\xff\xdb")
    ln = struct.unpack_from(">H", data, i + 2)[0]
    body = data[i + 4 : i + 2 + ln]
    assert body[0] == 0x00
    q16 = bytes([0x10]) + b"".join(
        struct.pack(">H", v) for v in body[1:65])
    patched = (data[:i] + b"\xff\xdb"
               + struct.pack(">H", len(q16) + 2) + q16
               + data[i + 2 + ln:])
    assert np.array_equal(decode_jpeg(patched), decode_jpeg(data))


def test_adobe_transform0_three_component_rgb_direct():
    from scribe_js_spark.textops.jpeg import encode_jpeg_ycbcr

    planes = _block_planes(3, (5, 77, 149))
    data = encode_jpeg_ycbcr(planes[0], planes[1], planes[2],
                             sampling=(1, 1))
    app14 = (b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
             + struct.pack(">HHHB", 100, 0, 0, 0))
    patched = data[:2] + app14 + data[2:]
    out = decode_jpeg(patched)
    exp = np.stack(planes, axis=-1)
    assert np.array_equal(out, exp)       # stored samples pass through
    assert not np.array_equal(decode_jpeg(data), exp)  # YCbCr otherwise


def test_five_component_still_rejected():
    planes = _block_planes(4, (1, 2, 3, 4))
    data = bytearray(encode_jpeg_cmyk(planes))
    i = bytes(data).find(b"\xff\xc0")
    assert data[i + 9] == 4
    data[i + 9] = 5  # claim 5 components
    with pytest.raises((NotImplementedError, ValueError, IndexError)):
        decode_jpeg(bytes(data))
