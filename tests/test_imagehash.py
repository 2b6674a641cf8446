"""Perceptual hashing + image near-dup pairs."""

import numpy as np

from scribe_js_spark.textops.imagehash import phash64_pixels


def _photo(seed=0, h=64, w=96):
    """Smooth 'photo-like' field (pHash needs low-frequency content)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(6, 8)
    ys = np.linspace(0, 5, h)
    xs = np.linspace(0, 7, w)
    yi = np.clip(ys.astype(int), 0, 4)
    xi = np.clip(xs.astype(int), 0, 6)
    fy = ys - yi
    fx = xs - xi
    a = (base[yi][:, xi] * (1 - fy)[:, None] * (1 - fx)[None, :]
         + base[yi + 1][:, xi] * fy[:, None] * (1 - fx)[None, :]
         + base[yi][:, xi + 1] * (1 - fy)[:, None] * fx[None, :]
         + base[yi + 1][:, xi + 1] * fy[:, None] * fx[None, :])
    return (a * 255).astype(np.uint8)


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_phash_invariant_to_reencode_and_scale():
    img = _photo(1)
    h0 = phash64_pixels(img)
    # JPEG re-encode (lossy) barely moves the hash
    from scribe_js_spark.textops.jpeg import decode_jpeg, encode_jpeg_gray

    h1 = phash64_pixels(decode_jpeg(encode_jpeg_gray(img)))
    assert _ham(h0, h1) <= 3
    # 2x upscale (same content) barely moves the hash
    h2 = phash64_pixels(np.repeat(np.repeat(img, 2, 0), 2, 1))
    assert _ham(h0, h2) <= 3
    # different photo is far away
    h3 = phash64_pixels(_photo(7))
    assert _ham(h0, h3) > 10


def test_image_near_dups_pipeline(spark):
    from scribe_js_spark.textops.imagehash import image_near_dups
    from scribe_js_spark.textops.jpeg import encode_jpeg_gray
    from scribe_js_spark.textops.multimodal import encode_png_gray

    img_a = _photo(2)
    img_b = _photo(9)
    rows = [
        (1, encode_png_gray(img_a)),
        (2, encode_jpeg_gray(img_a)),          # re-encoded duplicate of 1
        (3, encode_png_gray(img_b)),           # unrelated
        (4, encode_png_gray(np.repeat(np.repeat(img_a, 2, 0), 2, 1))),
        (5, b"not an image"),                  # must not break the job
    ]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dups(df, max_distance=3).collect()}
    assert (1, 2) in pairs
    assert (1, 4) in pairs
    assert not any(3 in p for p in pairs)
