"""EXIF parse/scrub over JPEG APP1 (image-side PII pass)."""

import numpy as np
import pytest

from scribe_js_spark.textops.exif import (
    build_exif_jpeg,
    parse_exif,
    strip_exif,
)
from scribe_js_spark.textops.jpeg import decode_jpeg, encode_jpeg_gray


def _jpeg():
    bx, by = np.meshgrid(np.arange(3), np.arange(2))
    px = np.kron(((bx * 31 + by * 17) % 256).astype(np.uint8),
                 np.ones((8, 8), np.uint8))
    return encode_jpeg_gray(px), px


def test_parse_roundtrip_fields():
    base, _ = _jpeg()
    data = build_exif_jpeg(base, orientation=6, make="ACME",
                           model="Z9", datetime_s="2021:06:07 08:09:10")
    info = parse_exif(data)
    assert info["has_exif"] and info["orientation"] == 6
    assert info["make"] == "ACME" and info["model"] == "Z9"
    assert info["datetime"] == "2021:06:07 08:09:10"
    assert not info["has_gps"]
    assert info["gps_lat"] is None


@pytest.mark.parametrize("lat,lon", [(37.7749, -122.4194),
                                     (-33.8688, 151.2093)])
def test_gps_rationals_decode_signed(lat, lon):
    base, _ = _jpeg()
    data = build_exif_jpeg(base, gps=(lat, lon))
    info = parse_exif(data)
    assert info["has_gps"]
    assert abs(info["gps_lat"] - lat) < 1e-3
    assert abs(info["gps_lon"] - lon) < 1e-3


def test_strip_removes_exif_keeps_pixels():
    base, px = _jpeg()
    data = build_exif_jpeg(base, orientation=3, gps=(1.5, 2.5))
    assert parse_exif(data)["has_exif"]
    scrubbed = strip_exif(data)
    assert not parse_exif(scrubbed)["has_exif"]
    assert len(scrubbed) < len(data)
    assert np.array_equal(decode_jpeg(scrubbed), decode_jpeg(base))
    assert np.array_equal(decode_jpeg(scrubbed), px)
    # idempotent; EXIF-free input unchanged
    assert strip_exif(scrubbed) == scrubbed
    assert strip_exif(base) == base


def test_non_jpeg_and_exif_free_are_empty_summaries():
    assert parse_exif(b"not a jpeg")["has_exif"] is False
    base, _ = _jpeg()
    info = parse_exif(base)
    assert not info["has_exif"] and info["orientation"] is None
    assert strip_exif(b"plain bytes") == b"plain bytes"


def test_parse_never_raises_on_mutations():
    rng = np.random.RandomState(41)
    base, _ = _jpeg()
    data = build_exif_jpeg(base, orientation=8, gps=(12.34, 56.78))
    for _ in range(60):
        b = bytearray(data)
        for _ in range(rng.randint(1, 25)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            parse_exif(bytes(b))
            strip_exif(bytes(b))
        except (ValueError, IndexError):
            pass  # typed errors acceptable; crashes/hangs are not


def test_image_exif_spark_op(spark):
    from scribe_js_spark.textops.multimodal import image_exif

    base, _ = _jpeg()
    rows = [
        (1, build_exif_jpeg(base, orientation=6, gps=(37.5, -122.25))),
        (2, build_exif_jpeg(base, orientation=1)),
        (3, base),                  # no EXIF
        (4, b"\x00\x01garbage"),    # not a JPEG
    ]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    got = {r["media_id"]: r
           for r in image_exif(df, verify_scrub=True).collect()}
    assert got[1]["has_exif"] == 1 and got[1]["orientation"] == 6
    assert got[1]["has_gps"] == 1
    assert got[1]["gps_lat_e6"] == 37499999 or \
        abs(got[1]["gps_lat_e6"] - 37500000) <= 1000
    assert got[1]["gps_lon_e6"] < 0
    assert got[1]["n_bytes_scrubbed"] < got[1]["n_bytes"]
    assert got[1]["scrub_decodes_equal"] == 1
    assert got[2]["has_exif"] == 1 and got[2]["has_gps"] == 0
    assert got[3]["has_exif"] == 0
    assert got[3]["n_bytes_scrubbed"] == got[3]["n_bytes"]
    assert got[4]["has_exif"] == 0  # non-JPEG: empty summary
