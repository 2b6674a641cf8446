"""CCITT T.4/T.6 fax codec + TIFF integration."""

import numpy as np
import pytest

from scribe_js_spark.textops.ccitt import (
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)
from scribe_js_spark.textops.tiff import decode_tiff, encode_tiff


def test_code_tables_structure_and_prefix_freedom():
    """64 terminating codes per color, 27 make-ups per color, 13
    shared extended make-ups; each color's full table is prefix-free
    (decodability) and duplicate-free; published spot values hold."""
    assert len(_WHITE_TERM) == 64 and len(_BLACK_TERM) == 64
    assert len(_WHITE_MAKEUP) == 27 and len(_BLACK_MAKEUP) == 27
    assert len(_EXT_MAKEUP) == 13
    for table in (
            _WHITE_TERM + list(_WHITE_MAKEUP.values())
            + list(_EXT_MAKEUP.values()),
            _BLACK_TERM + list(_BLACK_MAKEUP.values())
            + list(_EXT_MAKEUP.values())):
        assert len(set(table)) == len(table)
        by_len = sorted(table, key=len)
        for i, a in enumerate(by_len):
            for b in by_len[i + 1:]:
                assert not (b.startswith(a) and a != b), (a, b)
    # spec spot checks (ITU T.4 tables 2/3)
    assert _WHITE_TERM[0] == "00110101"
    assert _WHITE_TERM[1] == "000111"
    assert _BLACK_TERM[1] == "010"
    assert _BLACK_TERM[2] == "11"
    assert _WHITE_MAKEUP[64] == "11011"
    assert _BLACK_MAKEUP[64] == "0000001111"
    assert _EXT_MAKEUP[2560] == "000000011111"


def _pattern(w, h):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return (((xs * 7 + ys * 13) % 256) >= 128).astype(int).tolist()


def test_g4_and_mh_roundtrips():
    for w, h in ((17, 5), (64, 20), (200, 11)):
        rows = _pattern(w, h)
        assert decode_g4(encode_g4(rows, w), w, h) == rows
        for eols in (False, True):
            assert decode_mh(encode_mh(rows, w, eols=eols),
                             w, h, eols=eols) == rows


def test_long_runs_use_makeups():
    """Runs beyond 1728 need the extended make-up codes."""
    row = [[0] * 2600 + [1] * 2600 + [0] * 123]
    w = len(row[0])
    assert decode_g4(encode_g4(row, w), w, 1) == row
    assert decode_mh(encode_mh(row, w), w, 1) == row


def test_all_modes_exercised():
    """A shape with staircase edges (vertical modes), isolated marks
    (horizontal mode) and vanishing runs (pass mode)."""
    w = 40
    rows = []
    for y in range(12):
        r = [0] * w
        for x in range(5 + y, 15 + y):        # drifting band -> V modes
            r[x] = 1
        if y == 3:
            for x in range(25, 30):           # appears -> H mode
                r[x] = 1
        if y in (4, 5):
            pass                              # disappears -> pass mode
        rows.append(r)
    assert decode_g4(encode_g4(rows, w), w, len(rows)) == rows


def test_tiff_fax_roundtrip_and_errors():
    img = (np.array(_pattern(33, 14)) * 255).astype(np.uint8)
    for comp in (2, 3, 4):
        t = encode_tiff(img, compression=comp)
        w, h, spp, px = decode_tiff(t)
        assert (w, h, spp) == (33, 14, 1)
        assert (px[:, :, 0] == img).all()
    # corrupted fax data must raise, not hang: a run of zero bytes is
    # not a valid 2-D mode code (all-ones, by contrast, decodes as
    # legitimate V0 modes — fax has no integrity check)
    t = bytearray(encode_tiff(img, compression=4))
    strip_off = t.index(b"\x00\x01", 8)  # somewhere in the strip
    t[-10:] = b"\x00" * 10
    _ = strip_off
    with pytest.raises(Exception):
        decode_tiff(bytes(t))


def test_media_pipeline_decodes_fax(spark):
    from scribe_js_spark.textops.multimodal import decode_media

    img = (np.array(_pattern(24, 10)) * 255).astype(np.uint8)
    rows = [(1, encode_tiff(img, compression=4)),
            (2, encode_tiff(img, compression=2))]
    df = spark.createDataFrame(rows, ["media_id", "data"])
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    for mid in (1, 2):
        assert out[mid]["kind"] == "tiff"
        assert out[mid]["width"] == 24 and out[mid]["height"] == 10
        assert abs(out[mid]["mean_byte"] - img.mean()) < 1e-9


def test_g3_mixed_2d_roundtrip_and_tiff():
    """T.4 mixed 2-D (K > 1): EOL + tag bit per line, 2-D lines coded
    against the previous line; TIFF compression 3 with T4Options bit 0
    and the PDF CCITT K>0 path both ride it."""
    from scribe_js_spark.textops.ccitt import decode_g3_2d, encode_g3_2d

    rows = _pattern(53, 9)
    for k in (1, 2, 4):
        assert decode_g3_2d(encode_g3_2d(rows, 53, k=k), 53, 9) == rows

    img = (np.array(_pattern(31, 12)) * 255).astype(np.uint8)
    t = encode_tiff(img, compression=3, t4_2d=True)
    w, h, spp, px = decode_tiff(t)
    assert (px[:, :, 0] == img).all()


def test_mh_continuous_bitstream_dialect():
    """PDF CCITTFaxDecode K=0 default: a continuous bitstream with no
    per-row byte alignment (decodeCCITT.js:477, EncodedByteAlign
    default false). Width 17 guarantees rows end mid-byte, so the
    aligned (TIFF) and unaligned (PDF) encodings genuinely differ."""
    rows = _pattern(17, 9)
    packed = encode_mh(rows, 17, byte_align=False)
    aligned = encode_mh(rows, 17, byte_align=True)
    assert packed != aligned
    assert len(packed) < len(aligned)
    assert decode_mh(packed, 17, 9, byte_align=False) == rows
    # decoding the continuous stream with TIFF row alignment must NOT
    # reproduce the image (this was the pre-fix behavior)
    try:
        misread = decode_mh(packed, 17, 9, byte_align=True)
    except ValueError:
        misread = None
    assert misread != rows
    # default (byte_align=None) keeps TIFF compression-2 semantics
    assert decode_mh(aligned, 17, 9) == rows


def test_g4_and_g3_byte_align_flag():
    from scribe_js_spark.textops.ccitt import decode_g3_2d, encode_g3_2d

    rows = _pattern(19, 7)
    # byte_align=False is the default continuous layout
    assert decode_g4(encode_g4(rows, 19), 19, 7,
                     byte_align=False) == rows
    # g3 2-D: zero fill keeps EOLs findable whether or not the decoder
    # additionally realigns first
    enc = encode_g3_2d(rows, 19, k=2)
    assert decode_g3_2d(enc, 19, 7, byte_align=False) == rows


def test_eol_fill_beyond_64_bits():
    """T.4 allows arbitrary-length zero fill before an EOL (minimum
    scan-line time); a 13-byte zero prefix (104 fill bits) must not
    trip the decoder (the old fixed 64-bit scan budget raised)."""
    rows = _pattern(12, 3)
    enc = encode_mh(rows, 12, eols=True)
    assert decode_mh(b"\x00" * 13 + enc, 12, 3, eols=True) == rows
