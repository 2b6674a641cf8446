"""EXIF metadata over JPEG APP1 — parse, and scrub for training data.

Crawled images carry EXIF blocks whose GPS sub-IFD is location PII
and whose orientation tag changes how pixels should be interpreted.
This module gives the corpus pipeline both halves:

- :func:`parse_exif` reads the APP1 "Exif" segment (a little- or
  big-endian TIFF IFD — the same structure ``textops/tiff.py``
  walks), surfacing orientation, camera make/model, the original
  timestamp, and whether a GPS sub-IFD is present (plus its
  latitude/longitude when expressed as the standard rationals).
- :func:`strip_exif` removes APP1/APP13 (Photoshop IPTC) segments
  byte-exactly, leaving every other segment — and the entropy-coded
  pixels — untouched, so scrubbed images decode identically.
- :func:`build_exif_jpeg` is the fixture writer: it splices a
  deterministic EXIF block (optionally with a GPS sub-IFD) into any
  JPEG produced by the ``textops/jpeg`` encoders.

The PDF-side metadata operators (operators/pdf/metadata.py) scan and
strip the same markers inside embedded images; this module is the
standalone-media counterpart wired into ``decode_media``'s pipeline
through :func:`scribe_js_spark.textops.multimodal.image_exif`.
"""

from __future__ import annotations

import struct

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DT_ORIGINAL = 0x9003
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _walk_ifd(data, base, off, endian, depth=0):
    """One IFD -> {tag: (type, count, value_bytes_offset)}; offsets
    are absolute into ``data``. ``base`` is the TIFF header start."""
    out = {}
    if off + 2 > len(data) or depth > 4:
        return out
    (n,) = struct.unpack_from(endian + "H", data, off)
    if n > 512:
        return out  # allocation-bomb guard
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag, typ, count = struct.unpack_from(endian + "HHI", data, e)
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            vpos = e + 8
        else:
            (rel,) = struct.unpack_from(endian + "I", data, e + 8)
            vpos = base + rel
        out[tag] = (typ, count, vpos)
    return out


def _ascii(data, entry):
    typ, count, vpos = entry
    raw = data[vpos : vpos + count]
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace")


def _short(data, entry, endian):
    typ, count, vpos = entry
    fmt = "H" if typ == 3 else "I"
    try:
        return struct.unpack_from(endian + fmt, data, vpos)[0]
    except struct.error:
        return None


def _rational3(data, entry, endian):
    """Three unsigned rationals (deg, min, sec) -> float degrees."""
    typ, count, vpos = entry
    if typ != 5 or count < 3:
        return None
    try:
        vals = struct.unpack_from(endian + "II" * 3, data, vpos)
    except struct.error:
        return None
    out = 0.0
    scale = 1.0
    for i in range(3):
        num, den = vals[2 * i], vals[2 * i + 1]
        if den == 0:
            return None
        out += (num / den) / scale
        scale *= 60.0
    return out


def _iter_segments(data: bytes):
    """(marker, start, end_exclusive) for each marker segment before
    the first SOS; entropy data and everything after ride untouched."""
    pos = 2
    n = len(data)
    while pos + 3 < n:
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        yield marker, pos, pos + 2 + seg_len
        if marker == 0xDA:
            return
        pos += 2 + seg_len


def parse_exif(data: bytes) -> dict:
    """JPEG bytes -> EXIF summary dict: ``has_exif``, ``orientation``
    (1-8 or None), ``make``/``model``/``datetime`` strings,
    ``has_gps`` and decoded ``gps_lat``/``gps_lon`` (signed degrees)
    when present. Non-JPEG or EXIF-free input returns the empty
    summary rather than raising."""
    out = {"has_exif": False, "orientation": None, "make": None,
           "model": None, "datetime": None, "has_gps": False,
           "gps_lat": None, "gps_lon": None}
    if data[:2] != b"\xff\xd8":
        return out
    for marker, start, end in _iter_segments(data):
        if marker != 0xE1 or data[start + 4 : start + 10] != b"Exif\x00\x00":
            continue
        base = start + 10
        hdr = data[base : base + 8]
        if hdr[:2] == b"II":
            endian = "<"
        elif hdr[:2] == b"MM":
            endian = ">"
        else:
            continue
        out["has_exif"] = True
        (ifd0_rel,) = struct.unpack_from(endian + "I", data, base + 4)
        ifd0 = _walk_ifd(data, base, base + ifd0_rel, endian)
        if _TAG_ORIENTATION in ifd0:
            v = _short(data, ifd0[_TAG_ORIENTATION], endian)
            out["orientation"] = v if v and 1 <= v <= 8 else None
        if _TAG_MAKE in ifd0:
            out["make"] = _ascii(data, ifd0[_TAG_MAKE]) or None
        if _TAG_MODEL in ifd0:
            out["model"] = _ascii(data, ifd0[_TAG_MODEL]) or None
        if _TAG_DATETIME in ifd0:
            out["datetime"] = _ascii(data, ifd0[_TAG_DATETIME]) or None
        if _TAG_EXIF_IFD in ifd0:
            rel = _short(data, ifd0[_TAG_EXIF_IFD], endian)
            if rel is not None:
                sub = _walk_ifd(data, base, base + rel, endian, 1)
                if _TAG_DT_ORIGINAL in sub:
                    out["datetime"] = (
                        _ascii(data, sub[_TAG_DT_ORIGINAL])
                        or out["datetime"])
        if _TAG_GPS_IFD in ifd0:
            rel = _short(data, ifd0[_TAG_GPS_IFD], endian)
            if rel is not None:
                gps = _walk_ifd(data, base, base + rel, endian, 1)
                if gps:
                    out["has_gps"] = True
                lat = (_rational3(data, gps[_GPS_LAT], endian)
                       if _GPS_LAT in gps else None)
                lon = (_rational3(data, gps[_GPS_LON], endian)
                       if _GPS_LON in gps else None)
                if lat is not None and _GPS_LAT_REF in gps and \
                        _ascii(data, gps[_GPS_LAT_REF]).upper() == "S":
                    lat = -lat
                if lon is not None and _GPS_LON_REF in gps and \
                        _ascii(data, gps[_GPS_LON_REF]).upper() == "W":
                    lon = -lon
                out["gps_lat"] = lat
                out["gps_lon"] = lon
        break
    return out


def strip_exif(data: bytes) -> bytes:
    """Drop APP1 (EXIF/XMP) and APP13 (Photoshop IPTC) segments from a
    JPEG; every other byte — including the entropy-coded scan — is
    preserved, so the scrubbed image decodes identically. Non-JPEG
    input comes back unchanged."""
    if data[:2] != b"\xff\xd8":
        return data
    drops = [(s, e) for marker, s, e in _iter_segments(data)
             if marker in (0xE1, 0xED)]
    if not drops:
        return data
    out = bytearray()
    prev = 0
    for s, e in drops:
        out += data[prev:s]
        prev = e
    out += data[prev:]
    return bytes(out)


def build_exif_jpeg(jpeg: bytes, orientation: int = 1,
                    make: str = "FixtureCam", model: str = "FX-1",
                    datetime_s: str = "2020:01:02 03:04:05",
                    gps: tuple | None = None) -> bytes:
    """Fixture writer: splice a little-endian EXIF APP1 (IFD0 with
    orientation/make/model/datetime, optional GPS sub-IFD with
    (lat, lon) signed degrees) right after SOI of an existing JPEG."""
    entries0 = []  # (tag, typ, count, inline4_or_None, payload_bytes)

    def ascii_entry(tag, s):
        b = s.encode("ascii") + b"\x00"
        return (tag, 2, len(b), None if len(b) > 4 else b, b)

    entries0.append((_TAG_MAKE,) + ascii_entry(0, make)[1:])
    entries0.append((_TAG_MODEL,) + ascii_entry(0, model)[1:])
    entries0.append((_TAG_ORIENTATION, 3, 1,
                     struct.pack("<H", orientation) + b"\x00\x00", b""))
    entries0.append((_TAG_DATETIME,) + ascii_entry(0, datetime_s)[1:])

    gps_block = b""
    if gps is not None:
        lat, lon = gps

        def rat3(v):
            v = abs(v)
            deg = int(v)
            mins = int((v - deg) * 60)
            secs = round(((v - deg) * 60 - mins) * 60 * 1000)
            return struct.pack("<IIIIII", deg, 1, mins, 1, secs, 1000)

        # GPS IFD: 4 entries + next-IFD pointer; rationals follow
        gps_n = 4
        gps_dir_size = 2 + 12 * gps_n + 4
        entries0.append((_TAG_GPS_IFD, 4, 1, None, b""))  # patched below

        def gps_entry(tag, typ, count, val4):
            return struct.pack("<HHI", tag, typ, count) + val4

        lat_ref = (b"N\x00" if lat >= 0 else b"S\x00") + b"\x00\x00"
        lon_ref = (b"E\x00" if lon >= 0 else b"W\x00") + b"\x00\x00"
        gps_payload = rat3(lat) + rat3(lon)
        # value offsets are relative to the TIFF header; patched later
        gps_block = (struct.pack("<H", gps_n)
                     + gps_entry(_GPS_LAT_REF, 2, 2, lat_ref)
                     + gps_entry(_GPS_LAT, 5, 3, b"\x00" * 4)
                     + gps_entry(_GPS_LON_REF, 2, 2, lon_ref)
                     + gps_entry(_GPS_LON, 5, 3, b"\x00" * 4)
                     + struct.pack("<I", 0) + gps_payload)

    n0 = len(entries0)
    dir0_size = 2 + 12 * n0 + 4
    # layout (relative to TIFF header): 8-byte header, IFD0, IFD0
    # overflow payloads, then the GPS IFD + its rationals
    pos = 8 + dir0_size
    payload_pos = {}
    for i, (tag, typ, count, inline, payload) in enumerate(entries0):
        if inline is None and payload:
            payload_pos[i] = pos
            pos += len(payload)
    gps_dir_rel = pos

    tiff = bytearray(b"II*\x00" + struct.pack("<I", 8))
    tiff += struct.pack("<H", n0)
    for i, (tag, typ, count, inline, payload) in enumerate(entries0):
        tiff += struct.pack("<HHI", tag, typ, count)
        if tag == _TAG_GPS_IFD:
            tiff += struct.pack("<I", gps_dir_rel)
        elif inline is not None:
            tiff += inline.ljust(4, b"\x00")
        else:
            tiff += struct.pack("<I", payload_pos[i])
    tiff += struct.pack("<I", 0)  # next IFD
    for i, (tag, typ, count, inline, payload) in enumerate(entries0):
        if inline is None and payload:
            assert len(tiff) == payload_pos[i]
            tiff += payload
    if gps_block:
        assert len(tiff) == gps_dir_rel
        # patch the two rational value offsets inside the GPS dir
        gps_dir_size = 2 + 12 * 4 + 4
        rat_base = gps_dir_rel + gps_dir_size
        block = bytearray(gps_block)
        # entry order: LAT_REF, LAT, LON_REF, LON
        struct.pack_into("<I", block, 2 + 12 * 1 + 8, rat_base)
        struct.pack_into("<I", block, 2 + 12 * 3 + 8, rat_base + 24)
        tiff += block
    body = b"Exif\x00\x00" + bytes(tiff)
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return jpeg[:2] + app1 + jpeg[2:]
