"""Embedded font-program parsing: CFF summary + TrueType glyf walk.

The text path needs two facts from an embedded font program, both
mirrored from the reference:

* ``parse_cff_summary`` — a tolerant CFF reader (header, INDEXes, Top
  DICT, charset). For a CID-keyed CFF (Top DICT has /ROS) the charset
  maps GID -> CID; the key set is exactly the CIDs the font has glyphs
  for, which showHexString uses to *skip* char codes a malformed
  subset references but never defined (reference parseCFFSummary,
  js/font-parser/src/cff.js:1154; consumer js/pdf/parsePdfDoc.js:1884).
* ``truetype_empty_glyphs`` — the set of GIDs whose ``glyf`` entry is
  zero-length (loca[i+1] == loca[i]); used to remap positive-advance
  glyphs whose broken ToUnicode says "control char" to a space when
  the outline is structurally blank (reference
  buildEmptyGlyphSetFromTrueType, js/pdf/fonts/parsePdfFonts.js:126).

Both return None / ok=False on malformed input — crawled-corpus font
programs are routinely truncated and must never take down a document.
"""

from __future__ import annotations

import struct


def _read_index(data: bytes, pos: int):
    """CFF INDEX at ``pos`` -> (list of object byte-slices, end_pos)."""
    count = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise ValueError("bad INDEX offSize")
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size : pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    data_start = pos + (count + 1) * off_size - 1  # offsets are 1-based
    if data_start + offs[count] > len(data):
        raise ValueError("INDEX data extends past the end of the font")
    objs = [data[data_start + offs[i] : data_start + offs[i + 1]]
            for i in range(count)]
    return objs, data_start + offs[count]


def _parse_dict(raw: bytes) -> dict:
    """CFF DICT -> {op_key: [operands]}; two-byte ops keyed 1200+op2."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    n = len(raw)
    while i < n:
        b0 = raw[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                i += 1
                out[1200 + raw[i]] = operands
            else:
                out[b0] = operands
            operands = []
            i += 1
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", raw, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", raw, i + 1)[0])
            i += 5
        elif b0 == 30:  # real number (BCD nibbles)
            i += 1
            s = ""
            done = False
            while i < n and not done:
                for nib in (raw[i] >> 4, raw[i] & 0xF):
                    if nib <= 9:
                        s += chr(48 + nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            try:
                operands.append(float(s or "0"))
            except ValueError:
                operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + raw[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - raw[i + 1] - 108)
            i += 2
        else:
            raise ValueError(f"bad DICT byte {b0}")
    return out


def _parse_cid_charset(data: bytes, pos: int, n_glyphs: int) -> dict:
    """CID charset (formats 0/1/2) -> {cid: gid}; gid 0 is .notdef and
    implicit (reference parseCidCharset, cff.js:1117)."""
    cid_to_gid: dict[int, int] = {}
    fmt = data[pos]
    pos += 1
    gid = 1
    if fmt == 0:
        while gid < n_glyphs:
            cid_to_gid[struct.unpack_from(">H", data, pos)[0]] = gid
            pos += 2
            gid += 1
    elif fmt in (1, 2):
        while gid < n_glyphs:
            first = struct.unpack_from(">H", data, pos)[0]
            pos += 2
            if fmt == 1:
                n_left = data[pos]
                pos += 1
            else:
                n_left = struct.unpack_from(">H", data, pos)[0]
                pos += 2
            for i in range(n_left + 1):
                if gid >= n_glyphs:
                    break
                cid_to_gid[first + i] = gid
                gid += 1
    else:
        raise ValueError(f"bad charset format {fmt}")
    return cid_to_gid


_STD_STRINGS_COUNT = 391  # SIDs below this index the standard strings


def parse_cff_summary(data: bytes) -> dict:
    """Tolerant CFF summary: {ok, is_cid, n_glyphs, cid_to_gid,
    charset_gids}. ``cid_to_gid`` is populated for CID-keyed fonts
    (Top DICT has ROS); ``predefined_charset`` mirrors the reference
    (charset operand 0/1/2 = ISOAdobe/Expert defaults, no explicit
    table)."""
    empty = {"ok": False, "is_cid": False, "n_glyphs": 0,
             "cid_to_gid": None, "predefined_charset": False,
             "charset_names": None, "encoding_map": None}
    try:
        if not data or len(data) < 4 or data[0] != 1:
            return empty
        hdr_size = data[2]
        _names, pos = _read_index(data, hdr_size)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        if not top_dicts:
            return empty
        top = _parse_dict(top_dicts[0])
        is_cid = 1230 in top and len(top[1230]) >= 2  # ROS
        if 17 not in top:  # CharStrings
            return empty
        cs_objs, _ = _read_index(data, int(top[17][0]))
        n_glyphs = len(cs_objs)
        charset_op = int(top[15][0]) if 15 in top else 0
        predefined = charset_op <= 2
        cid_to_gid = None
        charset_names = None
        if is_cid and not predefined:
            cid_to_gid = _parse_cid_charset(data, charset_op, n_glyphs)
        elif not is_cid and not predefined:
            sid_to_gid = _parse_cid_charset(
                data, charset_op, n_glyphs)
            charset_names = {}
            for sid, gid in sid_to_gid.items():
                name = _cff_sid_name(sid, strings)
                if name is not None:
                    charset_names[gid] = name
        encoding_map = None
        enc_op = int(top[16][0]) if 16 in top else 0
        if not is_cid and enc_op > 1:
            encoding_map = _parse_cff_encoding(data, enc_op, n_glyphs)
        return {"ok": True, "is_cid": is_cid, "n_glyphs": n_glyphs,
                "cid_to_gid": cid_to_gid,
                "predefined_charset": predefined,
                "charset_names": charset_names,
                "encoding_map": encoding_map}
    except Exception:
        return empty


# CFF standard strings, SIDs 0-95 (the .notdef + printable-ASCII
# block of the published CFF spec Appendix A table; SIDs 96-390 are
# the Adobe expert/accented set and resolve through AGL rarely in
# text fonts, so they are left unresolved here — custom SIDs >= 391
# come from the font's own string index).
_CFF_STD_STRINGS_96 = (
    ".notdef space exclam quotedbl numbersign dollar percent "
    "ampersand quoteright parenleft parenright asterisk plus comma "
    "hyphen period slash zero one two three four five six seven "
    "eight nine colon semicolon less equal greater question at "
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore "
    "quoteleft a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde"
).split()


def _parse_cff_encoding(data: bytes, pos: int,
                        n_glyphs: int) -> dict[int, int] | None:
    """Custom CFF Encoding (formats 0/1, supplement bit ignored) ->
    {charCode: gid}. GID is the encoding position plus one because
    GID 0 is .notdef and has no encoding entry."""
    fmt = data[pos] & 0x7F
    out: dict[int, int] = {}
    if fmt == 0:
        n_codes = data[pos + 1]
        for i in range(min(n_codes, n_glyphs - 1)):
            out[data[pos + 2 + i]] = i + 1
    elif fmt == 1:
        n_ranges = data[pos + 1]
        gid = 1
        for r in range(n_ranges):
            first = data[pos + 2 + r * 2]
            n_left = data[pos + 3 + r * 2]
            for i in range(n_left + 1):
                if gid >= n_glyphs or first + i > 255:
                    break
                out[first + i] = gid
                gid += 1
    else:
        return None
    return out or None


def _cff_sid_name(sid: int, strings: list[bytes]) -> str | None:
    if 0 <= sid < len(_CFF_STD_STRINGS_96):
        return _CFF_STD_STRINGS_96[sid]
    if sid >= 391 and sid - 391 < len(strings):
        return strings[sid - 391].decode("latin-1", "replace")
    return None


# ------------------------------------------------------------- TrueType

def _sfnt_tables(data: bytes) -> dict[str, tuple[int, int]]:
    """sfnt table directory -> {tag: (offset, length)}."""
    ver = data[:4]
    if ver not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
        raise ValueError("not sfnt")
    num = struct.unpack_from(">H", data, 4)[0]
    tables = {}
    for i in range(num):
        tag, _csum, off, length = struct.unpack_from(
            ">4sIII", data, 12 + 16 * i)
        tables[tag.decode("latin-1")] = (off, length)
    return tables


def truetype_empty_glyphs(data: bytes) -> set[int] | None:
    """GIDs whose glyf entry is zero-length, via the loca table
    (indexToLocFormat from head, numGlyphs from maxp)."""
    try:
        t = _sfnt_tables(data)
        if not all(k in t for k in ("glyf", "loca", "head", "maxp")):
            return None
        head_off = t["head"][0]
        idx_fmt = struct.unpack_from(">H", data, head_off + 50)[0]
        num_glyphs = struct.unpack_from(">H", data, t["maxp"][0] + 4)[0]
        loca = t["loca"][0]
        empty = set()
        for gid in range(num_glyphs):
            if idx_fmt == 0:
                a = struct.unpack_from(">H", data, loca + gid * 2)[0] * 2
                b = struct.unpack_from(">H", data, loca + gid * 2 + 2)[0] * 2
            else:
                a = struct.unpack_from(">I", data, loca + gid * 4)[0]
                b = struct.unpack_from(">I", data, loca + gid * 4 + 4)[0]
            if a == b:
                empty.add(gid)
        return empty
    except Exception:
        return None


# ------------------------------------------------------------- cmap

def _cmap_format0(data: bytes, off: int) -> dict[int, int]:
    # 256 byte-indexed gids
    return {c: data[off + 6 + c] for c in range(256)
            if data[off + 6 + c] != 0}


def _cmap_format4(data: bytes, off: int) -> dict[int, int]:
    seg_x2 = struct.unpack_from(">H", data, off + 6)[0]
    n_seg = seg_x2 // 2
    ends = struct.unpack_from(f">{n_seg}H", data, off + 14)
    starts = struct.unpack_from(f">{n_seg}H", data, off + 16 + seg_x2)
    deltas = struct.unpack_from(
        f">{n_seg}h", data, off + 16 + 2 * seg_x2)
    ro_base = off + 16 + 3 * seg_x2
    offsets = struct.unpack_from(f">{n_seg}H", data, ro_base)
    out: dict[int, int] = {}
    for i in range(n_seg):
        start, end = starts[i], ends[i]
        if start == 0xFFFF:
            continue
        for c in range(start, end + 1):
            if offsets[i] == 0:
                gid = (c + deltas[i]) & 0xFFFF
            else:
                p = ro_base + 2 * i + offsets[i] + 2 * (c - start)
                if p + 2 > len(data):
                    continue
                gid = struct.unpack_from(">H", data, p)[0]
                if gid != 0:
                    gid = (gid + deltas[i]) & 0xFFFF
            if gid != 0:
                out[c] = gid
    return out


def _cmap_format6(data: bytes, off: int) -> dict[int, int]:
    first, count = struct.unpack_from(">HH", data, off + 6)
    gids = struct.unpack_from(f">{count}H", data, off + 10)
    return {first + i: g for i, g in enumerate(gids) if g != 0}


def _cmap_format12(data: bytes, off: int) -> dict[int, int]:
    n_groups = struct.unpack_from(">I", data, off + 12)[0]
    out: dict[int, int] = {}
    p = off + 16
    for _ in range(min(n_groups, 1 << 16)):  # allocation guard
        start, end, start_gid = struct.unpack_from(">III", data, p)
        p += 12
        span = min(end - start, 1 << 16)
        for i in range(span + 1):
            out[start + i] = start_gid + i
        if len(out) > (1 << 20):  # crafted-table allocation bomb
            break
    return out


_CMAP_PARSERS = {0: _cmap_format0, 4: _cmap_format4,
                 6: _cmap_format6, 12: _cmap_format12}


def truetype_code_to_gid(data: bytes) -> dict[int, int] | None:
    """Unicode/charCode -> GID from the best cmap subtable, with the
    reference's selection priority (font-parser opentype.js
    parseCmapTable): platform 3 (enc 0/1/10) > platform 0 (enc 0-4,6)
    > platform 1 enc 0, last subtable of the winning tier; formats
    0/4/6/12. Platform-1 byte codes 0x80+ are re-keyed to their
    MacRoman Unicode targets like the reference's eightBitMacEncodings
    pass."""
    try:
        t = _sfnt_tables(data)
        if "cmap" not in t:
            return None
        base = t["cmap"][0]
        n_tables = struct.unpack_from(">H", data, base + 2)[0]
        best = None
        best_prio = -1
        for i in range(n_tables - 1, -1, -1):
            plat, enc, sub_off = struct.unpack_from(
                ">HHI", data, base + 4 + 8 * i)
            if plat == 3 and enc in (0, 1, 10):
                prio = 2
            elif plat == 0 and enc in (0, 1, 2, 3, 4, 6):
                prio = 1
            elif plat == 1 and enc == 0:
                prio = 0
            else:
                continue
            if prio <= best_prio:
                continue
            best = (plat, enc, base + sub_off)
            best_prio = prio
        if best is None:
            return None
        plat, enc, off = best
        fmt = struct.unpack_from(">H", data, off)[0]
        parser = _CMAP_PARSERS.get(fmt)
        if parser is None:
            return None
        m = parser(data, off)
        if plat == 1:
            for c in range(0x80, 0x100):
                if c in m:
                    u = ord(bytes((c,)).decode("mac_roman"))
                    m.setdefault(u, m[c])
        return m or None
    except Exception:
        return None


def truetype_gid_to_unicode(data: bytes) -> dict[int, int] | None:
    """Reverse GID -> Unicode map for CIDFontType2 + Identity-H where
    CIDs are GIDs (parsePdfFonts.js buildGidToUnicodeFromTrueType:76):
    lowest codepoint wins per gid, gid 0 excluded."""
    m = truetype_code_to_gid(data)
    if not m:
        return None
    out: dict[int, int] = {}
    for code in sorted(m):
        gid = m[code]
        if gid > 0 and gid not in out:
            out[gid] = code
    return out
