"""Minimal text-native PDF writer for the fixture layout model.

From-scratch PDF 1.4 with a classic xref table (FIXTURES.md §2.6). One
WinAnsi /Type1 Helvetica font with explicit /Widths (constant 500/1000
em -> a 30pt glyph advances exactly CHAR_W=15 units). Variants cycle by
doc_id so every parser path is exercised:

- stream mode: raw / FlateDecode (doc_id % 2)
- positioning: absolute ``Tm`` per word, or one ``Tm`` per line with a
  TJ array carrying kerning adjustments for the inter-word gaps
  (doc_id % 3 == 2)
- ligatures: words containing "fi" encode it as custom code 0x8E with a
  /Differences entry and a ToUnicode CMap to U+FB01 — extraction must
  restore "fi" via ligature decomposition (doc_id % 5 == 2)
- rotation: /Rotate 90 with content written in rotated user space
  (doc_id % 7 == 3)
"""

from __future__ import annotations

import zlib

from .fixtures import CHAR_W

FONT_SIZE = 30  # 500/1000 em * 30 = 15 = CHAR_W
LIG_CODE = 142  # 0x8E -> /fi -> U+FB01
GAP_ADJ = -(10 / FONT_SIZE) * 1000  # TJ kerning units for the 10px word gap


def _std_advance(text: str, ligatures: bool) -> float:
    """True Helvetica AFM advance of a fixture word in glyph-space
    units, for the std_widths variant (no /Widths declared; the reader
    must supply the built-in metrics)."""
    from .operators.pdf.afm import STANDARD_WIDTHS

    helv = STANDARD_WIDTHS["Helvetica"]
    if ligatures and "fi" in text:
        text = text.replace("fi", chr(LIG_CODE))
    total = 0.0
    for c in text:
        if ord(c) == LIG_CODE:
            total += 500.0  # AFM fi ligature advance
            continue
        try:
            b = c.encode("cp1252")[0]
        except UnicodeEncodeError:
            b = 0
        total += float(helv[b - 32]) if 32 <= b <= 255 else 500.0
    return total


def _esc(s: str) -> str:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ord(ch) > 126:
            # WinAnsi (cp1252) byte, not the Unicode codepoint — e.g.
            # '”' is \224 under /WinAnsiEncoding
            try:
                code = ch.encode("cp1252")[0]
            except UnicodeEncodeError:
                code = ord(ch) & 0xFF
            out.append(f"\\{code:03o}")
        else:
            out.append(ch)
    return "".join(out)


class _Writer:
    def __init__(self):
        self.objects: list[bytes] = []
        self.trailer_extra = ""

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def build(self) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(self.objects, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_pos = len(out)
        out += f"xref\n0 {len(self.objects) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(self.objects) + 1} /Root 1 0 R "
            f"{self.trailer_extra}>>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
        return bytes(out)

    def build_xref_stream(self, objstm_members: dict[int, int]) -> bytes:
        """PDF 1.5 layout: cross-reference *stream* instead of a classic
        table; objects listed in ``objstm_members`` (objnum -> index)
        live inside an object stream and get type-2 entries.

        Members must already be packed into the ObjStm object; their
        slots in self.objects are placeholders (None).
        """
        objstm_num = next(
            i for i, body in enumerate(self.objects, start=1)
            if body is not None and body.startswith(b"<< /Type /ObjStm"))
        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for i, body in enumerate(self.objects, start=1):
            if body is None:
                continue
            offsets[i] = len(out)
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"

        xref_num = len(self.objects) + 1
        size = xref_num + 1
        rows = bytearray()
        # entry 0: free
        rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for objnum in range(1, xref_num):
            if objnum in objstm_members:
                rows += bytes([2]) + objstm_num.to_bytes(4, "big") \
                    + objstm_members[objnum].to_bytes(2, "big")
            else:
                rows += bytes([1]) + offsets[objnum].to_bytes(4, "big") \
                    + (0).to_bytes(2, "big")
        # the xref stream object itself
        xref_pos = len(out)
        rows += bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
        data = zlib.compress(bytes(rows))
        out += (
            f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
            f"/Root 1 0 R /Filter /FlateDecode /Length {len(data)} "
            f">>\nstream\n").encode() + data + b"\nendstream\nendobj\n"
        out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
        return bytes(out)


_TOUNICODE = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Custom def
1 begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfchar
<8E> <FB01>
endbfchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


_TOUNICODE_BROKEN = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Custom def
1 begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfrange
<61> <7A> <E000>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


_TOUNICODE_CID = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Custom def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0020> <007E> <0020>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def _tounicode_ranges(codes: list[int]) -> bytes:
    """Identity ToUnicode CMap covering exactly ``codes`` (sorted),
    emitted as maximal contiguous bfranges."""
    ranges: list[list[int]] = []
    for c in codes:
        if ranges and c == ranges[-1][1] + 1:
            ranges[-1][1] = c
        else:
            ranges.append([c, c])
    body = "\n".join(f"<{a:04X}> <{b:04X}> <{a:04X}>" for a, b in ranges)
    return (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "/CMapName /Custom def\n1 begincodespacerange\n<0000> <FFFF>\n"
        f"endcodespacerange\n{len(ranges)} beginbfrange\n{body}\n"
        "endbfrange\nendcmap\nCMapName currentdict /CMap defineresource "
        "pop\nend\nend").encode("latin-1")


def _apply_encryption(w: "_Writer", mode: str, doc_id: int) -> None:
    """Encrypt every stream payload in the writer and append the
    /Encrypt dict + trailer entries. ``mode``: 'rc4_40' (V1/R2),
    'rc4_128' (V2/R3), 'aesv2' (V4/R4), 'aesv3' (V5/R6). Owner
    password 'owner', empty user password (the standard
    permissions-only encryption the parser supports)."""
    import hashlib
    import re as _re

    from .operators.pdf import crypto as C

    doc_id_bytes = hashlib.md5(f"encfix{doc_id}".encode()).digest()
    enc_objnum = len(w.objects) + 1
    perms = -44

    if mode == "aesv3":
        file_key = (hashlib.md5(doc_id_bytes).digest()
                    + hashlib.md5(doc_id_bytes[::-1]).digest())
        vs, ks = doc_id_bytes[:8], doc_id_bytes[8:16]
        u_val = C.hash_r6(b"", vs, b"") + vs + ks
        inter = C.hash_r6(b"", ks, b"")
        ue = C.aes_cbc_encrypt(inter, b"\x00" * 16, file_key)
        key = file_key
        enc_dict = (
            f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {perms} "
            f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/U <{u_val.hex()}> /UE <{ue.hex()}> >>")
    else:
        r, v, keylen = {"rc4_40": (2, 1, 5), "rc4_128": (3, 2, 16),
                        "aesv2": (4, 4, 16)}[mode]
        owner_pad = (b"owner" + C.PASSWORD_PADDING)[:32]
        okey = hashlib.md5(owner_pad).digest()
        if r >= 3:
            for _ in range(50):
                okey = hashlib.md5(okey[:keylen]).digest()
        okey = okey[:keylen]
        o_val = C.rc4(okey, C.PASSWORD_PADDING)  # empty user pwd padded
        if r >= 3:
            for i in range(1, 20):
                o_val = C.rc4(bytes(b ^ i for b in okey), o_val)
        key = C.compute_encryption_key(
            b"", o_val, perms, doc_id_bytes, keylen, r, True)
        # /U is not validated for V<5 (empty user password assumed)
        u_val = b"\x00" * 32
        extra = ""
        if v == 4:
            extra = ("/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                     "/StmF /StdCF /StrF /StdCF ")
        enc_dict = (
            f"<< /Filter /Standard /V {v} /R {r} /Length {keylen * 8} "
            f"/P {perms} {extra}/O <{o_val.hex()}> /U <{u_val.hex()}> >>")

    def cipher(data: bytes, objnum: int) -> bytes:
        if mode in ("aesv2", "aesv3"):
            k = (key if mode == "aesv3"
                 else C.compute_object_key(key, objnum, 0, True))
            iv = hashlib.md5(f"iv{objnum}".encode()).digest()
            pad = 16 - len(data) % 16
            return iv + C.aes_cbc_encrypt(k, iv, data + bytes([pad]) * pad)
        return C.rc4(C.compute_object_key(key, objnum, 0, False), data)

    marker = b">>\nstream\n"
    new_objects = []
    for i, body in enumerate(w.objects, start=1):
        pos = body.find(marker)
        if pos == -1:
            new_objects.append(body)
            continue
        payload = body[pos + len(marker):body.rfind(b"\nendstream")]
        enc = cipher(payload, i)
        head = _re.sub(rb"/Length \d+", b"/Length %d" % len(enc),
                       body[:pos], count=1)
        new_objects.append(head + marker + enc + b"\nendstream")
    w.objects = new_objects
    w.add(enc_dict.encode())
    # += so an /Info ref emitted earlier survives (real encrypted PDFs
    # keep their document-information dictionary).
    w.trailer_extra += (
        f"/Encrypt {enc_objnum} 0 R "
        f"/ID [<{doc_id_bytes.hex()}> <{doc_id_bytes.hex()}>] ")


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Variable-width LZW encoder (fixture side of LZWDecode): emits a
    clear code first, EOD last, widths 9->12 growing one entry early
    with EarlyChange (the PDF default)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, bits: int):
        nonlocal acc, nbits
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_bits = 9
    put(256, code_bits)  # clear
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        put(table[seq], code_bits)
        table[cand] = next_code
        next_code += 1
        if (next_code + early_change > (1 << code_bits)
                and code_bits < 12):
            code_bits += 1
        if next_code >= 4096 - 1:
            put(256, code_bits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_bits = 9
        seq = bytes([byte])
    if seq:
        put(table[seq], code_bits)
    put(257, code_bits)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """RunLengthDecode inverse: runs >= 3 as repeats, rest literal."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    out.append(128)  # EOD
    return bytes(out)


def render_pdf(model: dict, compress: bool | None = None,
               tj_mode: bool | None = None,
               ligatures: bool | None = None,
               rotate: bool | None = None,
               invisible: bool = False,
               xref_stream: bool | None = None,
               hex_strings: bool | None = None,
               cid_font: bool | None = None,
               outline: bool = False,
               sup_markers: bool = False,
               form_xobject: bool = False,
               encrypt_mode: str | None = None,
               cff_subset: dict | None = None,
               stream_filter: str | None = None,
               std_widths: bool = False,
               cid_tounicode: bool = True,
               cid_cmap: str | None = None,
               cid_gidmap: bool = False) -> bytes:
    doc_id = model.get("doc_id", 0)
    if compress is None:
        compress = (doc_id % 2) == 1
    if tj_mode is None:
        tj_mode = (doc_id % 3) == 2
    if ligatures is None:
        ligatures = (doc_id % 5) == 2
    if rotate is None:
        rotate = (doc_id % 7) == 3
    if xref_stream is None:
        xref_stream = (doc_id % 11) == 4
    if encrypt_mode:
        xref_stream = False  # encrypted fixtures use the classic table
    if hex_strings is None:
        hex_strings = (doc_id % 13) == 5
    if cff_subset is not None:
        cid_font = True  # the subset font is a CID-keyed CFF
    if cid_gidmap:
        # CIDFontType2 with codes that are GIDs (NOT codepoints), no
        # /ToUnicode: extraction is correct only through the embedded
        # TrueType cmap's GID->Unicode reverse map
        # (parsePdfFonts.js buildGidToUnicodeFromTrueType:76).
        cid_font = True
        cid_tounicode = False
    gid_of: dict[str, int] = {}
    if cid_gidmap:
        chars = sorted({c for p in model["pages"]
                        for par in p["pars"]
                        for line in par["lines"]
                        for w0 in line["words"]
                        for c in (w0["text"] + "".join(
                            s.get("text", "") for s in
                            (w0.get("segments") or [])))})
        gid_of = {c: i + 2 for i, c in enumerate(chars)}
    if cid_font is None:
        cid_font = (doc_id % 17) == 6
    if cid_font:
        ligatures = False  # CID path encodes 2-byte Identity-H codes
    if std_widths and (cid_font or sup_markers):
        raise ValueError("std_widths needs the simple Helvetica font "
                         "and grid-free word placement")
    if form_xobject and outline:
        raise ValueError("form_xobject and outline variants are mutually "
                         "exclusive (object numbering)")

    w = _Writer()
    page_w = model["pages"][0]["width"]
    page_h = model["pages"][0]["height"]
    n_pages = len(model["pages"])
    use_bold_font = bool(model.get("use_bold_font"))
    use_math_font = bool(model.get("use_math_font"))
    any_scan = any(p.get("scan_image") for p in model["pages"])
    any_broken = any(p.get("broken_font") for p in model["pages"])
    any_annots = any(p.get("annots") for p in model["pages"])
    struct_tags = bool(model.get("struct_tags"))
    has_info = bool(model.get("producer") or model.get("creator"))
    if (use_bold_font or use_math_font or any_scan or any_broken
            or any_annots or struct_tags
            or any(p.get("type3_font") for p in model["pages"])) \
            and (outline or form_xobject):
        raise ValueError("extra-object variants conflict with outline/"
                         "form_xobject object numbering")

    # objects: 1=Catalog 2=Pages 3=Font 4=Descriptor
    # [5=ToUnicode] [6=CID descendant font] [7=FontFile3 CFF]
    # then per page: page + content.
    if cff_subset is not None or cid_gidmap:
        n_fixed = 7
    elif cid_font:
        n_fixed = 6
    elif ligatures:
        n_fixed = 5
    else:
        n_fixed = 4
    kids = " ".join(f"{n_fixed + 1 + 2 * i} 0 R" for i in range(n_pages))
    _next_extra = n_fixed + 2 * n_pages
    f2_num = img_num = f3_tu_num = f3_num = None
    if use_bold_font:
        _next_extra += 1
        f2_num = _next_extra
    f5_num = None
    if use_math_font:
        _next_extra += 1
        f5_num = _next_extra
    if any_scan:
        _next_extra += 1
        img_num = _next_extra
    if any_broken:
        f3_tu_num = _next_extra + 1
        f3_num = _next_extra + 2
        _next_extra += 2
    any_type3 = any(p.get("type3_font") for p in model["pages"])
    t3: dict = {}
    if any_type3:
        # Two Type3 fonts + shared CharProc streams: /F6 has four
        # charCodes stamped with ONE filler outline (PUA-mapped) plus
        # three real glyphs (clean mappings) — broken only if the
        # filler discount is missing; /F7 has three distinct PUA-mapped
        # glyphs — genuinely broken.
        for i, key in enumerate(("tu_a", "font_a", "tu_b", "font_b",
                                 "proc_f", "proc_a", "proc_b", "proc_c")):
            t3[key] = _next_extra + 1 + i
        _next_extra += 8
    annot_nums = {}
    for _pn, _p in enumerate(model["pages"]):
        nums = []
        for _ in _p.get("annots", []):
            _next_extra += 1
            nums.append(_next_extra)
        annot_nums[_pn] = nums
    struct_root_num = parent_tree_num = info_num = None
    struct_elem_nums = {}
    if struct_tags:
        struct_root_num = _next_extra + 1
        parent_tree_num = _next_extra + 2
        _next_extra += 2
        for _pn, _p in enumerate(model["pages"]):
            nums = []
            for _ in _p["pars"]:
                _next_extra += 1
                nums.append(_next_extra)
            struct_elem_nums[_pn] = nums
    if has_info:
        _next_extra += 1
        info_num = _next_extra
    if outline:
        outlines_num = n_fixed + 2 * n_pages + 1
        w.add(
            f"<< /Type /Catalog /Pages 2 0 R /Outlines {outlines_num} 0 R "
            f"/Names << /Dests << /Names [(last) [{n_fixed + 1 + 2 * (n_pages - 1)}"
            f" 0 R /XYZ null null null]] >> >> >>".encode())
    else:
        cat_extra = (f"/StructTreeRoot {struct_root_num} 0 R "
                     f"/MarkInfo << /Marked true >> "
                     if struct_tags else "")
        w.add(f"<< /Type /Catalog /Pages 2 0 R {cat_extra}>>".encode())
    if rotate:
        # MediaBox in unrotated user space; /Rotate 90 swaps the view.
        media = f"/MediaBox [0 0 {page_h} {page_w}]"
    else:
        media = f"/MediaBox [0 0 {page_w} {page_h}]"
    w.add(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} {media} >>".encode())
    if cff_subset is not None:
        # Malformed-subset family: the content stream references CIDs
        # the embedded CID-keyed CFF never defines (``drop``), and
        # leaves some defined CIDs out of ToUnicode (``unmapped``) —
        # exercising the validCIDs skip and the chr(code) fallback.
        from .render_fonts import build_cff_cid

        drop = set(cff_subset.get("drop", ()))
        unmapped = set(cff_subset.get("unmapped", ()))
        charset_cids = sorted(set(range(0x20, 0x7F)) - drop)
        tounicode = _tounicode_ranges(
            sorted(set(range(0x20, 0x7F)) - drop - unmapped))
        cff = build_cff_cid(charset_cids)
        w.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCFF "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 5 0 R >>")
        w.add(
            b"<< /Type /FontDescriptor /FontName /SynthCFF /Flags 32 "
            b"/Ascent 718 /Descent -207 /CapHeight 718 /ItalicAngle 0 "
            b"/StemV 88 /FontBBox [-166 -225 1000 931] "
            b"/FontFile3 7 0 R >>")
        w.add(
            f"<< /Length {len(tounicode)} >>\nstream\n".encode()
            + tounicode + b"\nendstream")
        w.add(
            b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /SynthCFF "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /FontDescriptor 4 0 R /DW 1000 "
            b"/W [32 126 500] >>")
        w.add(
            f"<< /Length {len(cff)} /Subtype /CIDFontType0C >>\nstream\n"
            .encode() + cff + b"\nendstream")
    elif cid_gidmap:
        from .render_fonts import build_truetype_blank

        n_glyphs = max(gid_of.values(), default=1) + 1
        tt = build_truetype_blank(
            n_glyphs, set(),
            cmap={ord(c): g for c, g in gid_of.items()})
        w.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthGID "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
        w.add(
            b"<< /Type /FontDescriptor /FontName /SynthGID /Flags 32 "
            b"/Ascent 718 /Descent -207 /CapHeight 718 /ItalicAngle 0 "
            b"/StemV 88 /FontBBox [-166 -225 1000 931] "
            b"/FontFile2 7 0 R >>")
        # Unreferenced placeholder keeps the object numbering shared
        # with the other CID variants.
        w.add(b"<< /Length 0 >>\nstream\n\nendstream")
        w.add(
            b"<< /Type /Font /Subtype /CIDFontType2 "
            b"/BaseFont /SynthGID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering "
            b"(Identity) /Supplement 0 >> /FontDescriptor 4 0 R "
            + f"/DW 1000 /W [2 {n_glyphs - 1} 500] >>".encode())
        w.add(
            f"<< /Length {len(tt)} >>\nstream\n".encode()
            + tt + b"\nendstream")
    elif cid_font:
        if cid_cmap == "rksj":
            # Predefined Shift-JIS CMap, no ToUnicode: extraction
            # needs the mixed 1/2-byte codespace split + the charset
            # decode (parsePdfFonts.js:906-936); a uniform 2-byte read
            # garbles every 1-byte ASCII code.
            w.add(
                b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
                b"/Encoding /90ms-RKSJ-H /DescendantFonts [6 0 R] >>")
        elif cid_tounicode:
            w.add(
                b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
                b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
                b"/ToUnicode 5 0 R >>")
        else:
            # No /ToUnicode: extraction must take the Identity
            # CIDs-as-codepoints fallback (parsePdfDoc.js:1885); the
            # CMap object stays written (unreferenced) so numbering
            # holds. The descendant below is CIDFontType0 for this
            # variant: a non-embedded CIDFontType2 with /W keys below
            # 258 takes the reference's Mac-standard-glyph-order
            # recovery instead (parsePdfFonts.js:1859-1869), which is
            # NOT the behavior this family drives.
            w.add(
                b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
                b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>")
        w.add(
            b"<< /Type /FontDescriptor /FontName /SynthCID /Flags 32 "
            b"/Ascent 718 /Descent -207 /CapHeight 718 /ItalicAngle 0 "
            b"/StemV 88 /FontBBox [-166 -225 1000 931] >>")
        w.add(
            f"<< /Length {len(_TOUNICODE_CID)} >>\nstream\n".encode()
            + _TOUNICODE_CID + b"\nendstream")
        if cid_cmap == "rksj":
            # every 2-byte Shift-JIS code advances /DW; 1-byte ASCII
            # keys the code-equal /W range, matching the 500-em grid
            w.add(
                b"<< /Type /Font /Subtype /CIDFontType2 "
                b"/BaseFont /SynthCID "
                b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1)"
                b" /Supplement 2 >> /FontDescriptor 4 0 R /DW 500 "
                b"/W [32 126 500] >>")
        else:
            desc_sub = (b"CIDFontType2" if cid_tounicode
                        else b"CIDFontType0")
            w.add(
                b"<< /Type /Font /Subtype /" + desc_sub +
                b" /BaseFont /SynthCID "
                b"/CIDSystemInfo << /Registry (Adobe) /Ordering "
                b"(Identity) /Supplement 0 >> /FontDescriptor 4 0 R "
                b"/DW 1000 /W [32 126 500] >>")
    else:
        last_char = LIG_CODE if ligatures else 126
        widths = ["500"] * (last_char + 1 - 32)
        if ligatures:
            widths[LIG_CODE - 32] = "1000"
        if std_widths:
            # No /Widths at all: a conforming reader must supply the
            # built-in Helvetica AFM metrics (fonts.py
            # _apply_standard_metrics); word positions below are laid
            # out with the same real advances, so extraction is
            # byte-identical only if the fallback is applied.
            font = ("<< /Type /Font /Subtype /Type1 /BaseFont "
                    "/Helvetica /FontDescriptor 4 0 R ")
        else:
            font = (
                f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                f"/FirstChar 32 /LastChar {last_char} "
                f"/Widths [{' '.join(widths)}] /FontDescriptor 4 0 R ")
        if ligatures:
            font += ("/Encoding << /Type /Encoding /BaseEncoding "
                     "/WinAnsiEncoding /Differences [142 /fi] >> "
                     "/ToUnicode 5 0 R ")
        else:
            font += "/Encoding /WinAnsiEncoding "
        w.add((font + ">>").encode())
        w.add(
            b"<< /Type /FontDescriptor /FontName /Helvetica /Flags 32 "
            b"/Ascent 718 /Descent -207 /CapHeight 718 /ItalicAngle 0 "
            b"/StemV 88 /FontBBox [-166 -225 1000 931] >>")
        if ligatures:
            w.add(
                f"<< /Length {len(_TOUNICODE)} >>\nstream\n".encode()
                + _TOUNICODE + b"\nendstream")

    def show_str(text: str) -> str:
        if cid_font:
            if cid_cmap == "rksj":
                return "<" + text.encode("cp932").hex().upper() + ">"
            if cid_gidmap:
                return "<" + "".join(
                    f"{gid_of[c]:04X}" for c in text) + ">"
            return "<" + "".join(f"{ord(c):04X}" for c in text) + ">"
        if ligatures and "fi" in text:
            text = text.replace("fi", chr(LIG_CODE))
        if hex_strings:
            # raw codes stay raw (the ligature slot 0x8E); chars above
            # U+00FF take their WinAnsi (cp1252) byte, e.g. '”' -> 0x94
            raw = bytearray()
            for c in text:
                o = ord(c)
                raw += bytes([o]) if o <= 0xFF else c.encode("cp1252")
            return "<" + raw.hex().upper() + ">"
        return "(" + _esc(text) + ")"

    def _rect_ops(page):
        """Underline bars under flagged words + page-wide separator
        rules, drawn as thin filled rectangles (re/f paths)."""
        ops = []
        if rotate:
            return ops
        for par in page["pars"]:
            for line in par["lines"]:
                y_base = page_h - line["baseline_y"]
                for word in line["words"]:
                    if word.get("underline"):
                        ops.append(
                            f"{word['left']} {y_base - 4} "
                            f"{word['right'] - word['left']} 1.5 re f")
        for band in page.get("row_bands", []):
            # light-gray cell/stripe backgrounds (row-band tables):
            # one filled rect per cell, restored to black afterwards
            h_band = band["bottom"] - band["top"]
            for x0, x1 in band["cells"]:
                ops.append(
                    f"0.9 g {x0} {page_h - band['bottom']} "
                    f"{x1 - x0} {h_band} re f 0 g")
        for rule in page.get("rules", []):
            ops.append(
                f"{rule['left']} {page_h - rule['y']} "
                f"{rule['right'] - rule['left']} 1 re f")
        for vr in page.get("vrules", []):
            ops.append(
                f"{vr['x']} {page_h - vr['bottom']} "
                f"1 {vr['bottom'] - vr['top']} re f")
        for grid in page.get("table_grids", []):
            xs, ys = grid["col_xs"], grid["row_ys"]
            if grid.get("dashed"):
                # dashed borders as individual short stroked segments
                # (8 pt dashes, 1 pt gaps) — the shape
                # reconstituteDashedLines rebuilds
                for gy in ys:
                    x = xs[0]
                    while x < xs[-1]:
                        x2 = min(x + 8, xs[-1])
                        ops.append(f"{x} {page_h - gy} m "
                                   f"{x2} {page_h - gy} l S")
                        x = x2 + 1
                for gx in xs:
                    yy = ys[0]
                    while yy < ys[-1]:
                        y2 = min(yy + 8, ys[-1])
                        ops.append(f"{gx} {page_h - y2} m "
                                   f"{gx} {page_h - yy} l S")
                        yy = y2 + 1
                continue
            if grid.get("cell_rects"):
                # per-cell stroked rectangles (re S): adjacent cells
                # share their borders — the shape extractGridSegments
                # decomposes into grid lines edge by edge
                for ri in range(len(ys) - 1):
                    for c in range(len(xs) - 1):
                        w_c = xs[c + 1] - xs[c]
                        h_c = ys[ri + 1] - ys[ri]
                        ops.append(
                            f"{xs[c]} {page_h - ys[ri + 1]} "
                            f"{w_c} {h_c} re S")
                continue
            if grid.get("segmented"):
                # per-cell border segments, no verticals: each row rule
                # breaks at interior column boundaries (6 px gaps) —
                # the shape detectSegmentedHLineTables reassembles
                for gy in ys:
                    for c in range(len(xs) - 1):
                        x0 = xs[c] + (3 if c > 0 else 0)
                        x1 = xs[c + 1] - (3 if c < len(xs) - 2 else 0)
                        ops.append(
                            f"{x0} {page_h - gy} {x1 - x0} 0.8 re f")
                continue
            for gy in ys:  # horizontal rules span the columns
                ops.append(
                    f"{xs[0]} {page_h - gy} {xs[-1] - xs[0]} 0.8 re f")
            for gx in xs:  # vertical rules span the rows
                ops.append(
                    f"{gx} {page_h - ys[-1]} 0.8 {ys[-1] - ys[0]} re f")
        return ops

    for page_n, page in enumerate(model["pages"]):
        content = []
        scan = page.get("scan_image")
        if scan:
            fx, fy = (scan if isinstance(scan, (list, tuple))
                      else (scan, scan))
            content.append(
                f"q {page_w * fx} 0 0 {page_h * fy} 0 "
                f"{page_h * (1 - fy)} cm /Im1 Do Q")
        content += ["BT", f"/F1 {FONT_SIZE} Tf"]
        deferred_ops = []
        if invisible or page.get("invisible_text"):
            content.append("3 Tr")
        for par_idx, par in enumerate(page["pars"]):
            if struct_tags:
                role = par.get("struct_role", "Para")
                content.append(f"/{role} << /MCID {par_idx} >> BDC")
            for line in par["lines"]:
                y_pdf = page_h - line["baseline_y"]
                if rotate:
                    # rotated user space: Tm = [0 -1 1 0 tx ty] with
                    # tx = H - baseline_y, ty = W_box - left
                    # (W_box = page_w since the box is [0 0 H W]).
                    def tm_for(x_left):
                        return (f"0 -1 1 0 {page_h - line['baseline_y']} "
                                f"{page_w - x_left} Tm")
                else:
                    def tm_for(x_left):
                        return f"1 0 0 1 {x_left} {y_pdf} Tm"
                std_x = None
                if std_widths:
                    # Real-metric word placement: each word starts where
                    # the previous one's true Helvetica advance ends,
                    # plus the fixture's 10px inter-word gap. A reader
                    # substituting flat widths for the omitted /Widths
                    # computes wrong word ends and merges/garbles words.
                    x = float(line["words"][0]["left"])
                    std_x = []
                    for word in line["words"]:
                        if word.get("segments") or word.get("deferred"):
                            raise ValueError("std_widths cannot place "
                                             "segmented/deferred words")
                        std_x.append(x)
                        x += (_std_advance(word["text"], ligatures)
                              * FONT_SIZE / 1000.0 + 10.0)
                if tj_mode:
                    content.append(tm_for(line["words"][0]["left"]))
                    parts = []
                    for w_i, word in enumerate(line["words"]):
                        if w_i > 0:
                            if std_widths:
                                gap = 10.0
                            else:
                                gap = (word["left"]
                                       - line["words"][w_i - 1]["right"])
                            parts.append(f"{-(gap / FONT_SIZE) * 1000:.6f}")
                        parts.append(show_str(word["text"]))
                    content.append(f"[{' '.join(parts)}] TJ")
                else:
                    for w_i, word in enumerate(line["words"]):
                        if word.get("segments") or word.get("deferred"):
                            # per-segment font size/bold runs, optionally
                            # emitted at the END of the page content
                            # (out-of-stream-order chars for the orphan /
                            # reattach grouping rules)
                            target = (deferred_ops if word.get("deferred")
                                      else content)
                            segs = word.get("segments") or [
                                {"text": word["text"], "fs": FONT_SIZE}]
                            x = word["left"]
                            wy = page_h - word.get(
                                "baseline_y", line["baseline_y"])
                            for seg in segs:
                                fkey = seg.get("fkey") or (
                                    "/F2" if seg.get("bold") else "/F1")
                                target.append(
                                    f"{fkey} {seg['fs']} Tf "
                                    f"1 0 0 1 {x} {wy} Tm "
                                    f"{show_str(seg['text'])} Tj")
                                x += 0.5 * seg["fs"] * len(seg["text"])
                            target.append(f"/F1 {FONT_SIZE} Tf")
                            continue
                        content.append(
                            f"{tm_for(std_x[w_i] if std_x is not None else word['left'])} "
                            f"{show_str(word['text'])} Tj")
                        if (sup_markers and w_i == 0
                                and line is par["lines"][0]
                                and not rotate):
                            # raised smaller footnote marker '9' right
                            # after the paragraph's first word
                            content.append(
                                f"/F1 18 Tf 1 0 0 1 {word['right'] + 2} "
                                f"{y_pdf + 10} Tm {show_str('9')} Tj "
                                f"/F1 {FONT_SIZE} Tf")
            if struct_tags:
                content.append("EMC")
        content.extend(deferred_ops)
        content.append("ET")
        content.extend(_rect_ops(page))
        if form_xobject and not rotate:
            # Move each page's LAST paragraph into a Form XObject drawn
            # via Do with a /Matrix translation — exercises the
            # recursive XObject execution path with CTM inheritance.
            last_par = page["pars"][-1]
            inner = ["BT", f"/F1 {FONT_SIZE} Tf"]
            # XObject content in a local frame shifted by (-50, -30);
            # /Matrix [1 0 0 1 50 30] restores page coordinates.
            for line in last_par["lines"]:
                y_pdf_l = page_h - line["baseline_y"]
                for word in line["words"]:
                    inner.append(
                        f"1 0 0 1 {word['left'] - 50} {y_pdf_l - 30} Tm "
                        f"{show_str(word['text'])} Tj")
            inner.append("ET")
            inner_stream = "\n".join(inner).encode("latin-1")
            # Rebuild the page content WITHOUT the last paragraph, then Do.
            content = ["BT", f"/F1 {FONT_SIZE} Tf"]
            if invisible:
                content.append("3 Tr")
            for par in page["pars"][:-1]:
                for line in par["lines"]:
                    y_pdf = page_h - line["baseline_y"]
                    for word in line["words"]:
                        content.append(
                            f"1 0 0 1 {word['left']} {y_pdf} Tm "
                            f"{show_str(word['text'])} Tj")
            content.append("ET")
            content.extend(_rect_ops(page))
            xobj_num_holder = []
        stream = "\n".join(content).encode("latin-1")
        filt = b""
        if stream_filter == "lzw":
            stream = _lzw_encode(stream)
            filt = b"/Filter /LZWDecode "
        elif stream_filter == "rle":
            stream = _rle_encode(stream)
            filt = b"/Filter /RunLengthDecode "
        elif compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        page_obj_num = n_fixed + 1 + 2 * page_n
        rot = "/Rotate 90 " if rotate else ""
        if form_xobject and not rotate:
            # objects appended after all pages: xobject numbers computed
            # from the page count.
            xobj_num = n_fixed + 2 * n_pages + 1 + page_n
            xres = f"/XObject << /FX {xobj_num} 0 R >> "
            # stash for later emission
            if "_form_xobjects" not in model:
                model["_form_xobjects"] = []
            model["_form_xobjects"].append(inner_stream)
            content_with_do = stream
            # append the Do call to the page content
            do_suffix = b"\nq 1 0 0 1 0 0 cm /FX Do Q"
            raw = "\n".join(content).encode("latin-1") + do_suffix
            if stream_filter == "lzw":
                stream = _lzw_encode(raw)
            elif stream_filter == "rle":
                stream = _rle_encode(raw)
            elif compress:
                stream = zlib.compress(raw)
            else:
                stream = raw
        else:
            xres = ""
        f2_res = f"/F2 {f2_num} 0 R " if use_bold_font else ""
        f2_res += f"/F5 {f5_num} 0 R " if use_math_font else ""
        f3_res = f"/F3 {f3_num} 0 R " if page.get("broken_font") else ""
        if page.get("type3_font"):
            f3_res += (f"/F6 {t3['font_a']} 0 R "
                       f"/F7 {t3['font_b']} 0 R ")
        if page.get("scan_image"):
            xres = f"/XObject << /Im1 {img_num} 0 R >> " + xres
        annots_entry = ""
        if struct_tags:
            annots_entry += f"/StructParents {page_n} "
        if annot_nums.get(page_n):
            refs = " ".join(f"{a} 0 R" for a in annot_nums[page_n])
            annots_entry += f"/Annots [{refs}] "
        w.add(
            f"<< /Type /Page /Parent 2 0 R {rot}{annots_entry}/Resources "
            f"<< /Font << /F1 3 0 R {f2_res}{f3_res}>> {xres}>> "
            f"/Contents {page_obj_num + 1} 0 R "
            f">>".encode())
        w.add(
            f"<< /Length {len(stream)} ".encode() + filt + b">>\nstream\n"
            + stream + b"\nendstream")

    if form_xobject and not rotate:
        for inner_stream in model.pop("_form_xobjects", []):
            w.add(
                f"<< /Type /XObject /Subtype /Form /Matrix [1 0 0 1 50 30] "
                f"/BBox [0 0 {page_w} {page_h}] /Resources "
                f"<< /Font << /F1 3 0 R >> >> "
                f"/Length {len(inner_stream)} >>\nstream\n".encode()
                + inner_stream + b"\nendstream")

    if use_bold_font:
        w.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
            b"/FirstChar 32 /LastChar 126 /Widths ["
            + b" ".join([b"500"] * 95)
            + b"] /FontDescriptor 4 0 R /Encoding /WinAnsiEncoding >>")
    if use_math_font:
        # TeX Computer Modern symbol face name -> MATH_FONT_RE match
        w.add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /CMSY10 "
            b"/FirstChar 32 /LastChar 126 /Widths ["
            + b" ".join([b"500"] * 95)
            + b"] /FontDescriptor 4 0 R /Encoding /WinAnsiEncoding >>")
    if any_scan:
        w.add(
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 "
            b">>\nstream\n\xff\nendstream")
    if any_broken:
        # /F3: ToUnicode maps a-z to the Private Use Area -> a
        # broken-ToUnicode font (every mapped entry lands in the PUA)
        w.add(
            f"<< /Length {len(_TOUNICODE_BROKEN)} >>\nstream\n".encode()
            + _TOUNICODE_BROKEN + b"\nendstream")
        w.add(
            (f"<< /Type /Font /Subtype /Type1 /BaseFont /BrokenSynth "
             f"/FirstChar 32 /LastChar 126 /Widths "
             f"[{' '.join(['500'] * 95)}] /FontDescriptor 4 0 R "
             f"/Encoding /WinAnsiEncoding "
             f"/ToUnicode {f3_tu_num} 0 R >>").encode())
    if any_type3:
        def _bfchar_cmap(pairs):
            body = "\n".join(f"<{c:02X}> <{u:04X}>" for c, u in pairs)
            return (
                "/CIDInit /ProcSet findresource begin\n12 dict begin\n"
                "begincmap\n1 begincodespacerange\n<00> <FF>\n"
                f"endcodespacerange\n{len(pairs)} beginbfchar\n{body}\n"
                "endbfchar\nendcmap\nCMapName currentdict /CMap "
                "defineresource pop\nend\nend").encode("latin-1")

        tu_a = _bfchar_cmap(
            [(97 + i, 0xE000 + i) for i in range(4)]
            + [(101, ord("e")), (102, ord("f")), (103, ord("g"))])
        tu_b = _bfchar_cmap([(97 + i, 0xE010 + i) for i in range(3)])
        w.add(f"<< /Length {len(tu_a)} >>\nstream\n".encode()
              + tu_a + b"\nendstream")
        w.add(
            (f"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] "
             f"/FontMatrix [0.001 0 0 0.001 0 0] "
             f"/CharProcs << /gF {t3['proc_f']} 0 R /gA {t3['proc_a']} 0 R "
             f"/gB {t3['proc_b']} 0 R /gC {t3['proc_c']} 0 R >> "
             f"/Encoding << /Type /Encoding /Differences "
             f"[97 /gF /gF /gF /gF /gA /gB /gC] >> "
             f"/FirstChar 97 /LastChar 103 /Widths [500 500 500 500 500 "
             f"500 500] /ToUnicode {t3['tu_a']} 0 R >>").encode())
        w.add(f"<< /Length {len(tu_b)} >>\nstream\n".encode()
              + tu_b + b"\nendstream")
        w.add(
            (f"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 1000 1000] "
             f"/FontMatrix [0.001 0 0 0.001 0 0] "
             f"/CharProcs << /gA {t3['proc_a']} 0 R /gB {t3['proc_b']} 0 R "
             f"/gC {t3['proc_c']} 0 R >> "
             f"/Encoding << /Type /Encoding /Differences [97 /gA /gB /gC] >> "
             f"/FirstChar 97 /LastChar 99 /Widths [500 500 500] "
             f"/ToUnicode {t3['tu_b']} 0 R >>").encode())
        for body in (b"500 0 d0 10 10 80 80 re f",
                     b"500 0 d0 20 20 100 100 re f",
                     b"500 0 d0 30 10 90 110 re f",
                     b"500 0 d0 15 25 70 95 re f"):
            w.add(f"<< /Length {len(body)} >>\nstream\n".encode()
                  + body + b"\nendstream")
    for _pn, _p in enumerate(model["pages"]):
        for spec in _p.get("annots", []):
            sub = spec["subtype"]
            rect = spec.get("rect", (0, 0, 10, 10))
            body = (f"<< /Type /Annot /Subtype /{sub} "
                    f"/Rect [{rect[0]} {rect[1]} {rect[2]} {rect[3]}] ")
            if spec.get("contents") is not None:
                body += f"/Contents ({_esc(spec['contents'])}) "
            if spec.get("author") is not None:
                body += f"/T ({_esc(spec['author'])}) "
            if sub == "Link" and spec.get("uri"):
                body += f"/A << /S /URI /URI ({_esc(spec['uri'])}) >> "
            if sub == "Link" and spec.get("goto_page") is not None:
                tgt = n_fixed + 1 + 2 * spec["goto_page"]
                body += f"/A << /S /GoTo /D [{tgt} 0 R /Fit] >> "
            if sub == "Highlight" and spec.get("quad_points"):
                qp = " ".join(str(v) for v in spec["quad_points"])
                body += f"/QuadPoints [{qp}] "
            if sub == "Widget":
                body += f"/FT /{spec.get('field_type', 'Tx')} "
                if spec.get("value") is not None:
                    body += f"/V ({_esc(spec['value'])}) "
                if spec.get("ff"):
                    body += f"/Ff {spec['ff']} "
                if spec.get("max_len"):
                    body += f"/MaxLen {spec['max_len']} "
                if spec.get("quadding"):
                    body += f"/Q {spec['quadding']} "
                if spec.get("da"):
                    body += f"/DA ({_esc(spec['da'])}) "
                if spec.get("hidden"):
                    body += "/F 2 "
            w.add((body + ">>").encode())
    if struct_tags:
        all_elems = [n for pn in sorted(struct_elem_nums)
                     for n in struct_elem_nums[pn]]
        kids = " ".join(f"{n} 0 R" for n in all_elems)
        w.add((f"<< /Type /StructTreeRoot /K [{kids}] "
               f"/ParentTree {parent_tree_num} 0 R "
               f"/RoleMap << /Para /P >> >>").encode())
        nums_parts = []
        for pn in sorted(struct_elem_nums):
            refs = " ".join(f"{n} 0 R" for n in struct_elem_nums[pn])
            nums_parts.append(f"{pn} [{refs}]")
        w.add(f"<< /Nums [{' '.join(nums_parts)}] >>".encode())
        for pn in sorted(struct_elem_nums):
            page_obj_num = n_fixed + 1 + 2 * pn
            for k, elem_num in enumerate(struct_elem_nums[pn]):
                role = model["pages"][pn]["pars"][k].get(
                    "struct_role", "Para")
                w.add((f"<< /Type /StructElem /S /{role} "
                       f"/P {struct_root_num} 0 R /K [{k}] "
                       f"/Pg {page_obj_num} 0 R >>").encode())
    if info_num:
        body = "<< "
        if model.get("producer"):
            body += f"/Producer ({_esc(model['producer'])}) "
        if model.get("creator"):
            body += f"/Creator ({_esc(model['creator'])}) "
        w.add((body + ">>").encode())
        w.trailer_extra += f"/Info {info_num} 0 R "

    if outline:
        # /Outlines root + one bookmark per page (direct /Dest arrays)
        # + a named-destination bookmark resolved via /Names -> /Dests.
        root_num = n_fixed + 2 * n_pages + 1
        first_item = root_num + 1
        n_items = n_pages + 1
        w.add(
            f"<< /Type /Outlines /First {first_item} 0 R "
            f"/Last {first_item + n_items - 1} 0 R /Count {n_items} >>".encode())
        for i in range(n_pages):
            item_num = first_item + i
            nxt = f"/Next {item_num + 1} 0 R " if i + 1 < n_items else ""
            prev = f"/Prev {item_num - 1} 0 R " if i > 0 else ""
            page_obj_num = n_fixed + 1 + 2 * i
            w.add(
                f"<< /Title (Page {i + 1}) /Parent {root_num} 0 R "
                f"{prev}{nxt}/Dest [{page_obj_num} 0 R /XYZ null null null] "
                f">>".encode())
        # named-destination bookmark -> last page
        item_num = first_item + n_pages
        w.add(
            f"<< /Title (Named) /Parent {root_num} 0 R "
            f"/Prev {item_num - 1} 0 R /Dest (last) >>".encode())

    if xref_stream:
        # PDF 1.5 layout: pack the dict-only fixed objects (catalog,
        # pages, font, descriptor) into an object stream and reference
        # everything via a cross-reference stream.
        members = {1: 0, 2: 1, 3: 2, 4: 3}
        header_parts = []
        bodies = b""
        for objnum in sorted(members):
            body = w.objects[objnum - 1]
            header_parts.append(f"{objnum} {len(bodies)}")
            bodies += body + b"\n"
            w.objects[objnum - 1] = None
        header = (" ".join(header_parts) + "\n").encode()
        stm = zlib.compress(header + bodies)
        w.add(
            f"<< /Type /ObjStm /N {len(members)} /First {len(header)} "
            f"/Filter /FlateDecode /Length {len(stm)} >>\nstream\n".encode()
            + stm + b"\nendstream")
        return w.build_xref_stream(members)

    if encrypt_mode:
        _apply_encryption(w, encrypt_mode, doc_id)
    return w.build()
