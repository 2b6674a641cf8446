"""Text-layer PDF writer — the core of the reference's ``writePdf``
(js/export/pdf/writePdf.js + writePdfText.js ocrPageToPDFStream),
scoped to the text layer:

- one page per OcrPage at the page's dims (PDF user space = model px);
- every word positioned absolutely (``Tm``) at its bbox with a
  per-word font size chosen so the constant-width WinAnsi base font
  reproduces the word's exact pixel width (the reference sizes from
  font metrics; with a 500/1000-em base font the algebra is exact);
- ``text_mode='ebook'`` emits visible text, ``'invis'`` emits
  ``3 Tr`` invisible text — the searchable-PDF overlay mode (image
  underlays and embedded font programs are the out-of-scope rendering
  half);
- ``conf_thresh`` drops words below a confidence floor (the
  reference's confThreshHigh gate for eval modes).

The writer's contract is ROUNDTRIP: extracting the written PDF with
this repo's own parser reproduces the source text byte-for-byte
(tested across fixture families). Non-WinAnsi-encodable characters
replace with '?' by default; ``on_unencodable='embed'`` switches
affected words to a Type0/Identity-H font with an embedded CID-keyed
CFF program (CID = BMP codepoint, identity ToUnicode, /DW width
algebra) so arbitrary BMP text — CJK included — roundtrips. Embedded
glyphs carry real Type2 outlines for Latin/WinAnsi codepoints (5x7
segment face, render_fonts.type2_charstring) so strict renderers draw
legible text; codepoints outside that face (CJK etc) keep blank
placeholder outlines — the text layer, not print-grade rendering,
remains the contract. 'error' raises instead.
"""

from __future__ import annotations

import zlib

from ..model import OcrPage

FONT_EM = 500  # constant glyph advance per 1000 em — width algebra exact


def _esc_winansi(s: str, on_unencodable: str) -> str:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
            continue
        code = ord(ch)
        if 32 <= code <= 126:
            out.append(ch)
            continue
        try:
            out.append(f"\\{ch.encode('cp1252')[0]:03o}")
        except UnicodeEncodeError:
            if on_unencodable == "error":
                raise ValueError(f"not WinAnsi-encodable: {ch!r}")
            out.append("?")
    return "".join(out)


def _fmt(v: float) -> str:
    """PDF number formatting (reference formatPdfNumber: trim trailing
    zeros, max 2 decimals for page-space coordinates)."""
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return s if s else "0"


def write_text_pdf(pages: list[OcrPage], text_mode: str = "ebook",
                   conf_thresh: float = 0,
                   on_unencodable: str = "replace",
                   outline: list | None = None,
                   annotations: list | None = None,
                   page_images: list | None = None,
                   doc_info: dict | None = None) -> bytes:
    """OcrPages -> text-layer PDF bytes (see module docstring).

    ``outline``: [(title, page_n, y), ...] bookmark entries, or
    nested [(title, page_n, y, children), ...] -> an /Outlines tree
    with explicit XYZ destinations (writeOutline.js semantics).
    ``doc_info``: {Title, Author, Subject, Creator, ...} -> the /Info
    dictionary (buildInfoDictBody), readable back through
    inspect_metadata. ``annotations``: per-page lists of
    dicts {type: 'Link'|'Highlight'|'Text', rect: (l, t, r, b) in
    page px, + uri= for links, contents=/author= for notes} ->
    /Annots arrays (writePdfAnnots.js core). Both roundtrip through
    this repo's own outline/annotation parsers.

    ``page_images``: per-page JPEG bytes (or None) drawn full-page
    UNDER the text (writePdfImages drawImageCommands core) — combined
    with ``text_mode='invis'`` this is the complete searchable-PDF
    shape: a scan image with an invisible text overlay, which this
    repo's own determinePdfType classifies as an OCR-mode document."""
    if text_mode not in ("ebook", "invis"):
        raise ValueError(f"text_mode {text_mode}")
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    add(b"")                                   # 1: catalog, patched below
    add(b"")                                   # 2: pages, patched below
    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding /FirstChar 0 /LastChar 255"
        b" /Widths [" + b" ".join([b"500"] * 256) + b"]"
        b" /FontDescriptor 4 0 R >>")          # 3
    add(b"<< /Type /FontDescriptor /FontName /Helvetica /Flags 32"
        b" /FontBBox [-166 -225 1000 931] /ItalicAngle 0 /Ascent 718"
        b" /Descent -207 /CapHeight 718 /StemV 88 >>")  # 4

    # --- optional embedded-CFF Unicode font for non-WinAnsi words
    def encodable(t: str) -> bool:
        try:
            t.encode("cp1252")
            return True
        except UnicodeEncodeError:
            return False

    f2_num = None
    if on_unencodable == "embed":
        codes = sorted({
            ord(ch)
            for page in pages for line in page.lines
            for word in line.words
            if word.text and not encodable(word.text)
            for ch in word.text})
        if any(c > 0xFFFF for c in codes):
            raise ValueError("embed mode covers BMP codepoints only")
        if codes:
            from ..render_fonts import build_cff_cid
            from ..render_pdf import _tounicode_ranges

            cff = build_cff_cid(codes, outlines=True)
            tou = _tounicode_ranges(codes)
            desc_num = add(
                b"<< /Type /FontDescriptor /FontName /EmbedCID /Flags 32"
                b" /Ascent 718 /Descent -207 /CapHeight 718"
                b" /ItalicAngle 0 /StemV 88"
                b" /FontBBox [-166 -225 1000 931]"
                + f" /FontFile3 {len(objects) + 2} 0 R >>".encode())
            cff_num = add(
                f"<< /Length {len(cff)} /Subtype /CIDFontType0C >>\n"
                f"stream\n".encode() + cff + b"\nendstream")
            tou_num = add(
                f"<< /Length {len(tou)} >>\nstream\n".encode()
                + tou + b"\nendstream")
            cid_num = add(
                b"<< /Type /Font /Subtype /CIDFontType0"
                b" /BaseFont /EmbedCID /CIDSystemInfo"
                b" << /Registry (Adobe) /Ordering (Identity)"
                b" /Supplement 0 >>"
                + f" /FontDescriptor {desc_num} 0 R"
                  f" /DW {FONT_EM} >>".encode())
            _ = cff_num
            f2_num = add(
                b"<< /Type /Font /Subtype /Type0 /BaseFont /EmbedCID"
                b" /Encoding /Identity-H"
                + f" /DescendantFonts [{cid_num} 0 R]"
                  f" /ToUnicode {tou_num} 0 R >>".encode())

    page_nums = []
    for page_n, page in enumerate(pages):
        w = page.dims["width"]
        h = page.dims["height"]
        img = (page_images[page_n]
               if page_images and page_n < len(page_images) else None)
        img_num = None
        ops = []
        if img is not None:
            from ..textops.jpeg import decode_jpeg

            px = decode_jpeg(img)
            ih, iw = px.shape[:2]
            space = b"/DeviceRGB" if px.ndim == 3 else b"/DeviceGray"
            img_num = add(
                b"<< /Type /XObject /Subtype /Image"
                + f" /Width {iw} /Height {ih}".encode()
                + b" /ColorSpace " + space
                + b" /BitsPerComponent 8 /Filter /DCTDecode"
                + f" /Length {len(img)} >>\nstream\n".encode()
                + img + b"\nendstream")
            ops.append(f"q {_fmt(w)} 0 0 {_fmt(h)} 0 0 cm /Im1 Do Q")
        ops.append("BT")
        if text_mode == "invis":
            ops.append("3 Tr")
        for line in page.lines:
            baseline_y = line.bbox.bottom + (
                line.baseline[1] if line.baseline else 0)
            for word in line.words:
                if word.conf is not None and word.conf < conf_thresh:
                    continue
                if not word.text:
                    continue
                # font size reproducing the exact pixel width with the
                # constant 500/1000-em advance
                fs = (word.bbox.right - word.bbox.left) \
                    / len(word.text) / (FONT_EM / 1000.0)
                if fs <= 0:
                    continue
                y_pdf = h - baseline_y
                if f2_num is not None and not encodable(word.text):
                    shown = ("<" + "".join(f"{ord(c):04X}"
                                           for c in word.text) + ">")
                    fname = "/F2"
                else:
                    shown = ("("
                             + _esc_winansi(
                                 word.text,
                                 "replace" if on_unencodable == "embed"
                                 else on_unencodable) + ")")
                    fname = "/F1"
                ops.append(
                    f"{fname} {_fmt(fs)} Tf 1 0 0 1 "
                    f"{_fmt(word.bbox.left)} {_fmt(y_pdf)} Tm "
                    f"{shown} Tj")
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("latin-1"))
        content_num = add(
            f"<< /Filter /FlateDecode /Length {len(stream)} >>\n"
            f"stream\n".encode() + stream + b"\nendstream")
        xres = (f"/XObject << /Im1 {img_num} 0 R >> "
                if img_num else "")
        f2_res = f" /F2 {f2_num} 0 R" if f2_num is not None else ""
        page_nums.append(add(
            f"<< /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 {_fmt(w)} {_fmt(h)}] "
            f"/Resources << /Font << /F1 {font_num} 0 R{f2_res} >> "
            f"{xres}>> "
            f"/Contents {content_num} 0 R >>".encode()))

    # --- annotations: /Annots arrays appended to their pages
    if annotations:
        for page_n, annots in enumerate(annotations):
            if page_n >= len(page_nums) or not annots:
                continue
            h = pages[page_n].dims["height"]
            refs = []
            for a in annots:
                l, t, r, b = a["rect"]
                rect = (f"[{_fmt(l)} {_fmt(h - b)} {_fmt(r)} "
                        f"{_fmt(h - t)}]")
                typ = a["type"]
                if typ == "Link":
                    body = (f"<< /Type /Annot /Subtype /Link /Rect {rect}"
                            f" /Border [0 0 0] /A << /S /URI /URI"
                            f" ({_esc_winansi(a['uri'], 'replace')}) >> >>")
                elif typ == "Highlight":
                    quad = (f"[{_fmt(l)} {_fmt(h - t)} {_fmt(r)} "
                            f"{_fmt(h - t)} {_fmt(l)} {_fmt(h - b)} "
                            f"{_fmt(r)} {_fmt(h - b)}]")
                    body = (f"<< /Type /Annot /Subtype /Highlight"
                            f" /Rect {rect} /QuadPoints {quad}"
                            f" /C [1 1 0]"
                            + (f" /T ({_esc_winansi(a['author'], 'replace')})"
                               if a.get("author") else "")
                            + " >>")
                elif typ == "Text":
                    body = (f"<< /Type /Annot /Subtype /Text /Rect {rect}"
                            f" /Contents ({_esc_winansi(a.get('contents', ''), 'replace')})"
                            + (f" /T ({_esc_winansi(a['author'], 'replace')})"
                               if a.get("author") else "")
                            + " /Name /Comment >>")
                else:
                    raise ValueError(f"annotation type {typ}")
                refs.append(f"{add(body.encode())} 0 R")
            pg = objects[page_nums[page_n] - 1]
            objects[page_nums[page_n] - 1] = pg[:-3] + (
                f" /Annots [{' '.join(refs)}] >>".encode())

    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objects[1] = (f"<< /Type /Pages /Count {len(page_nums)} "
                  f"/Kids [{kids}] >>".encode())

    # --- outline: tree with explicit XYZ destinations; entries are
    # (title, page_n, y) or (title, page_n, y, children)
    outlines_ref = ""
    if outline:

        def count(entries):
            return sum(1 + count(e[3] if len(e) > 3 else [])
                       for e in entries)

        def emit(entries, parent_num):
            # reserve contiguous slots for THIS level first so
            # Prev/Next refs are known, then fill (children interleave
            # after)
            slots = []
            for _ in entries:
                slots.append(add(b""))
            for i, e in enumerate(entries):
                title, page_n, y = e[0], e[1], e[2]
                kids = e[3] if len(e) > 3 else []
                h = pages[page_n].dims["height"]
                prev_ = f" /Prev {slots[i - 1]} 0 R" if i > 0 else ""
                next_ = (f" /Next {slots[i + 1]} 0 R"
                         if i + 1 < len(entries) else "")
                child = ""
                if kids:
                    knums = emit(kids, slots[i])
                    child = (f" /First {knums[0]} 0 R"
                             f" /Last {knums[-1]} 0 R"
                             f" /Count {count(kids)}")
                objects[slots[i] - 1] = (
                    f"<< /Title ({_esc_winansi(str(title), 'replace')})"
                    f" /Parent {parent_num} 0 R{prev_}{next_}{child}"
                    f" /Dest [{page_nums[page_n]} 0 R /XYZ 0 "
                    f"{_fmt(h - y)} null] >>").encode()
            return slots

        root_num = add(b"")
        top = emit(outline, root_num)
        objects[root_num - 1] = (
            f"<< /Type /Outlines /First {top[0]} 0 R"
            f" /Last {top[-1]} 0 R /Count {count(outline)} >>").encode()
        outlines_ref = f" /Outlines {root_num} 0 R"

    info_ref = ""
    if doc_info:
        entries = " ".join(
            f"/{k} ({_esc_winansi(str(v), 'replace')})"
            for k, v in doc_info.items())
        info_num = add(f"<< {entries} >>".encode())
        info_ref = f"{info_num}"
    objects[0] = (f"<< /Type /Catalog /Pages 2 0 R{outlines_ref}"
                  f" >>".encode())

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    info_entry = f" /Info {info_ref} 0 R" if info_ref else ""
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R"
            f"{info_entry} >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)
