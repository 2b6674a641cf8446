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


def _esc(s: str) -> str:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ord(ch) > 126:
            out.append(f"\\{ord(ch):03o}")
        else:
            out.append(ch)
    return "".join(out)


def _encode_word(text: str, ligatures: bool) -> str:
    if ligatures and "fi" in text:
        text = text.replace("fi", chr(LIG_CODE))
    return _esc(text)


class _Writer:
    def __init__(self):
        self.objects: list[bytes] = []

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
            f"trailer\n<< /Size {len(self.objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
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


def render_pdf(model: dict, compress: bool | None = None,
               tj_mode: bool | None = None,
               ligatures: bool | None = None,
               rotate: bool | None = None,
               invisible: bool = False) -> bytes:
    doc_id = model.get("doc_id", 0)
    if compress is None:
        compress = (doc_id % 2) == 1
    if tj_mode is None:
        tj_mode = (doc_id % 3) == 2
    if ligatures is None:
        ligatures = (doc_id % 5) == 2
    if rotate is None:
        rotate = (doc_id % 7) == 3

    w = _Writer()
    page_w = model["pages"][0]["width"]
    page_h = model["pages"][0]["height"]
    n_pages = len(model["pages"])

    # objects: 1=Catalog 2=Pages 3=Font 4=Descriptor [5=ToUnicode]
    # then per page: page + content.
    n_fixed = 5 if ligatures else 4
    kids = " ".join(f"{n_fixed + 1 + 2 * i} 0 R" for i in range(n_pages))
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    if rotate:
        # MediaBox in unrotated user space; /Rotate 90 swaps the view.
        media = f"/MediaBox [0 0 {page_h} {page_w}]"
    else:
        media = f"/MediaBox [0 0 {page_w} {page_h}]"
    w.add(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} {media} >>".encode())
    last_char = LIG_CODE if ligatures else 126
    widths = ["500"] * (last_char + 1 - 32)
    if ligatures:
        widths[LIG_CODE - 32] = "1000"
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

    for page_n, page in enumerate(model["pages"]):
        content = ["BT", f"/F1 {FONT_SIZE} Tf"]
        if invisible:
            content.append("3 Tr")
        for par in page["pars"]:
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
                if tj_mode:
                    content.append(tm_for(line["words"][0]["left"]))
                    parts = []
                    for w_i, word in enumerate(line["words"]):
                        if w_i > 0:
                            gap = word["left"] - line["words"][w_i - 1]["right"]
                            parts.append(f"{-(gap / FONT_SIZE) * 1000:.6f}")
                        parts.append(
                            f"({_encode_word(word['text'], ligatures)})")
                    content.append(f"[{' '.join(parts)}] TJ")
                else:
                    for word in line["words"]:
                        content.append(
                            f"{tm_for(word['left'])} "
                            f"({_encode_word(word['text'], ligatures)}) Tj")
        content.append("ET")
        stream = "\n".join(content).encode("latin-1")
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        page_obj_num = n_fixed + 1 + 2 * page_n
        rot = "/Rotate 90 " if rotate else ""
        w.add(
            f"<< /Type /Page /Parent 2 0 R {rot}/Resources "
            f"<< /Font << /F1 3 0 R >> >> /Contents {page_obj_num + 1} 0 R "
            f">>".encode())
        w.add(
            f"<< /Length {len(stream)} ".encode() + filt + b">>\nstream\n"
            + stream + b"\nendstream")

    return w.build()
