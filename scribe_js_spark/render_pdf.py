"""Minimal text-native PDF writer for the fixture layout model.

From-scratch PDF 1.4 with a classic xref table (FIXTURES.md §2.6): one
WinAnsi /Type1 Helvetica font with explicit /Widths (constant 500/1000
em -> a 30pt glyph advances exactly CHAR_W=15 units, matching the model
geometry), one content stream per page positioning every word with an
absolute ``Tm`` in a single ``BT/ET`` block. Even doc_ids emit raw
streams, odd doc_ids FlateDecode-compressed streams — both decode paths
are exercised.
"""

from __future__ import annotations

import zlib

from .fixtures import CHAR_W

FONT_SIZE = 30  # 500/1000 em * 30 = 15 = CHAR_W


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class _Writer:
    def __init__(self):
        self.objects: list[bytes] = []

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)  # 1-based object number

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


def render_pdf(model: dict, compress: bool | None = None) -> bytes:
    if compress is None:
        compress = (model.get("doc_id", 0) % 2) == 1

    w = _Writer()
    page_w = model["pages"][0]["width"]
    page_h = model["pages"][0]["height"]
    n_pages = len(model["pages"])

    # object layout: 1=Catalog, 2=Pages, 3=Font, 4=FontDescriptor,
    # then per page: page object + content stream.
    kids = " ".join(
        f"{5 + 2 * i} 0 R" for i in range(n_pages))
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
        f"/MediaBox [0 0 {page_w} {page_h}] >>".encode())
    widths = " ".join(["500"] * (127 - 32))
    w.add(
        f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        f"/FirstChar 32 /LastChar 126 /Widths [{widths}] "
        f"/Encoding /WinAnsiEncoding /FontDescriptor 4 0 R >>".encode())
    w.add(
        b"<< /Type /FontDescriptor /FontName /Helvetica /Flags 32 "
        b"/Ascent 718 /Descent -207 /CapHeight 718 /ItalicAngle 0 "
        b"/StemV 88 /FontBBox [-166 -225 1000 931] >>")

    for page_n, page in enumerate(model["pages"]):
        content = ["BT", f"/F1 {FONT_SIZE} Tf"]
        for par in page["pars"]:
            for line in par["lines"]:
                y_pdf = page_h - line["baseline_y"]
                for word in line["words"]:
                    content.append(
                        f"1 0 0 1 {word['left']} {y_pdf} Tm "
                        f"({_esc(word['text'])}) Tj")
        content.append("ET")
        stream = "\n".join(content).encode("latin-1")
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        page_obj_num = 5 + 2 * page_n
        w.add(
            f"<< /Type /Page /Parent 2 0 R /Resources "
            f"<< /Font << /F1 3 0 R >> >> /Contents {page_obj_num + 1} 0 R "
            f">>".encode())
        w.add(
            f"<< /Length {len(stream)} ".encode() + filt + b">>\nstream\n"
            + stream + b"\nendstream")

    return w.build()
