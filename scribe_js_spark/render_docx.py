"""Minimal DOCX renderer for the fixture layout model: a real zip with
[Content_Types].xml + word/document.xml, one ``<w:p>`` per model
paragraph (like the plain-text family, restricted to one model page so
synthetic pagination never splits a paragraph)."""

from __future__ import annotations

import io
import zipfile

from .functions.textnorm import escape_xml

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>")

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>")


def render_docx(model: dict) -> bytes:
    pars_xml = []
    for page in model["pages"]:
        for par in page["pars"]:
            words = [
                w["text"] for line in par["lines"] for w in line["words"]]
            runs = f"<w:r><w:t>{escape_xml(' '.join(words))}</w:t></w:r>"
            pars_xml.append(f"<w:p>{runs}</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(pars_xml) + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()
