"""DOCX writer (writeDocx).

Reimplements /root/reference/js/export/writeDocx.js:24-270: the body
XML pass (reflow mode shares one <w:p> per paragraph, otherwise one
per line; Heading1/Quote paragraph styles from the layout roles;
per-word <w:r> runs carrying bold/italic/smallCaps/underline/
superscript/font; words with styleRuns split into one run per
segment; superscript runs get no leading space so footnote markers
stay attached) and the OPC zip container with deterministic entry
timestamps. The Word-footnote linking pass (footnoteParId ->
<w:footnoteReference>) requires the footnote-link subsystem the layout
pass does not model yet; linked-note paragraphs therefore export as
ordinary body paragraphs (no content is dropped — same fallback the
reference takes for unlinked notes).
"""

from __future__ import annotations

import io
import zipfile

from ..functions.textnorm import escape_xml
from ..model import OcrPage

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.'
    'main+xml"/>'
    '<Override PartName="/word/styles.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>'
    "</Types>")

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>')

_DOC_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>")

_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<w:styles xmlns:w="http://schemas.openxmlformats.org/'
    'wordprocessingml/2006/main">'
    '<w:style w:type="paragraph" w:styleId="Heading1">'
    '<w:name w:val="heading 1"/></w:style>'
    '<w:style w:type="paragraph" w:styleId="Quote">'
    '<w:name w:val="Quote"/></w:style>'
    '<w:style w:type="paragraph" w:styleId="FootnoteText">'
    '<w:name w:val="footnote text"/></w:style>'
    "</w:styles>")

_W_NS = ('xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/'
         '2006/main"')


def _style_xml(style, overrides: dict | None = None) -> str:
    def val(name, default):
        if overrides and name in overrides:
            return overrides[name]
        return default

    s = ""
    if val("bold", style.bold):
        s += "<w:b/>"
    if val("italic", style.italic):
        s += "<w:i/>"
    if val("smallCaps", style.smallCaps):
        s += "<w:smallCaps/>"
    if style.underline:
        s += '<w:u w:val="single"/>'
    if style.sup:
        s += '<w:vertAlign w:val="superscript"/>'
    if style.font:
        f = escape_xml(style.font)
        s += f'<w:rFonts w:ascii="{f}" w:hAnsi="{f}"/>'
    return s


def _word_segments(word) -> list[tuple[int, int, dict | None]]:
    """(start, end, style-delta) segments from word.styleRuns
    (getWordStyleSegments semantics)."""
    runs = word.styleRuns or []
    if not runs:
        return [(0, len(word.text), None)]
    out = []
    starts = [0] + [r["i"] for r in runs]
    deltas: list[dict | None] = [None] + [r["style"] for r in runs]
    for k in range(len(starts)):
        end = starts[k + 1] if k + 1 < len(starts) else len(word.text)
        if end > starts[k]:
            out.append((starts[k], end, deltas[k]))
    return out


def _text_run(word, lead: str) -> str:
    xml = ""
    for idx, (start, end, delta) in enumerate(_word_segments(word)):
        sx = _style_xml(word.style, delta)
        rpr = f"<w:rPr>{sx}</w:rPr>" if sx else ""
        lead_seg = lead if idx == 0 else ""
        xml += (f"<w:r>{rpr}<w:t xml:space=\"preserve\">{lead_seg}"
                f"{escape_xml(word.text[start:end])}</w:t></w:r>")
    return xml


def write_docx_content(pages: list[OcrPage],
                       reflow_text: bool = False) -> str:
    """word/document.xml body (writeDocxContent body pass)."""
    body = ""
    open_key = None
    first_word = True
    for page in pages:
        if not page.lines:
            continue
        for line in page.lines:
            key = line.par if reflow_text and line.par else line
            for word in line.words:
                if key is not open_key:
                    if open_key is not None:
                        body += "</w:p>"
                    par = line.par
                    if par is not None and par.type == "title":
                        ppr = ('<w:pPr><w:pStyle w:val="Heading1"/>'
                               "</w:pPr>")
                    elif par is not None and par.type == "blockquote":
                        ppr = '<w:pPr><w:pStyle w:val="Quote"/></w:pPr>'
                    else:
                        ppr = ""
                    body += f"<w:p>{ppr}"
                    open_key = key
                    first_word = True
                lead = "" if (first_word or word.style.sup) else " "
                body += _text_run(word, lead)
                first_word = False
    if open_key is not None:
        body += "</w:p>"
    return body


def write_docx(pages: list[OcrPage], reflow_text: bool = False) -> bytes:
    """Full .docx (OPC zip) from OCR pages. Deterministic: fixed entry
    order and timestamps."""
    body = write_docx_content(pages, reflow_text=reflow_text)
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W_NS}><w:body>{body}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/_rels/document.xml.rels", _DOC_RELS),
            ("word/document.xml", document),
            ("word/styles.xml", _STYLES),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()
