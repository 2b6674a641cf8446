"""DOCX converter (core path of the reference's convertDocDocx,
/root/reference/js/import/convertDocDocx.js:605-730): unzip
``word/document.xml``, extract ``<w:p>`` paragraphs and their
``<w:r>/<w:t>`` run texts, then synthesize geometry with the same
Times-New-Roman layout model as plain text (one reflow paragraph per
DOCX paragraph). Numbering/styles/footnote lifting deferred.
"""

from __future__ import annotations

import io
import re
import zipfile

from ..functions.textnorm import unescape_xml
from ..model import OcrPage
from .plaintext import convert_doc_text

_PAR_RE = re.compile(r"<w:p[ >](.*?)</w:p>", re.S)
_PAR_EMPTY_RE = re.compile(r"<w:p[^>]*/>")
_TEXT_RE = re.compile(r"<w:t[^>]*>([^<]*)</w:t>")
_TAB_RE = re.compile(r"<w:tab\s*/>")
_BR_RE = re.compile(r"<w:br\s*/>")


def parse_docx_paragraphs(data: bytes) -> list[str]:
    """DOCX bytes -> ordered paragraph texts."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        try:
            doc_xml = zf.read("word/document.xml").decode("utf-8")
        except KeyError:
            raise ValueError("No word/document.xml found in docx file")
    paragraphs = []
    for m in _PAR_RE.finditer(doc_xml):
        content = m.group(1)
        content = _TAB_RE.sub(" ", content)
        content = _BR_RE.sub(" ", content)
        text = "".join(
            unescape_xml(t) for t in _TEXT_RE.findall(content))
        text = re.sub(r"\s+", " ", text).strip()
        if text:
            paragraphs.append(text)
    return paragraphs


def convert_doc_docx(data: bytes) -> list[OcrPage]:
    paragraphs = parse_docx_paragraphs(data)
    pages = convert_doc_text("\n\n".join(paragraphs))
    for page in pages:
        page.textSource = "docx"
    return pages
