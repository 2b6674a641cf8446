"""hOCR export: structural round trip — write_hocr output re-imports to
the same texts/boxes (mirrors the reference's own re-import path,
writeHocr -> importOCRFiles(scribeMode))."""

from scribe_js_spark.export.hocr import write_hocr
from scribe_js_spark.export.text import write_text
from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import RENDERERS, build_doc_model, expected_text
from scribe_js_spark.operators.detect import detect_document_format, split_pages
from scribe_js_spark.operators.hocr import convert_page_hocr


def test_hocr_export_reimport_roundtrip():
    for doc_id in range(8):
        model = build_doc_model(doc_id)
        pages = extract_document(RENDERERS["hocr"](model).encode()).pages
        out = write_hocr(pages)
        assert detect_document_format(out.encode()) == "hocr"
        page_strs = split_pages(out, "hocr")
        assert len(page_strs) == len(pages)
        reimported = [
            convert_page_hocr(s, i, scribe_mode=True)[0]
            for i, s in enumerate(page_strs)
        ]
        # Same text after reflow
        assert write_text(reimported) == expected_text(model)
        # Same word boxes and ids
        for p_orig, p_new in zip(pages, reimported):
            words_o = [w for l in p_orig.lines for w in l.words]
            words_n = [w for l in p_new.lines for w in l.words]
            assert len(words_o) == len(words_n)
            for wo, wn in zip(words_o, words_n):
                assert wo.id == wn.id
                assert wo.text == wn.text
                assert wo.bbox == wn.bbox
                assert wo.conf == wn.conf


def test_hocr_export_header():
    model = build_doc_model(1)
    pages = extract_document(RENDERERS["hocr"](model).encode()).pages
    out = write_hocr(pages)
    assert out.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    assert "<meta name='ocr-system' content='scribeocr' />" in out
    assert out.endswith("\n</body>\n</html>")
