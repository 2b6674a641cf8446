"""ALTO / Markdown / text-mode export tests."""

from scribe_js_spark.export.alto import write_alto
from scribe_js_spark.export.markdown import write_markdown
from scribe_js_spark.export.text import write_text
from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import RENDERERS, build_doc_model, expected_text


def _pages(doc_id):
    model = build_doc_model(doc_id)
    return model, extract_document(RENDERERS["hocr"](model).encode()).pages


def test_alto_export_reimport():
    for doc_id in range(6):
        model, pages = _pages(doc_id)
        alto = write_alto(pages)
        res = extract_document(alto.encode())
        assert res.fmt == "alto"
        assert res.error is None
        assert res.text == expected_text(model), doc_id


def test_markdown_fold():
    # Markdown with page separators stripped equals the reflow text
    # (the page's own leading newline follows the separator, matching
    # the reference's h==0 newLine rule).
    for doc_id in range(6):
        model, pages = _pages(doc_id)
        md = write_markdown(pages)
        assert md.replace("\n\n---\n\n\n", "\n") == expected_text(model), doc_id


def test_write_text_line_numbers_mode():
    model, pages = _pages(1)
    txt = write_text(pages, reflow_text=False, line_numbers=True)
    lines = txt.split("\n")[1:]  # leading newline
    assert lines[0].startswith("0:0  ")
    # every page line present with its page:line prefix
    n_lines = sum(len(p.lines) for p in pages)
    assert len(lines) == n_lines


def test_write_text_preserve_spacing():
    model, pages = _pages(1)
    txt = write_text(pages, reflow_text=False, preserve_spacing=True)
    lines = txt.split("\n")[1:]
    # words are left-padded to column ~ left/pageWidth*120
    first_line = pages[0].lines[0]
    first_word = first_line.words[0]
    expected_col = round(first_word.bbox.left / pages[0].dims["width"] * 120)
    assert lines[0][:expected_col] == " " * expected_col
    assert lines[0][expected_col:].startswith(first_word.text)
