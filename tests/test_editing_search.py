"""Editing verbs + word-stream search operators."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import RENDERERS, build_doc_model
from scribe_js_spark.model import Bbox
from scribe_js_spark.operators.editing import (
    calc_conf,
    check_ocr_words_adjacent,
    merge_ocr_words,
    reorder_ocr_page,
    split_ocr_word,
)
from scribe_js_spark.operators.search import (
    get_doc_matches,
    get_matching_words,
)


def _pages(doc_id=2, fmt="hocr"):
    model = build_doc_model(doc_id)
    return extract_document(RENDERERS[fmt](model).encode()).pages


def test_calc_conf():
    pages = _pages()
    res = calc_conf(pages)
    assert res["total"] > 0
    assert 0 < res["highConf"] <= res["total"]


def test_split_and_merge_word():
    pages = _pages(fmt="abbyy")  # char-level boxes
    word = pages[0].lines[0].words[0]
    a, b = split_ocr_word(word, 2)
    assert a.text == word.text[:2]
    assert b.text == word.text[2:]
    assert a.bbox.right <= b.bbox.left
    assert a.id == word.id + "a" and b.id == word.id + "b"
    merged = merge_ocr_words([a, b])
    assert merged.text == word.text
    assert merged.bbox == word.bbox


def test_adjacent_check():
    pages = _pages()
    line = pages[0].lines[0]
    if len(line.words) >= 2:
        assert check_ocr_words_adjacent(line.words[:2])
        if len(line.words) >= 3:
            assert not check_ocr_words_adjacent(
                [line.words[0], line.words[2]])


def test_reorder_and_exclude():
    pages = _pages()
    page = pages[0]
    first_line = page.lines[0]
    layout = {
        "a": {"coords": first_line.bbox, "type": "exclude"},
    }
    n_before = len(page.lines)
    reorder_ocr_page(page, layout)
    assert len(page.lines) == n_before - 1
    assert first_line not in page.lines


def test_search_matches():
    pages = _pages()
    line = pages[0].lines[0]
    phrase = " ".join(w.text for w in line.words[:2]).lower()
    matches = get_matching_words(phrase, pages[0])
    assert len(matches) >= 2
    assert matches[0].id == line.words[0].id

    doc_matches = get_doc_matches(phrase, pages)
    assert doc_matches
    assert doc_matches[0]["pageN"] == 0
    assert doc_matches[0]["wordIds"][0] == line.words[0].id
    # Non-overlapping: every occurrence advances past the span.
    seen = [tuple(m["wordIds"]) for m in doc_matches]
    assert len(seen) == len(set(seen))


def test_single_word_search():
    pages = _pages()
    word = pages[0].lines[0].words[0]
    matches = get_matching_words(word.text.lower(), pages[0])
    assert any(m.id == word.id for m in matches)
