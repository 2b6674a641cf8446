"""Comb-mode merge tests (compareOCRModule.js comb branch semantics)."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_comb_models, render_hocr
from scribe_js_spark.model import Bbox, OcrLine, OcrPage, OcrWord
from scribe_js_spark.operators.comb import (
    comb_merge_page,
    penalize_word,
    reject_word_legacy,
)


def _pages(model):
    return extract_document(render_hocr(model).encode()).pages


def _merged_rows(doc_id):
    m = build_comb_models(doc_id)
    merged = comb_merge_page(
        _pages(m["legacy"])[0], _pages(m["lstm"])[0],
        legacy_lstm_comb=True)
    rows = []
    for line_n, line in enumerate(merged.lines):
        for word_n, w in enumerate(line.words):
            rows.append({
                "line_n": line_n, "word_n": word_n, "word_id": w.id,
                "text": w.text, "conf": int(w.conf),
                "left": int(w.bbox.left), "right": int(w.bbox.right)})
    return rows, m["expected"]


def test_comb_matches_model_golden():
    for doc_id in (0, 1, 7, 19):
        rows, expected = _merged_rows(doc_id)
        assert rows == expected, doc_id


def test_reject_word_legacy_patterns():
    assert reject_word_legacy("m1del", "model")          # letter-digit-letter
    assert not reject_word_legacy("m1del", "mod3l")      # both match
    assert reject_word_legacy("paiin", "pain")           # ii between letters
    assert not reject_word_legacy("xiiiy", "xy")         # 'i' neighbors exempt
    assert not reject_word_legacy("skiing", "skiing")


def test_penalize_word_rules():
    def w(text):
        page = OcrPage(0, {"width": 100, "height": 100})
        line = OcrLine(page, Bbox(0, 0, 10, 10), [0, 0])
        return OcrWord(line, "w1", text, Bbox(0, 0, 10, 10))

    assert penalize_word([w("a%")]) == 0.05    # non-number before %
    assert penalize_word([w("5%")]) == 0.0
    assert penalize_word([w("skiing")]) == 0.05
    assert penalize_word([w("m")]) == 0.05
    assert penalize_word([w("a1b")]) == 0.05
    assert penalize_word([w("]x")]) == 0.05
    assert penalize_word([w("clean")]) == 0.0


def _one_word_page(text, text_alt=None, conf=95.0):
    page = OcrPage(0, {"width": 1000, "height": 1000})
    line = OcrLine(page, Bbox(100, 80, 250, 120), [0.0, 0.0])
    word = OcrWord(line, "word_1_1_1", text, Bbox(100, 80, 250, 120))
    word.conf = conf
    word.textAlt = text_alt
    line.words.append(word)
    page.lines.append(line)
    return page


def test_comb_text_alt_agreement_keeps_lstm():
    # Legacy textAlt == LSTM text -> dictionary-correction undo: B wins
    pa = _one_word_page("corrected", text_alt="rawtext")
    pb = _one_word_page("rawtext")
    merged = comb_merge_page(pa, pb, legacy_lstm_comb=True)
    assert merged.lines[0].words[0].text == "rawtext"


def test_comb_eval_conflicts_false_takes_b_text():
    # style-from-Legacy / text-from-LSTM mode: B always wins conflicts
    pa = _one_word_page("legacy")
    pb = _one_word_page("lstmmy")
    merged = comb_merge_page(pa, pb, eval_conflicts=False)
    assert merged.lines[0].words[0].text == "lstmmy"


def test_comb_eg_skip_list():
    pa = _one_word_page("eg")
    pb = _one_word_page("ab")
    merged = comb_merge_page(pa, pb, legacy_lstm_comb=True)
    assert merged.lines[0].words[0].text == "eg"


def test_comb_use_bbox_b_on_match():
    pa = _one_word_page("same")
    pb = _one_word_page("same")
    pb.lines[0].words[0].bbox = Bbox(101, 81, 249, 119)
    merged = comb_merge_page(pa, pb, use_bbox_b=True)
    w = merged.lines[0].words[0]
    assert w.conf == 100.0
    assert (w.bbox.left, w.bbox.right) == (101, 249)


def test_comb_inputs_not_mutated():
    m = build_comb_models(2)
    pa = _pages(m["legacy"])[0]
    pb = _pages(m["lstm"])[0]
    texts_before = [w.text for line in pa.lines for w in line.words]
    confs_before = [w.conf for line in pa.lines for w in line.words]
    comb_merge_page(pa, pb, legacy_lstm_comb=True)
    assert [w.text for line in pa.lines for w in line.words] == texts_before
    assert [w.conf for line in pa.lines for w in line.words] == confs_before


def _merged_tuples(pa, pb, image):
    merged = comb_merge_page(pa, pb, legacy_lstm_comb=True,
                             page_image=image)
    return [(ln, wn, w.id, w.text, int(w.conf))
            for ln, line in enumerate(merged.lines)
            for wn, w in enumerate(line.words)]


def test_comb_image_family_visual_decisions():
    """Image-bearing comb docs (40+): the binary scan decides
    conflicts via evalWords — Legacy kept where it matches the scan
    (the no-image LSTM-prior would have replaced it), LSTM taken where
    the scan matches it, and a gapped word pair retained against a
    merged LSTM word whose render bleeds into the gap. Removing the
    image must break the goldens (decisiveness)."""
    from scribe_js_spark.textops.multimodal import decode_png

    for doc_id in (40, 43):
        m = build_comb_models(doc_id)
        pa = _pages(m["legacy"])[0]
        pb = _pages(m["lstm"])[0]
        _w, _h, _c, px = decode_png(m["page_image"])
        want = [(e["line_n"], e["word_n"], e["word_id"], e["text"],
                 e["conf"]) for e in m["expected"]]
        assert _merged_tuples(pa, pb, px[:, :, 0]) == want
        assert _merged_tuples(pa, pb, None) != want


def test_comb_image_text_alt_rescue():
    """textAlt rescue (compareOCRModule.js:885-899): when BOTH primary
    readings score > 0.5 against the scan and the raw Legacy
    classifier choice matches it, the alt text wins. Only reachable
    with an image — the no-image path leaves a_alt_err at 1.0."""
    import numpy as np

    from scribe_js_spark.operators.evalwords import draw_word

    truth = "12345"
    pa = _one_word_page("edcba", text_alt=truth)
    pb = _one_word_page("vwxyz")
    img = np.full((1000, 1000), 255, dtype=np.uint8)
    draw_word(img, truth, pa.lines[0].words[0].bbox)

    merged = comb_merge_page(pa, pb, legacy_lstm_comb=True,
                             page_image=img)
    assert merged.lines[0].words[0].text == truth
    # without the image the LSTM prior takes B instead
    merged = comb_merge_page(pa, pb, legacy_lstm_comb=True)
    assert merged.lines[0].words[0].text == "vwxyz"
