"""groupCharsIntoPage deferred-rule tests (orphan merge, ref markers,
drop caps, fake small caps, styleRuns)."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_groupx_models
from scribe_js_spark.render_pdf import render_pdf


def _words(doc_id):
    m = build_groupx_models(doc_id)
    res = extract_document(render_pdf(
        m["model"], tj_mode=False, rotate=False, ligatures=False,
        cid_font=False))
    assert res.error is None, res.error
    got = [(ln, wn, w.text, w.style.sup, w.style.dropcap,
            w.style.smallCaps, w.style.bold, w.styleRuns)
           for p in res.pages for ln, line in enumerate(p.lines)
           for wn, w in enumerate(line.words)]
    return got, m["expected"]


def test_groupx_scenarios_match_model():
    for doc_id in (0, 3, 11, 29):
        got, expected = _words(doc_id)
        simplified = [
            (g[0], g[1], g[2], g[3], g[4], g[5], g[6],
             len(g[7] or [])) for g in got]
        exp = [(r["line_n"], r["word_n"], r["text"], r["sup"],
                r["dropcap"], r["smallCaps"], r["bold"],
                r["n_style_runs"]) for r in expected]
        assert simplified == exp, doc_id


def test_style_run_content():
    got, _ = _words(0)
    runs = next(g[7] for g in got if g[2] == "bold.")
    # one delta at the ligature-expanded offset of the regular period
    assert runs == [{"i": 4, "style": {"bold": False}}]


def test_dropcap_word_size_and_smallcaps_size():
    got, _ = _words(0)
    m = build_groupx_models(0)
    res = extract_document(render_pdf(
        m["model"], tj_mode=False, rotate=False, ligatures=False,
        cid_font=False))
    by_text = {w.text: w for p in res.pages for line in p.lines
               for w in line.words}
    assert by_text["T"].style.size == 75.0      # dropcap keeps own size
    assert by_text["SMALL"].style.size == 30.0  # large-char size
    assert by_text["CAPS"].style.size == 30.0   # propagated base size


def test_inline_math_keeps_formula_on_one_line():
    from scribe_js_spark.fixtures import build_math_models

    for doc_id in (0, 7):
        m = build_math_models(doc_id)
        res = extract_document(render_pdf(
            m["model"], tj_mode=False, rotate=False, ligatures=False,
            cid_font=False))
        assert res.error is None
        got = [(ln, wn, w.text, w.style.sup)
               for p in res.pages for ln, line in enumerate(p.lines)
               for wn, w in enumerate(line.words)]
        exp = [(r["line_n"], r["word_n"], r["text"], r["sup"])
               for r in m["expected"]]
        assert got == exp
        # the formula stays one visual line: exactly 3 lines total
        assert len(res.pages[0].lines) == 3
