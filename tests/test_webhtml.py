"""Web-HTML main-content extraction tests (boilerplate strip)."""

from scribe_js_spark.extract import extract_document
from scribe_js_spark.fixtures import build_webhtml_models
from scribe_js_spark.operators.detect import detect_document_format
from scribe_js_spark.operators.webhtml import extract_main_content


def test_detection_routes_raw_html_not_hocr():
    m = build_webhtml_models(0)
    assert detect_document_format(m["html"].encode()) == "webhtml"
    # hOCR keeps its own route
    from scribe_js_spark.fixtures import build_doc_model, render_hocr

    hocr = render_hocr(build_doc_model(0)).encode()
    assert detect_document_format(hocr) == "hocr"


def test_family_byte_identity():
    for doc_id in (0, 1, 2, 3, 17):
        m = build_webhtml_models(doc_id)
        res = extract_document(m["html"].encode())
        assert res.error is None
        assert res.fmt == "webhtml"
        assert res.text == m["expected"], doc_id


def test_boilerplate_dropped_entities_unescaped():
    paras = extract_main_content(
        "<html><body><nav><a href=/>Home</a><a href=/b>B</a></nav>"
        "<article><p>Real body text with plenty of words to keep "
        "the content detector satisfied &amp; happy.</p></article>"
        '<div class="sidebar"><a href=1>x</a></div>'
        "<footer><a href=/p>Privacy</a></footer></body></html>")
    assert paras == ["Real body text with plenty of words to keep "
                     "the content detector satisfied & happy."]


def test_link_farm_paragraph_dropped():
    paras = extract_main_content(
        "<html><body><article>"
        "<p>Legitimate article paragraph with enough prose to "
        "dominate the page's text mass easily.</p>"
        '<p><a href=1>list one</a> <a href=2>list two</a> '
        "<a href=3>list three</a></p>"
        "</article></body></html>")
    assert len(paras) == 1
    assert paras[0].startswith("Legitimate")


def test_malformed_html_never_fatal():
    res = extract_document(
        b"<html><body><div><p>unclosed everywhere <b>bold")
    assert res.error is None
    assert "unclosed everywhere bold" in res.text


def test_script_style_contents_never_leak():
    paras = extract_main_content(
        "<html><head><script>var secret = 'leak';</script>"
        "<style>.x{color:red}</style></head><body><main>"
        "<p>Visible paragraph with sufficient length for the "
        "candidate selection heuristics here.</p></main></body></html>")
    joined = " ".join(paras)
    assert "leak" not in joined and "color" not in joined


def test_pii_scrub_cross_engine_agreement(spark):
    """Spark's JVM pii_scrub and the fixture-side Python mirror
    (_pii_golden) agree byte-for-byte on every web-family golden —
    the patterns live in the Java/Python/RE2-common regex subset."""
    import pandas as pd

    from scribe_js_spark.fixtures import _pii_golden
    from scribe_js_spark.textops.quality import pii_scrub

    g = pd.read_parquet("fixtures/t2/webhtml.parquet")
    df = spark.createDataFrame(g[["url", "text"]])
    rows = {r["url"]: r for r in pii_scrub(df).collect()}
    for _, row in g.iterrows():
        want = _pii_golden(row["text"])
        got = rows[row["url"]]
        assert got["text_scrubbed"] == want["pii_scrubbed"], row["url"]
        assert got["n_emails"] == want["n_emails"]
        assert got["n_ipv4"] == want["n_ipv4"]
        assert got["n_phones"] == want["n_phones"]
        assert "<EMAIL>" in got["text_scrubbed"]


def test_hidden_elements_pruned():
    """hidden attr / display:none / visibility:hidden / aria-hidden
    subtrees never reach the output even inside the content root."""
    from scribe_js_spark.operators.webhtml import extract_main_content

    html = (
        "<html><body><article><h1>Title here</h1>"
        "<p>visible paragraph one with enough text to count</p>"
        "<div hidden><p>hidden A</p></div>"
        '<div style="display:none"><p>hidden B</p></div>'
        '<div style="visibility: hidden"><p>hidden C</p></div>'
        '<span aria-hidden="true">hidden D</span>'
        '<p aria-hidden="false">visible two</p>'
        "</article></body></html>")
    got = "\n".join(extract_main_content(html))
    assert "visible paragraph one" in got and "visible two" in got
    for leak in ("hidden A", "hidden B", "hidden C", "hidden D"):
        assert leak not in got
