from scribe_js_spark.functions.stats import (
    js_round,
    mean50,
    quantile,
    round3,
    round6,
)
from scribe_js_spark.functions.textnorm import (
    calc_lang,
    remove_superscript,
    replace_ligatures,
    unescape_xml,
)


def test_quantile_matches_reference_definition():
    # sorted-index floor(n*q), NOT interpolated
    assert quantile([3, 1, 2], 0.5) == 2
    assert quantile([4, 3, 1, 2], 0.5) == 3  # floor(4*0.5)=2 -> sorted[2]
    assert quantile([1], 0.5) == 1
    assert quantile([], 0.5) is None
    assert quantile([5, 1, 9, 7], 0.25) == 5


def test_mean50_interquartile():
    # per25 = floor(n/4)-1, per75 = ceil(3n/4)-1
    arr = [1, 2, 3, 4, 5, 6, 7, 8]
    # per25 = 1, per75 = 5 -> slice [2..6] = [2,3,4,5,6] wait: indices 1..5
    assert mean50(arr) == sum([2, 3, 4, 5, 6]) / 5
    assert mean50([]) is None
    assert mean50([7]) == 7


def test_js_round_half_up():
    assert js_round(0.5) == 1
    assert js_round(1.5) == 2
    assert js_round(2.5) == 3  # python round() would give 2
    assert js_round(-0.5) == 0  # JS Math.round(-0.5) === -0
    assert round3(0.0015) == 0.002
    assert round6(1.2345675) == 1.234568


def test_ligatures():
    assert replace_ligatures("ﬁrm ﬂow oﬃce") == "firm flow office"
    assert replace_ligatures("plain") == "plain"


def test_unescape_xml():
    assert unescape_xml("a&amp;b &lt;c&gt; &quot;d&quot; &#x41;") == 'a&b <c> "d" A'
    assert unescape_xml("soft­hyphen") == "soft-hyphen"


def test_calc_lang():
    assert calc_lang("hello") == "eng"
    assert calc_lang("你好") == "chi_sim"
    assert calc_lang("привет") == "rus"


def test_remove_superscript():
    assert remove_superscript("x²") == "x2"
    assert remove_superscript("⁰¹²") == "012"
