"""URL normalization / domain extraction (pure JVM expressions)."""

import pyspark.sql.functions as F


def _norm(spark, urls):
    from scribe_js_spark.textops.urlops import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


def test_normalize_url_cases(spark):
    cases = {
        # scheme+host lowercase; path case preserved
        "HTTPS://Example.COM/Path/To": "https://example.com/Path/To",
        # default ports dropped; non-default kept
        "http://example.com:80/a": "http://example.com/a",
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:8080/a": "http://example.com:8080/a",
        # fragment stripped; empty path -> /
        "https://example.com#frag": "https://example.com/",
        # tracking params stripped, survivors sorted
        "https://a.com/p?utm_source=x&b=2&a=1&fbclid=zz":
            "https://a.com/p?a=1&b=2",
        # all params tracking -> no query at all
        "https://a.com/p?utm_campaign=c&gclid=g": "https://a.com/p",
        # plain url unchanged
        "https://a.com/p?x=1": "https://a.com/p?x=1",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_registrable_domain(spark):
    from scribe_js_spark.textops.urlops import registrable_domain

    cases = {
        "https://www.example.com/x": "example.com",
        "http://news.bbc.CO.UK/story": "bbc.co.uk",
        "https://a.b.c.example.com.au/": "example.com.au",
        "https://localhost/": "localhost",
        "https://sub.deep.example.org/p?q=1": "example.org",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = [r[0] for r in df.select(
        registrable_domain(F.col("url"))).collect()]
    assert got == list(cases.values())


def test_domain_stats_dedup_ratio(spark):
    from scribe_js_spark.textops.urlops import domain_stats

    urls = [
        "https://www.site.com/a?utm_source=x",
        "https://site.com/a",                    # same normalized path,
        "https://WWW.Site.com/a#frag",           # but www. differs in norm
        "https://site.com/b",
        "https://other.org/",
    ]
    rows = {r["domain"]: r for r in domain_stats(
        spark.createDataFrame([(u,) for u in urls], ["url"])).collect()}
    assert rows["site.com"]["n_pages"] == 4
    # normalization folds the first three to two distinct urls
    # (www.site.com/a vs site.com/a) + /b -> 3 distinct
    assert rows["site.com"]["n_distinct_urls"] == 3
    assert rows["other.org"]["n_pages"] == 1


def test_normalize_is_whole_stage_codegen(spark):
    """No Python UDF in the plan: the normalization must stay inside
    WholeStageCodegen."""
    from scribe_js_spark.textops.urlops import normalize_url

    df = spark.createDataFrame([("https://a.com/x?b=1&a=2",)], ["url"])
    plan = df.select(normalize_url(F.col("url"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_domain_stats_approx_plan_has_single_shuffle(spark):
    from scribe_js_spark.textops.urlops import domain_stats

    df = spark.createDataFrame(
        [(f"https://s{i % 3}.com/p{i}",) for i in range(30)], ["url"])
    exact = domain_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    approx = domain_stats(df, approx=True)._jdf.queryExecution() \
        .executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange", approx)) \
        < len(re.findall(r"Exchange", exact))
    rows = {r["domain"]: r for r in
            domain_stats(df, approx=True).collect()}
    assert rows["s0.com"]["n_pages"] == 10


def test_page_policy_signals(spark):
    from scribe_js_spark.textops.urlops import page_policy_signals

    rows = [
        (1, b'<html lang="en"><head>'
            b'<meta name="robots" content="noindex, nofollow">'
            b'<link rel="canonical" href="https://a.com/x"></head>'
            b'<body>hi</body></html>'),
        (2, b'<html lang="de-DE"><head>'
            b'<meta content="index,follow" name="robots">'
            b'<a rel="license" href='
            b'"https://creativecommons.org/licenses/by/4.0/">CC</a>'
            b'</head></html>'),
        (3, b'<html><body>see https://creativecommons.org/licenses/'
            b'by-sa/3.0/ inline</body></html>'),
        (4, b'plain no signals at all'),
    ]
    out = {r["doc_id"]: r for r in page_policy_signals(
        spark.createDataFrame(rows, ["doc_id", "html"])).collect()}
    assert out[1]["noindex"] and out[1]["nofollow"]
    assert out[1]["canonical_url"] == "https://a.com/x"
    assert not out[2]["noindex"]
    assert out[2]["license_url"].endswith("/by/4.0/")
    assert out[2]["declared_lang"] == "de-DE"
    assert out[3]["license_url"].endswith("/by-sa/3.0/")
    assert out[4]["canonical_url"] is None
    # plan stays JVM-side
    plan = page_policy_signals(
        spark.createDataFrame(rows, ["doc_id", "html"]))._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
