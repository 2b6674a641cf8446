"""n-gram (shingle) Jaccard vs token-set Jaccard."""


def test_ngram_jaccard_is_order_sensitive(spark):
    from scribe_js_spark.textops.dedup import jaccard_for_pairs

    # same bag of words, different order: token Jaccard = 1.0,
    # 3-gram Jaccard is far lower
    t1 = "the quick brown fox jumps over the lazy dog again today"
    t2 = "today again dog lazy the over jumps fox brown quick the"
    df = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t1)], ["doc_id", "text"])
    cand = spark.createDataFrame([(1, 2), (1, 3)], ["doc_a", "doc_b"])

    tok = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
           for r in jaccard_for_pairs(df, cand, threshold=0.0).collect()}
    assert tok[(1, 2)][0] == tok[(1, 2)][1]  # identical token sets

    ng = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
          for r in jaccard_for_pairs(
              df, cand, threshold=0.0, ngram=3).collect()}
    assert ng[(1, 3)][0] == ng[(1, 3)][1]    # identical docs still 1.0
    assert ng[(1, 2)][0] * 2 < ng[(1, 2)][1]  # reordering drops below 0.5


def test_ngram_jaccard_pairs_end_to_end(spark):
    from scribe_js_spark.textops.dedup import jaccard_pairs

    t = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"
    other = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, t), (2, near), (3, other)], ["doc_id", "text"])
    rows = {(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(
        df, threshold=0.5, ngram=2).collect()}
    assert (1, 2) in rows and (1, 3) not in rows


def test_winnowing_guarantee(spark):
    """The MOSS property: documents sharing a substring of length
    >= k + w - 1 share at least one selected fingerprint."""
    import pyspark.sql.functions as F

    from scribe_js_spark.textops.quality import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "PREFIX AAA " + shared + " SUFFIX BBB"),
        (2, "other start text " + shared + " other ending words"),
        (3, "completely unrelated content with zero overlap at all"),
        (4, "tiny"),  # shorter than k: empty fingerprint set
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # recover the raw selections by grouping equal winnow hashes is
    # not enough — use the per-doc selected sets via a self-join on
    # exploded fingerprints
    t = F.col("text")
    k, w = 8, 4
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - k + 1),
        lambda i: F.md5(F.substring(t, i, F.lit(k))))
    minima = F.transform(
        F.sequence(F.lit(1), F.size(grams) - w + 1),
        lambda j: F.array_min(F.slice(grams, j, w)))
    sets = df.filter(F.length(t) >= k + w - 1).select(
        "doc_id", F.explode(F.array_distinct(minima)).alias("fp"))
    pairs = {(r["a"], r["b"]) for r in
             sets.alias("x").join(
                 sets.alias("y"),
                 on=[F.col("x.fp") == F.col("y.fp"),
                     F.col("x.doc_id") < F.col("y.doc_id")])
             .select(F.col("x.doc_id").alias("a"),
                     F.col("y.doc_id").alias("b")).distinct().collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)

    out = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    assert out[4]["n_fingerprints"] == 0
    assert out[1]["n_fingerprints"] > 0
    assert out[1]["winnow_sig"] != out[2]["winnow_sig"]


def test_repetition_signals(spark):
    from scribe_js_spark.textops.quality import repetition_signals

    rows = [
        (1, "line one\nline two\nline one\n\npara a\n\npara a"),
        (2, "- bullet\n* another\nends here...\nmore…"),
        (3, "123 456 !!! abc d3f"),
    ]
    out = {r["doc_id"]: r for r in repetition_signals(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out[1]["n_dup_lines"] == 2 and out[1]["n_dup_paras"] == 1
    assert out[2]["bullet_lines"] == 2 and out[2]["ellipsis_lines"] == 2
    assert out[3]["alpha_tokens"] == 2


def test_script_id_dominant_scripts(spark):
    from scribe_js_spark.textops.quality import script_id

    rows = [
        (1, "hello latin world"),
        (2, "Привет мир как дела"),
        (3, "日本語のテキストです"),       # kana outnumbers han here
        (4, "中文文本没有假名"),           # pure han
        (5, "مرحبا بالعالم"),
        (6, "한국어 텍스트"),
        (7, "12345 !!!"),
    ]
    out = {r["doc_id"]: r["script"] for r in script_id(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out == {1: "latin", 2: "cyrillic", 3: "kana", 4: "han",
                   5: "arabic", 6: "hangul", 7: "und"}


def test_lang_id_extended_languages(spark):
    from scribe_js_spark.textops.quality import lang_id

    rows = [
        (1, "il cane che corre nella via della città"),
        (2, "o resultado foi uma das melhores notícias"),
        (3, "het is een mooie dag maar niet koud"),
        (4, "och sedan gick det att se det hela"),
        (5, "bir gün ve sonra için çok şey"),
        (6, "yang penting dan baik di sini"),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("x"))
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert out == {1: "it", 2: "pt", 3: "nl", 4: "sv", 5: "tr", 6: "id"}
