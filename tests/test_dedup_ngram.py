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
