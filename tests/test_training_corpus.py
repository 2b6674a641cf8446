"""The one-call cleaning pipeline."""


def test_build_training_corpus(spark):
    from scribe_js_spark.textops import build_training_corpus

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("kappa", "kappa2")),        # near dup of 1
        (4, "totally different words entirely here today my friend "
            "with plenty of tokens to pass the quality gate okay"),
        (5, "short"),                                # fails quality
        (6, "!!! ??? ... ,,, ;;; !!! ??? ... ,,, ;;; !!! ??? ..."),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    clean, stats = build_training_corpus(docs, min_tokens=10,
                                         near_dup_threshold=0.7)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert stats["input_docs"] == 6
    assert stats["dropped_quality"] == 2          # 5 (short) + 6 (punct)
    assert stats["dropped_exact"] == 1            # doc 2
    assert stats["dropped_near"] == 1             # doc 3
    assert kept == [1, 4]
    # clean keeps the input schema
    assert set(clean.columns) == {"doc_id", "text"}
