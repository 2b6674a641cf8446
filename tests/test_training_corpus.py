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


def test_training_corpus_pii_stage(spark):
    # texts must be genuinely distinct or the near-dedup stage
    # (correctly) removes them before the PII stage counts anything
    import random

    rng = random.Random(11)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau").split()
    docs = spark.createDataFrame(
        [(i, " ".join(rng.sample(words, 12)) + " "
          + " ".join(rng.sample(words, 8))
          + f" reach me at user{i}@mail.example.org now")
         for i in range(4)],
        ["doc_id", "text"])
    from scribe_js_spark.textops import build_training_corpus

    clean, stats = build_training_corpus(docs, scrub_pii=True)
    # the scrub stage must not reorder columns: positional consumers
    # see the same layout whether or not the flag is on
    assert clean.columns == docs.columns
    assert stats["pii_emails"] == 4
    texts = [r["text"] for r in clean.collect()]
    assert all("<EMAIL>" in t for t in texts)
    assert not any("@mail.example.org" in t for t in texts)
