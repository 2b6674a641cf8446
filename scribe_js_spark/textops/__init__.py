

def build_training_corpus(docs, text_col: str = "text",
                          min_tokens: int = 10,
                          near_dup_threshold: float = 0.8,
                          scrub_pii: bool = False):
    """The end-to-end cleaning pipeline in one call — the shape a
    training-data run actually executes:

      quality gate (JVM predicate) -> exact dedup (md5 hash-groupBy,
      keep the canonical copy) -> near-dup removal (MinHash-LSH
      candidates -> exact-Jaccard verify, drop the higher doc_id of
      each confirmed pair) [-> PII redaction when ``scrub_pii``:
      the text column is replaced with its typed-token scrub and
      pii_* counters join the stats]

    Returns (clean DataFrame with the input's columns, stats dict of
    exact integer counters). Every stage is the scale-safe plan shape
    audited in PLANS.md: text never shuffles except as the token
    arrays of verified candidate pairs.
    """
    import pyspark.sql.functions as F

    from .dedup import exact_dups, jaccard_for_pairs, minhash_lsh_pairs
    from .quality import quality_filter

    n_input = docs.count()
    q = quality_filter(docs, text_col=text_col, min_tokens=min_tokens)
    n_quality = q.count()

    canon = exact_dups(q, text_col=text_col) \
        .filter(F.col("doc_id") == F.col("canonical_id")) \
        .select("doc_id")
    uniq = q.join(canon, "doc_id")
    n_exact = uniq.count()

    candidates = minhash_lsh_pairs(uniq, text_col=text_col)
    confirmed = jaccard_for_pairs(uniq, candidates, text_col=text_col,
                                  threshold=near_dup_threshold)
    drop = confirmed.select(
        F.col("doc_b").alias("doc_id")).distinct()
    clean = uniq.join(drop, "doc_id", "left_anti")
    n_clean = clean.count()

    pii_stats = {}
    if scrub_pii:
        from .quality import pii_scrub

        scrubbed = pii_scrub(clean, text_col=text_col)
        agg = scrubbed.agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_ipv4").alias("i"),
            F.sum("n_phones").alias("p")).collect()[0]
        pii_stats = {
            "pii_emails": int(agg["e"] or 0),
            "pii_ipv4": int(agg["i"] or 0),
            "pii_phones": int(agg["p"] or 0),
        }
        cols_before = clean.columns
        clean = scrubbed.drop(text_col, "n_emails", "n_ipv4",
                              "n_phones") \
            .withColumnRenamed("text_scrubbed", text_col) \
            .select(*cols_before)

    stats = {
        "input_docs": n_input,
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_clean,
        "dropped_quality": n_input - n_quality,
        "dropped_exact": n_quality - n_exact,
        "dropped_near": n_exact - n_clean,
        **pii_stats,
    }
    return clean, stats
