"""Round-6 noop-sink isolation bench (guide 1.4/1.5) — NOT the driver
bench. Times each optimized query against a noop sink (computes every
column, discards the result) with best-of-N and a loadavg stamp, so
per-query numbers are attributable to the computation rather than the
sink or shared-VM weather. The frozen driver bench stays ``bench.py``.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from scribe_js_spark.pipeline import session_conf
    from scribe_js_spark.textops.dedup import (
        exact_dups,
        jaccard_for_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
        simhash,
        simhash_candidates,
    )
    from scribe_js_spark.textops.quality import (
        doc_stats,
        lang_id,
        token_counts,
    )
    from scribe_js_spark.textops.similarity import (
        ann_topk_bruteforce,
        ann_topk_lsh,
        embedding_near_dups,
        with_lsh_bucket,
    )

    spark = session_conf(
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scribe-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q10 = emb.filter(F.col("vec_id") < 10)

    pre_path = "/tmp/scribe_bench_extra_emb_pre_" + \
        SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    if not os.path.exists(pre_path):
        with_lsh_bucket(emb).write.mode("overwrite").parquet(pre_path)
    emb_pre = spark.read.parquet(pre_path)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    load0 = loadavg()

    def run(name, fn):
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        trials = []
        for _ in range(TRIALS):
            t0 = time.time()
            fn()
            trials.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(trials), "trials": trials}

    run("simhash_sig_only", lambda: noop(simhash(docs)))
    run("simhash_candidates", lambda: noop(simhash_candidates(docs)))
    run("minhash_sig_only", lambda: noop(minhash_signatures(docs)))
    run("minhash_lsh", lambda: noop(minhash_lsh_pairs(docs)))
    run("jaccard_verified", lambda: noop(jaccard_for_pairs(
        docs, minhash_lsh_pairs(docs), threshold=0.5)))
    run("lang_id", lambda: noop(lang_id(docs)))
    run("doc_stats", lambda: noop(doc_stats(docs)))
    run("token_counts", lambda: noop(token_counts(docs)))
    run("exact_dups", lambda: noop(exact_dups(docs)))
    run("ann_topk_bruteforce", lambda: noop(
        ann_topk_bruteforce(emb, q10, k=5)))
    run("ann_topk_lsh", lambda: noop(ann_topk_lsh(emb, q10, k=5)))
    run("ann_topk_lsh_prebucketed", lambda: noop(
        ann_topk_lsh(emb_pre, q10, k=5)))
    run("embedding_near_dups", lambda: noop(
        embedding_near_dups(emb, threshold=0.3)))

    print(json.dumps({
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "loadavg_before": load0,
        "loadavg_after": loadavg(),
        "queries": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
