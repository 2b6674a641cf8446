"""Dump full .explain("formatted") plans for the round-6 optimization
targets into plans/r06/<query>_<suffix>.txt.

Usage: python tools/r06_plans.py before|after [only1,only2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from scribe_js_spark.pipeline import session_conf
    from scribe_js_spark.textops.dedup import (
        jaccard_for_pairs,
        minhash_lsh_pairs,
        simhash_candidates,
    )
    from scribe_js_spark.textops.quality import lang_id
    from scribe_js_spark.textops.similarity import (
        ann_topk_bruteforce,
        ann_topk_lsh,
        embedding_near_dups,
        with_lsh_bucket,
    )

    spark = session_conf(
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q10 = emb.filter(F.col("vec_id") < 10)

    pre_path = "/tmp/r06_emb_prebucketed"
    if not os.path.exists(pre_path):
        with_lsh_bucket(emb).write.mode("overwrite").parquet(pre_path)
    emb_pre = spark.read.parquet(pre_path)

    targets = {
        "simhash_candidates": lambda: simhash_candidates(docs),
        "embedding_near_dups": lambda: embedding_near_dups(
            emb, threshold=0.3),
        "ann_topk_bruteforce": lambda: ann_topk_bruteforce(emb, q10, k=5),
        "ann_topk_lsh": lambda: ann_topk_lsh(emb, q10, k=5),
        "ann_topk_lsh_prebucketed": lambda: ann_topk_lsh(emb_pre, q10, k=5),
        "lang_id": lambda: lang_id(docs),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(docs),
        "jaccard_verified": lambda: jaccard_for_pairs(
            docs, minhash_lsh_pairs(docs), threshold=0.5),
    }

    os.makedirs("plans/r06", exist_ok=True)
    for name, fn in targets.items():
        if only is not None and name not in only:
            continue
        df = fn()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
