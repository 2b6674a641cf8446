"""One timed extraction run against a given code tree.

Usage: bench_parity_worker.py <tree> <corpus_parquet> <cpus>

Imports scribe_js_spark from <tree> (so the same corpus can be driven
by two code versions in one session), runs extract_text best-of-2 and
a pure-JVM doc_stats probe, prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    tree, corpus_path, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, tree)

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from scribe_js_spark.pipeline import extract_text, session_conf

    spark = session_conf(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-parity")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)
    extract_text(corpus.limit(32), salt=False).count()  # warmup

    trials = []
    n = 0
    for _ in range(2):
        t0 = time.time()
        n = extract_text(corpus, salt=False) \
            .filter(F.col("error").isNull()).count()
        trials.append(round(time.time() - t0, 3))

    # pure-JVM zero-dependence probe: the same plan in both trees, so
    # any delta here is box state, not code
    docs = spark.range(0, 200_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h"))
    t0 = time.time()
    docs.groupBy(F.substring("h", 1, 2)).count().collect()
    jvm_probe = round(time.time() - t0, 3)

    print(json.dumps({
        "tree": tree,
        "extract_trials": trials,
        "extract_best": min(trials),
        "docs": n,
        "docs_per_sec": round(n / min(trials), 1),
        "jvm_probe": jvm_probe,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
