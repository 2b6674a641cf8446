"""One scaling-run worker: extraction over the bench corpus at the
parallelism of the enclosing spark-submit. Prints one JSON line."""

from __future__ import annotations

import json
import os
import time


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from scribe_js_spark.pipeline import extract_text, session_conf

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    corpus_path = os.environ["SPARK_GRAFT_CORPUS"]

    spark = session_conf(
        SparkSession.builder
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)

    # Warmup: spin up executors + Python workers outside the window.
    extract_text(corpus.limit(64), salt=False).count()

    t0 = time.time()
    res = extract_text(corpus, salt=True, num_partitions=cpus * 4)
    agg = res.agg(
        F.count("*").alias("docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("failed"),
    ).collect()[0]
    sec = time.time() - t0

    print(json.dumps({
        "cpus": cpus,
        "docs": agg["docs"],
        "failed": int(agg["failed"] or 0),
        "sec": round(sec, 2),
        "docs_per_sec": round(agg["docs"] / sec, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
