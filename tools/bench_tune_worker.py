"""Scaling-tax tuning worker: one extraction run with knob overrides
from env (SPARK_GRAFT_MPB bytes, SPARK_GRAFT_ARB records). Prints one
JSON line. Used by the round-3 sweep to find the config that minimizes
the Spark-vs-multiprocessing overhead at both protocol levels."""

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
    mpb = int(os.environ.get("SPARK_GRAFT_MPB", 256 * 1024))
    arb = int(os.environ.get("SPARK_GRAFT_ARB", 64))

    spark = session_conf(
        SparkSession.builder
        .appName(f"tune-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
    ) \
        .config("spark.sql.files.maxPartitionBytes", str(mpb)) \
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arb)) \
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)
    extract_text(corpus.limit(64), salt=False).count()  # warmup

    best = None
    for _ in range(3):
        t0 = time.time()
        res = extract_text(corpus, salt=False, page_split_bytes=None)
        agg = res.agg(
            F.count("*").alias("docs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
            .alias("failed")).collect()[0]
        sec = time.time() - t0
        if best is None or sec < best:
            best = sec
    print(json.dumps({
        "cpus": cpus, "mpb": mpb, "arb": arb,
        "docs": agg["docs"], "failed": int(agg["failed"] or 0),
        "sec": round(best, 2),
        "docs_per_sec": round(agg["docs"] / best, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
