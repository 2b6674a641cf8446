"""Probe the anti-scaling Arrow path: arrow-only stage at the enclosing
parallelism across several maxPartitionBytes values, one JSON line."""

from __future__ import annotations

import json
import os
import time


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    from scribe_js_spark.pipeline import session_conf

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    corpus_path = os.environ["SPARK_GRAFT_CORPUS"]
    mpb = os.environ.get("SPARK_GRAFT_MPB", str(256 * 1024))

    spark = session_conf(
        SparkSession.builder
        .appName(f"arrowprobe-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)
    schema = StructType([StructField("n", LongType())])

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"n": [int(sum(len(d) for d in pdf["html"]))]})

    df = corpus.select("html").mapInPandas(fn, schema=schema)
    nparts = df.rdd.getNumPartitions()
    df.agg(F.sum("n")).collect()  # warm
    best = None
    for _ in range(2):
        t0 = time.time()
        df.agg(F.sum("n")).collect()
        sec = time.time() - t0
        best = sec if best is None or sec < best else best
    print(json.dumps({"cpus": cpus, "mpb": int(mpb), "parts": nparts,
                      "sec": round(best, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
