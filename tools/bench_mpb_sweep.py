"""Interleaved maxPartitionBytes sweep (cancels box drift): within one
session, alternate the candidate values round-robin and report the best
wall time per value for the arrow-only and full-extract jobs."""

from __future__ import annotations

import json
import os
import time


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession
    from pyspark.sql.types import LongType, StructField, StructType

    from scribe_js_spark.pipeline import extract_text, session_conf

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    corpus_path = os.environ["SPARK_GRAFT_CORPUS"]
    values = [256 * 1024, 1024 * 1024, 4 * 1024 * 1024]

    spark = session_conf(
        SparkSession.builder
        .appName(f"mpbsweep-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)
    schema = StructType([StructField("n", LongType())])

    def arrow_fn(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"n": [int(sum(len(d) for d in pdf["html"]))]})

    def run_arrow():
        return corpus.select("html").mapInPandas(
            arrow_fn, schema=schema).agg(F.sum("n")).collect()

    def run_extract():
        return extract_text(corpus, salt=False).agg(F.count("*")).collect()

    # Warm python workers + page cache once at default conf.
    run_arrow()

    best: dict = {}
    for _ in range(3):
        for mpb in values:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
            for name, fn in (("arrow", run_arrow), ("extract", run_extract)):
                t0 = time.time()
                fn()
                sec = time.time() - t0
                key = f"{name}_{mpb // 1024}k"
                if key not in best or sec < best[key]:
                    best[key] = round(sec, 2)
    print(json.dumps({"cpus": cpus, **best}))
    spark.stop()


if __name__ == "__main__":
    main()
