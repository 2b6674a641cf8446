"""Component isolation for the scaling gap (one spark-submit level).

Times three stages over the bench corpus at the enclosing parallelism:
  scan     — parquet scan + count, no Python workers
  arrow    — mapInPandas that only sums len(data): Arrow transfer +
             Python worker round-trip without parse cost
  extract  — the full extract_text job (the protocol measurement)
Prints one JSON line with best-of-two wall seconds per stage.
"""

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

    spark = session_conf(
        SparkSession.builder
        .appName(f"isolate-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MPB", str(1024 * 1024)))
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)
    extract_text(corpus.limit(64), salt=False).count()  # warmup

    def scan():
        return corpus.agg(F.sum(F.length("html"))).collect()

    arrow_schema = StructType([StructField("n", LongType())])

    def arrow_only():
        def fn(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame(
                    {"n": [int(sum(len(d) for d in pdf["html"]))]})

        return corpus.select("html").mapInPandas(
            fn, schema=arrow_schema).agg(F.sum("n")).collect()

    def full():
        return extract_text(corpus, salt=False).agg(
            F.count("*")).collect()

    out = {"cpus": cpus}
    for name, fn in (("scan", scan), ("arrow", arrow_only),
                     ("extract", full)):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            sec = time.time() - t0
            best = sec if best is None or sec < best else best
        out[name] = round(best, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
