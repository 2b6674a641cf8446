"""Interleaved A/B: mapInPandas vs mapInArrow extract path (cancels
box drift by alternating within one session). One JSON line."""

from __future__ import annotations

import json
import os
import time


def main():
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from scribe_js_spark.pipeline import extract_text, session_conf

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_path = os.environ["SPARK_GRAFT_CORPUS"]

    spark = session_conf(
        SparkSession.builder
        .appName(f"arrow-ab-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(corpus_path)

    def run(arrow: bool) -> float:
        os.environ["SPARK_GRAFT_ARROW"] = "1" if arrow else "0"
        t0 = time.time()
        extract_text(corpus, salt=False).agg(F.count("*")).collect()
        return time.time() - t0

    run(False)  # warm both worker pools + page cache
    run(True)
    best = {"pandas": None, "arrow": None}
    for _ in range(3):
        for name, arrow in (("pandas", False), ("arrow", True)):
            sec = run(arrow)
            if best[name] is None or sec < best[name]:
                best[name] = round(sec, 2)
    print(json.dumps({"cpus": cpus, **best}))
    spark.stop()


if __name__ == "__main__":
    main()
