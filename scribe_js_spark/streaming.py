"""Structured Streaming front-ends.

The reference is strictly batch-per-document (SURVEY.md §2.12) — these
wrap the same extraction operators for incremental operation, the
Spark-native analog of re-running `extractTextDir` over a growing
directory:

- ``stream_extract_text``: ``readStream`` over a corpus directory ->
  the identical mapInPandas extraction -> ``writeStream`` with
  checkpointing. With ``Trigger.AvailableNow`` this is an incremental
  batch: each invocation processes only files added since the last
  checkpoint (the Iceberg-snapshot incremental pattern from SURVEY.md
  §2.12).
- ``stream_events_hourly``: event-time tumbling-window aggregation with
  a watermark for late data — the standard stateful-streaming shape for
  the metrics feed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .pipeline import EXTRACT_SCHEMA, _extract_batches

CORPUS_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def stream_extract_text(spark: SparkSession, input_dir: str,
                        output_dir: str, checkpoint_dir: str,
                        available_now: bool = True):
    """Incremental extraction over a growing parquet directory.

    Returns the started StreamingQuery; with ``available_now`` the query
    drains everything new and stops (call ``awaitTermination``).
    """
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
        .select("url", "html")
    )

    def fn(batches):
        return _extract_batches(batches, with_spans=False)

    extracted = stream.mapInPandas(fn, schema=EXTRACT_SCHEMA)
    writer = (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_hourly(spark: SparkSession, events_stream: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream:
    (window, event_type) -> count + value cents. Feed any streaming
    source with (ts timestamp, event_type string, value double)."""
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("sum_cents"),
        )
        .select(
            F.col("win.start").alias("hour"), "event_type",
            "n_events", "sum_cents")
    )
