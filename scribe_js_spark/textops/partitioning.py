"""Scale-adaptive input fan-out for small or unsplittable scans.

Parquet assigns scan tasks by BYTE RANGES, but rows only land in the
task whose range contains a row group's midpoint: a file written as
ONE row group claims many splits yet delivers every row to a single
task, so each per-row stage above it runs single-threaded no matter
what ``spark.sql.files.maxPartitionBytes`` says (guide 2.5, "input
skew: one huge unsplittable file ... repartition immediately after
the read"). The driver's sf tables are exactly that shape — one row
group per table — which serialized the map side of every text/vector
operator on a 32-core box. ``rdd.getNumPartitions()`` cannot detect
this (it reports the CLAIMED splits), so the trigger here is the
optimizer's size estimate instead.

``spread_input`` round-robin-repartitions the (already projected)
input to the cluster's default parallelism when the whole input is
estimated under ``SPARK_GRAFT_SPREAD_MAX_BYTES`` (default 256 MB):
small enough that the one-off shuffle is negligible next to the
per-row work it parallelizes, and far below anything a real corpus
scan produces — at scale inputs arrive in hundreds of genuinely
populated splits and this is a no-op, so nothing here is tuned to
local[32]. Keyless repartition is deterministic (Spark sorts before
round-robin distribution — ``spark.sql.execution.sortBeforeRepartition``
— so retried tasks reproduce the same assignment), and every operator
using it computes per-row / order-independent aggregates, so results
are identical under any partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Inputs estimated smaller than this are spread to default
#: parallelism; env-overridable for other deployments.
SPREAD_MAX_BYTES = int(os.environ.get(
    "SPARK_GRAFT_SPREAD_MAX_BYTES", str(256 * 1024 * 1024)))


def _estimated_bytes(df: DataFrame) -> int | None:
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = stats.sizeInBytes()
        # py4j maps scala.math.BigInt to int for values in long range;
        # fall back to its string form otherwise
        return size if isinstance(size, int) else int(size.toString())
    except Exception:
        return None


def spread_input(df: DataFrame, columns: list[str] | None = None,
                 ) -> DataFrame:
    """Project to ``columns`` (shuffle only the bytes the operator
    needs — guide 2.3) and repartition to default parallelism when the
    optimizer estimates the input below the spread threshold."""
    if columns is not None:
        df = df.select(*columns)
    size = _estimated_bytes(df)
    if size is None or size >= SPREAD_MAX_BYTES:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)
