"""Partitioning helpers.

``fan_out`` fixes the small-file parallelism trap: a parquet file with a
single row-group arrives as ONE input split, so every downstream
explode/hash/aggregate runs single-threaded no matter how many cores the
cluster has.  At real scale (TB-range inputs, many files / row-groups)
the scan already yields >= parallelism splits and this is a no-op — the
repartition only fires when the scan is narrower than the cluster, so it
never introduces a full-corpus shuffle on a well-partitioned 100 TB
input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan's input parallelism is below
    the cluster's default parallelism (or ``min_parts``)."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
