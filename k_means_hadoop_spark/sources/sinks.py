"""Final labeled-output sinks (S6) — reference ``printOutputFile``
(KMeans.java:348-372).

Two projections of the final assignment table, both tab-separated text:

- ``finalOutput.txt``            :  id \t cluster \t f1..fd   (:353-357)
- ``*_cluster_data_toPlot.txt``  :  f1..fd \t cluster         (:360-365)

The reference writes them driver-side from the in-memory DataStore; the
engine writes them distributed (``df.write``).  Order is unspecified in
the reference (HashMap iteration, :352).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def final_output_lines(assignments: DataFrame) -> DataFrame:
    return assignments.select(
        F.concat_ws(
            "\t", F.col("id"), F.col("cluster"), F.array_join(F.col("features"), "\t")
        ).alias("value")
    )


def plot_output_lines(assignments: DataFrame) -> DataFrame:
    return assignments.select(
        F.concat_ws("\t", F.array_join(F.col("features"), "\t"), F.col("cluster")).alias("value")
    )


def write_final_output(assignments: DataFrame, path: str) -> None:
    final_output_lines(assignments).write.mode("overwrite").text(path)


def write_plot_output(assignments: DataFrame, path: str) -> None:
    plot_output_lines(assignments).write.mode("overwrite").text(path)


def write_documents_jsonl(documents: DataFrame, path: str) -> None:
    """JSONL corpus sink (beyond-reference) — the interchange format
    training-data pipelines exchange: one JSON object per line,
    gzip-compressed so each output file is a self-contained splittable-
    by-file shard.  Writes distributed (one file per partition); at
    100 TB the shard count is the write parallelism, so repartition
    upstream to the shard size you want.
    """
    documents.write.mode("overwrite").option("compression", "gzip").json(path)


def read_documents_jsonl(spark, path: str, schema=None) -> DataFrame:
    """JSONL corpus source.  An EXPLICIT schema skips Spark's inference
    pass (a full extra read of the corpus) and is mandatory at scale;
    falls back to inference only for ad-hoc use.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Date-partitioned parquet sink (beyond-reference; the reference's
    only sinks are the flat text files above).

    ``partitionBy(event_date)`` is the 100 TB layout: readers with a
    date predicate prune whole directories before any I/O (the plan
    shows it under ``PartitionFilters``, not ``PushedFilters``), and
    daily ingest appends one directory without touching the rest.
    """
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def write_clustered_parquet(
    df: DataFrame, path: str, cluster_col: str, n_files: int = 8
) -> None:
    """Range-clustered parquet sink (Z-order-lite for one key): rows are
    range-partitioned on ``cluster_col`` and sorted within each file, so
    every output file owns a disjoint key range and its parquet
    row-group min/max stats become an index — a reader with a range
    predicate skips whole files/row-groups before decompressing anything.

    At 100 TB this is the layout step run once after curation so that
    every later scan with a time/key predicate reads a sliver; locally
    the disjointness of per-file min/max is asserted in
    tests/test_bucketing.py via pyarrow metadata.
    """
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark, in_path: str, out_path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction — the table-maintenance pass every long-
    lived ingest needs: N tiny parquet files become ceil(bytes /
    target_bytes) right-sized files, content-identical.

    The target file count comes from the INPUT'S ACTUAL BYTES (listed
    driver-side, no data read), and the rewrite uses ``coalesce`` —
    a narrow dependency that concatenates input splits into fewer
    tasks WITHOUT a shuffle; rows never leave their executor.  (A
    repartition would shuffle the whole table to achieve the same file
    count — the classic compaction mistake at 100 TB.)  Returns the
    target file count."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(in_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(in_path).coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
