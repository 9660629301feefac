"""Centroid-state wire format (S3/S5/S7) — reference file interop.

Reference text format, one line per centroid
(writer ``Centroid.toString`` KMeans.java:516-526, initial-seed writer
:595-614; readers: mapper setup :50-71, driver :257-274, formatter
:321-342):

    clusterId \t v1 \t v2 ... \t id1|id2|...| \t -<count>

- the member-id token is pipe-separated WITH a trailing pipe;
- the cluster size is serialized negated (``-<count>``, :524);
- the initial seed file has only ``clusNum \t v1..vd \t`` (no members);
- readers stop feature parsing at the first token containing ``|``
  (the ``indexOf('|')`` break, :62-64).

In the Spark engine centroids normally live driver-side (k×d) and never
touch a filesystem; these readers/writers exist purely for reference
file interoperability and are exact inverses of each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_centroid_file(spark: SparkSession, path: str) -> DataFrame:
    """Parse the wire format → (cluster INT, centroid ARRAY<DOUBLE>,
    member_ids ARRAY<INT>, size BIGINT); member_ids/size NULL for the
    initial-seed variant."""
    lines = spark.read.text(path)
    arr = F.filter(
        F.split(F.regexp_replace(F.col("value"), r"\r$", ""), "\t"),
        lambda t: t != "",
    )
    rest = F.slice(arr, 2, F.size(arr) - 1)
    # 1-based index of the first token containing '|' (0 = none).
    pipe_pos = F.array_position(F.transform(rest, lambda t: t.contains("|")), True)
    feats = F.when(pipe_pos > 0, F.slice(rest, 1, pipe_pos - 1)).otherwise(rest)
    members = F.when(
        pipe_pos > 0,
        F.filter(F.split(F.element_at(rest, pipe_pos.cast("int")), r"\|"), lambda t: t != ""),
    )
    size = F.when(
        (pipe_pos > 0) & (F.size(rest) > pipe_pos),
        -F.element_at(rest, (pipe_pos + 1).cast("int")).cast("bigint"),
    )
    return lines.select(
        F.element_at(arr, 1).cast("int").alias("cluster"),
        feats.cast("array<double>").alias("centroid"),
        members.cast("array<int>").alias("member_ids"),
        size.alias("size"),
    ).filter(F.col("cluster").isNotNull())


def centroid_wire_lines(centroids: DataFrame) -> DataFrame:
    """Render (cluster, centroid[, member_ids, size]) to the wire format
    as a single-column ``value`` DataFrame (write with .write.text)."""
    cols = set(centroids.columns)
    base = F.concat_ws(
        "\t",
        F.col("cluster"),
        F.array_join(F.col("centroid"), "\t"),
    )
    if "member_ids" in cols and "size" in cols:
        line = F.when(
            F.col("member_ids").isNotNull(),
            F.concat_ws(
                "\t",
                base,
                F.concat(F.array_join(F.col("member_ids"), "|"), F.lit("|")),
                F.concat(F.lit("-"), F.col("size").cast("string")),
            ),
        ).otherwise(base)
    else:
        line = base
    return centroids.select(line.alias("value"))


def write_centroid_file(centroids: DataFrame, path: str) -> None:
    """S5/S7 sink: single text file of wire-format lines (coalesce(1) is
    fine — the table is k rows by construction)."""
    centroid_wire_lines(centroids.orderBy("cluster")).coalesce(1).write.mode("overwrite").text(path)
