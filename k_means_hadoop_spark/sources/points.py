"""Point-table sources (S1/S2/S4) — the reference's input surface.

Reference format (KMeans.java:79-96 mapper parse, :548-567 driver parse):
tab-separated text, col1=int id, col2=int ground-truth label (skipped by
the mapper, kept by the driver), col3+ = float64 features; ``cho.txt``
has CRLF endings silently tolerated by Double.parseDouble — our reader
strips a trailing ``\r`` explicitly.

Canonical engine schema:  (id INT, label INT, features ARRAY<DOUBLE>).

``points_from_embeddings`` adapts the driver-provided parquet tables
(TESTDATA.md) to the same schema — parquet scan with column pruning and
filter pushdown for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINTS_COLS = ("id", "label", "features")


def read_points_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2: line-text scan + TSV parse (CRLF-tolerant, glob-capable —
    S4 falls out of Spark's built-in path globbing)."""
    lines = spark.read.text(path)
    toks = F.split(F.regexp_replace(F.col("value"), r"\r$", ""), "\t")
    return lines.select(
        F.element_at(toks, 1).cast("int").alias("id"),
        F.element_at(toks, 2).cast("int").alias("label"),
        F.slice(toks, 3, F.size(toks) - 2).cast("array<double>").alias("features"),
    ).filter(F.col("id").isNotNull())


def points_from_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver ``embeddings`` table (vec_id, embedding FLOAT[64],
    label) to the canonical points schema; float→double cast is exact."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").cast("int").alias("id"),
        F.col("label").cast("int").alias("label"),
        F.col("embedding").cast("array<double>").alias("features"),
    )


POINTS_FROM_EMBEDDINGS_SQL = (
    "SELECT vec_id::INTEGER AS id, label::INTEGER AS label, "
    "embedding::DOUBLE[] AS features FROM embeddings"
)
