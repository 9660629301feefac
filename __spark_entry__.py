"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (full Lloyd k-means on the sf0.001
points table projected from ``embeddings``).
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the beyond-reference training-data-pipeline
surface; oracle SQL is DuckDB-runnable on the same parquet views.

Implementation lives in ``k_means_hadoop_spark`` — this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from k_means_hadoop_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full Lloyd's k-means (I2 seeds, tol=0, empty-cluster-drop
    semantics) over sf0.001 points; returns (id, label, cluster, dist)."""
    return registry.QUERIES["kmeans_lloyd"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
