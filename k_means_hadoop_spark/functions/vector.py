"""Dense-vector math as pure Catalyst expressions (no Python UDFs).

The reference computes Euclidean distance row-at-a-time in Java
(``calculateDist``, KMeans.java:116-122: sqrt of the sum of squared
per-dimension differences).  Here each function is a higher-order-
function Column expression over ``ARRAY<DOUBLE>`` — it runs JVM-side
inside whole-stage codegen, so the hot loop (n·k distance evaluations
per k-means iteration) never leaves Tungsten.

All folds are left-to-right and sequential (``F.aggregate`` semantics),
which matches DuckDB's list_* evaluation order closely enough that
results agree to ~1e-15 relative — parity queries round to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def squared_distance(a: Column | str, b: Column | str) -> Column:
    """Σ (aᵢ-bᵢ)² — reference KMeans.java:119-121 without the final sqrt."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    """L2 distance — reference ``calculateDist`` KMeans.java:116-122."""
    return F.sqrt(squared_distance(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
