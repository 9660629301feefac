"""External cluster evaluation — reference ``jaccardCoeff``
(KMeans.java:623-665).

The reference materializes two n×n 0/1 co-membership matrices (ground
truth at :624-633, prediction at :635-644; ``-1`` labels excluded from
BOTH matrices via the ``clus1 != -1`` guard) and counts ordered pairs
INCLUDING the diagonal: m1 = pairs co-clustered in both, m0 = pairs
where the matrices disagree, J = m1/(m1+m0) (:646-663).

That is O(n²) memory/time.  The identical counts come out of the
(label, cluster) contingency table in O(n + |L|·|C|):

  with n_lc = |{i : label_i = l, cluster_i = c}|,
       n_l  = Σ_c n_lc,   m_c = Σ_l n_lc   (l ranging over labels ≠ -1
       for ground-truth counts; predicted clusters are never -1 but the
       same guard is applied for exactness):

  ground1 = Σ_{l≠-1} n_l²          (ordered pairs incl. diagonal)
  pred1   = Σ_c     m_c²           (over rows with any label, incl. -1)
  both1   = Σ_{l≠-1, c} n_lc²
  m1 = both1
  m0 = (ground1 - both1) + (pred1 - both1)

Distributed cost: one groupBy over n rows producing ≤ |L|·|C| cells —
at 100 TB this is a single partial-agg shuffle of a few thousand rows.
SQL-expressible → DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contingency(assignments: DataFrame, label_col: str = "label", cluster_col: str = "cluster") -> DataFrame:
    """(label, cluster, n) co-occurrence counts (A7's base aggregate)."""
    return assignments.groupBy(label_col, cluster_col).agg(F.count(F.lit(1)).alias("n"))


def jaccard_reference(assignments: DataFrame, label_col: str = "label", cluster_col: str = "cluster") -> DataFrame:
    """Single-row (m1 BIGINT, m0 BIGINT, jaccard DOUBLE) —
    bit-identical to the reference's ordered-pairs-with-diagonal counts.

    Plan shape (this matters at scale — a naive three-branch formulation
    re-aggregates the full assignment table three times and cost ~14
    exchanges): ONE pass over the assignments builds the contingency
    cells; the marginals n_l, m_c are window sums over the tiny cell
    table; the three pair-sums collapse into a single global aggregate
    using  Σ_l n_l² = Σ_cells n·n_l  (and likewise for m_c).
    """
    from pyspark.sql import Window

    cells = contingency(assignments, label_col, cluster_col)
    ground_ok = F.col(label_col) != -1
    # Mirrors the reference's `clus1 != -1` guard on the prediction matrix
    # (clusters are 1..k so it never fires, but the formula stays exact).
    pred_ok = F.col(cluster_col) != -1
    stats = cells.select(
        F.col("n"),
        ground_ok.alias("g_ok"),
        pred_ok.alias("p_ok"),
        F.sum("n").over(Window.partitionBy(label_col)).alias("n_l"),
        F.sum("n").over(Window.partitionBy(cluster_col)).alias("m_c"),
    )
    totals = stats.agg(
        F.sum(F.when(F.col("g_ok"), F.col("n") * F.col("n_l")).otherwise(0)).alias("ground1"),
        F.sum(F.when(F.col("p_ok"), F.col("n") * F.col("m_c")).otherwise(0)).alias("pred1"),
        F.sum(
            F.when(F.col("g_ok") & F.col("p_ok"), F.col("n") * F.col("n")).otherwise(0)
        ).alias("both1"),
    )
    return totals.select(
        F.col("both1").cast("bigint").alias("m1"),
        (F.col("ground1") + F.col("pred1") - 2 * F.col("both1")).cast("bigint").alias("m0"),
        (
            F.col("both1").cast("double")
            / (F.col("ground1") + F.col("pred1") - F.col("both1")).cast("double")
        ).alias("jaccard"),
    )


def wssse(assignments: DataFrame, dist_col: str = "dist") -> float:
    """Within-set sum of squared errors (beyond-reference convergence
    telemetry; property tests assert it is non-increasing per iteration)."""
    row = assignments.agg(F.sum(F.col(dist_col) * F.col(dist_col)).alias("w")).first()
    return float(row["w"]) if row and row["w"] is not None else 0.0
