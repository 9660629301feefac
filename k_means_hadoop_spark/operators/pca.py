"""PCA projection pipeline — reference ``PCA_Plot.ipynb`` cell-0
(N1-N5 in SURVEY.md §2.8).

The notebook: load TSV (last col = cluster id) → mean-center →
covariance → eigendecomposition → top-2 eigenvectors → project.
Spark-first: ``StandardScaler(withMean=True, withStd=False)`` (N2) →
``ml.feature.PCA(k)`` (N3-N5) — distributed covariance + local
eigensolve on the driver (d×d only), exactly the right split at 100 TB
(n never leaves the cluster, d×d is tiny).

Eigenvector SIGN is indeterminate across implementations (the notebook
inherits numpy's convention); downstream consumers (plotting) are
sign-invariant, so parity is defined up to per-component sign.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    k: int = 2,
    features_col: str = "features",
    keep_cols: tuple[str, ...] = ("id", "cluster"),
) -> DataFrame:
    """Returns (projected DataFrame, fitted PCAModel); the DataFrame is
    (keep_cols..., pc ARRAY<DOUBLE> length k) — top-k projection of the
    mean-centered features."""
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vec = df.withColumn("_v", array_to_vector(F.col(features_col)))
    scaler = StandardScaler(
        withMean=True, withStd=False, inputCol="_v", outputCol="_centered"
    ).fit(vec)
    centered = scaler.transform(vec)
    model = PCA(k=k, inputCol="_centered", outputCol="_pc").fit(centered)
    out = model.transform(centered)
    return out.select(*keep_cols, vector_to_array(F.col("_pc")).alias("pc")), model


def explained_variance(model) -> list[float]:
    return [float(v) for v in model.explainedVariance]
