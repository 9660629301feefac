"""Scaling probe: the dominant-eigenpair paths vs corpus size.

Two claims under test (round-5 verdict item 4 / round-6 item 7):

1. The FLOAT path (power_iteration_pc1_float) is scan-bound: its only
   corpus-sized work is the Arrow-batched per-batch ``X.T @ X`` — wall
   should grow ~linearly in n with per-row throughput holding or
   rising, because the d×d partial reduce and the driver eigensolve
   are corpus-size-independent.
2. The EXACT-decimal oracle path's corpus pass (the O(n·d²) decimal
   pair explode) is the part that does NOT survive scale — measured at
   1× only, as the documented price of the cross-engine value oracle.

Method: the sf0.1 embeddings are amplified in-plan (id-offset copies,
first coordinate perturbed per copy so the spectrum varies), min-of-3
after one warm-up per point — the bench.py protocol.

Run: python tools/scale_probe_power_iteration.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.round7 import _gram_partials
from k_means_hadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
MULTS = (1, 10, 40)


def amplified(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if mult == 1:
        return base
    return base.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("c"),
        "vec_id",
        "embedding",
    ).select(
        (F.col("vec_id") + F.col("c") * F.lit(10_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(
                i == 0, x + F.col("c").cast("double") * 0.001
            ).otherwise(x),
        ).alias("embedding"),
    )


def float_path(emb, d: int) -> float:
    parts = _gram_partials(emb.select("embedding"), d)
    n = int(sum(p["n_b"] for p in parts))
    s = np.zeros(d)
    G = np.zeros((d, d))
    for p in parts:
        s += np.array(p["s_b"])
        G += np.array(p["g_b"]).reshape(d, d)
    cov = (G - np.outer(s, s) / n) / n
    vals, _ = np.linalg.eigh((cov + cov.T) / 2.0)
    return float(vals[-1])


def main() -> None:
    spark = get_spark("scale-probe-pi")
    spark.sparkContext.setLogLevel("ERROR")
    d = len(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").first()["embedding"]
    )
    rows = []
    for mult in MULTS:
        emb = amplified(spark, mult)
        n = emb.count()
        float_path(emb, d)  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float_path(emb, d)
            best = min(best, time.perf_counter() - t0)
        rows.append((mult, n, best))
        print(
            f"float mult={mult} vecs={n} best={best:.2f}s vecs/s={n / best:,.0f}",
            flush=True,
        )

    # the exact-decimal corpus pass, 1x only (the oracle's price tag)
    from k_means_hadoop_spark.operators.pca import power_iteration_pc1

    def run_exact():
        power_iteration_pc1(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()

    run_exact()
    t0 = time.perf_counter()
    run_exact()
    exact = time.perf_counter() - t0

    print("\n| path | mult | vectors | wall | vecs/sec |")
    print("|---|---|---|---|---|")
    for mult, n, best in rows:
        print(f"| float | {mult}x | {n} | {best:.2f} s | {n / best:,.0f} |")
    print(f"| exact oracle | 1x | {rows[0][1]} | {exact:.2f} s | "
          f"{rows[0][1] / exact:,.0f} |")


if __name__ == "__main__":
    main()
