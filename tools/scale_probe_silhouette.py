"""Scaling probe: the sampled-silhouette evaluator vs corpus size.

Method: the sf0.1 embeddings (2 000 vectors) are amplified IN-PLAN
(id-offset copies with one coordinate perturbed per copy so the
geometry varies), assigned with the standard I2 seed centroids, and
silhouette_sampled timed end-to-end — m stays fixed at 16/cluster, so
the claim under test is the O(m·k·n) cost: wall ~linear in n, per-
point throughput holding or rising.  The exact evaluator is O(n²) and
would be 1/16th the corpus away from intractable; the sampled path is
the ONLY shape that survives scale, which is why round 5 added it.

Run: python tools/scale_probe_silhouette.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.assign import assign_expr
from k_means_hadoop_spark.operators.evaluation import silhouette_sampled
from k_means_hadoop_spark.operators.kmeans import init_ids
from k_means_hadoop_spark.registry import SEEDS, _points
from k_means_hadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
MULTS = (1, 4, 16)


def main() -> None:
    spark = get_spark("scale-probe-silhouette")
    spark.sparkContext.setLogLevel("ERROR")
    base = _points(spark, SF_DIR)
    rows = []
    for mult in MULTS:
        if mult == 1:
            pts = base
        else:
            pts = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("c"),
                "id", "label", "features",
            ).select(
                (F.col("id") + F.col("c") * F.lit(10_000_000)).alias("id"),
                "label",
                F.transform(
                    "features",
                    lambda x, i: F.when(i == 0, x + F.col("c").cast("double") * 0.01).otherwise(x),
                ).alias("features"),
            )
        n = pts.count()
        asg = assign_expr(pts, init_ids(base, SEEDS))

        def run():
            silhouette_sampled(asg).write.mode("overwrite").format("noop").save()

        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        rows.append((mult, n, best))
        print(f"mult={mult} points={n} best={best:.2f}s pts/s={n / best:,.0f}", flush=True)

    print("\n| mult | points | wall | points/sec |")
    print("|---|---|---|---|")
    for mult, n, best in rows:
        print(f"| {mult}x | {n} | {best:.2f} s | {n / best:,.0f} |")


if __name__ == "__main__":
    main()
