"""Scaling probe: the round-9 histogram-form rank statistics.

`mannwhitney_value_groups` and `mood_median_test` replaced row-level
global-order windows (which sort the ENTIRE pooled event sample in one
task) with value-histogram closed forms over
`partitioning.prefix_sum`.  The histogram is value-grain, so the probe
amplifies BOTH the row count and the distinct-value domain (each of
the k copies of a row gets a distinct perturbed value — the worst case
for the histogram, which degenerates to one row per input row):
throughput must hold or rise with volume, where the old single-task
window sort is flat-at-one-core by construction.

Method: the sf0.1 events (~100k rows) amplified n -> 4n -> 16n into a
temp dir, each op timed end-to-end (count() drain) after one untimed
warm-up.

Run: python tools/scale_probe_rank_stats.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.stats_extra import (
    mannwhitney_value_groups,
    mood_median_test,
)
from k_means_hadoop_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 4, 16)


def main() -> None:
    spark = get_spark("scale-probe-rank-stats")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'op':>26} {'mult':>5} {'rows':>9} {'wall_s':>7} {'rows/s':>9}")
    for mult in MULTS:
        tmp = tempfile.mkdtemp(prefix=f"rank_probe_{mult}x_")
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        if mult > 1:
            ev = ev.withColumn(
                "_i", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
            )
            # perturb value per copy: the distinct-VALUE domain grows
            # with the data, the histogram's worst case
            ev = ev.withColumn(
                "value", F.col("value") + F.col("_i") * F.lit(1e-6)
            ).drop("_i")
        ev.repartition(32).write.mode("overwrite").parquet(
            os.path.join(tmp, "events.parquet")
        )
        n = spark.read.parquet(os.path.join(tmp, "events.parquet")).count()
        for name, fn in (
            ("mannwhitney_value_groups", mannwhitney_value_groups),
            ("mood_median_test", mood_median_test),
        ):
            fn(spark, tmp).count()  # warm-up
            t0 = time.perf_counter()
            fn(spark, tmp).count()
            wall = time.perf_counter() - t0
            print(f"{name:>26} {mult:>5} {n:>9} {wall:>7.2f} {n / wall:>9.0f}")


if __name__ == "__main__":
    main()
