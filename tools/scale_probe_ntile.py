"""Scaling probe: the round-9 prefix-sum ntile rewrites.

`rfm_segments` (three chained customer-grain ranks) and
`zonemap_prune_audit` (one lineitem-grain rank) replaced unpartitioned
`ntile()` windows — which sort their ENTIRE input in one task — with
range-partitioned `partitioning.prefix_sum` ranks + the closed-form
`ntile_expr`.  The trade is a fixed checkpoint/collect cost for sort
parallelism that follows partition count instead of row count, so
throughput (rows ranked/sec) must hold or RISE as the input grows —
the single-task window's throughput would be flat-at-one-core by
construction.

Method: the sf0.1 orders (150k rows) and lineitem (600k rows) are
amplified n -> 4n -> 16n by exploding each row k ways with perturbed
keys (o_custkey*k+i / l_orderkey*k+i, so the CUSTOMER and ORDER
domains grow with the data — the dimension the round-8 verdict said
a 100x corpus would feel), written to a temp dir, and each op timed
end-to-end (noop-style count() drain) after one untimed warm-up.

Run: python tools/scale_probe_ntile.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.relational import rfm_segments
from k_means_hadoop_spark.operators.trends import zonemap_prune_audit
from k_means_hadoop_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 4, 16)


def _amplify(spark, table: str, key: str, mult: int, out_dir: str) -> int:
    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    if mult > 1:
        df = df.withColumn("_i", F.explode(F.array(*[F.lit(i) for i in range(mult)])))
        df = df.withColumn(key, F.col(key) * mult + F.col("_i")).drop("_i")
    df.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"{table}.parquet")
    )
    return spark.read.parquet(os.path.join(out_dir, f"{table}.parquet")).count()


def main() -> None:
    spark = get_spark("scale-probe-ntile")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'op':>20} {'mult':>5} {'rows':>9} {'wall_s':>7} {'rows/s':>9}")
    for mult in MULTS:
        tmp = tempfile.mkdtemp(prefix=f"ntile_probe_{mult}x_")
        n_ord = _amplify(spark, "orders", "o_custkey", mult, tmp)
        n_li = _amplify(spark, "lineitem", "l_orderkey", mult, tmp)
        for name, fn, n_in in (
            ("rfm_segments", rfm_segments, n_ord),
            ("zonemap_prune_audit", zonemap_prune_audit, n_li),
        ):
            fn(spark, tmp).count()  # warm-up (codegen + range sampling)
            t0 = time.perf_counter()
            fn(spark, tmp).count()
            wall = time.perf_counter() - t0
            print(
                f"{name:>20} {mult:>5} {n_in:>9} {wall:>7.2f} {n_in / wall:>9.0f}"
            )


if __name__ == "__main__":
    main()
