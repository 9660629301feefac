"""Scaling probe: the one-scan exact-decimal moment reduce
(`corr_matrix_lineitem`) at 1x / 10x / 40x the sf0.1 lineitem.

Method: the sf0.1 lineitem (600k rows) is amplified row-count-wise by
exploding a k-element array per row (no extra I/O variance from
writing bigger files; the scan stays one parquet read + an in-plan
fan-out, so the measurement isolates the AGGREGATE's scaling).  Each
point is min-of-3 after one warm-up, same protocol as bench.py.

Run: python tools/scale_probe_corr.py   (appends nothing; prints rows)
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.analytics import (
    _CORR_COLS,
    _CORR_FORMULA,
    _corr_pairs,
    _dec,
    _dec14,
)
from k_means_hadoop_spark.session import get_spark


def corr_over(df):
    aggs = [F.count(F.lit(1)).alias("n")]
    for k, c in _CORR_COLS.items():
        aggs.append(F.sum(_dec(c)).alias(f"s_{k}"))
    for a, b in _corr_pairs():
        aggs.append(F.sum(_dec14(_CORR_COLS[a]) * _dec14(_CORR_COLS[b])).alias(f"s_{a}{b}"))
    sums = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(_CORR_COLS[a]).alias("col_a"),
            F.lit(_CORR_COLS[b]).alias("col_b"),
            F.expr(_CORR_FORMULA.format(a=a, b=b)).alias("corr"),
        )
        for a, b in _corr_pairs()
        if a != b
    ]
    return sums.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")


def main() -> None:
    spark = get_spark("scale-probe-corr")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        *[c for c in _CORR_COLS.values()]
    )
    n_base = base.count()
    for mult in (1, 10, 40):
        df = base.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
        ).drop("_r")
        corr_over(df).collect()  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            corr_over(df).collect()
            best = min(best, time.perf_counter() - t0)
        print(
            f"mult={mult} rows={n_base * mult} best={best:.2f}s "
            f"rows_per_sec={n_base * mult / best:,.0f}"
        )


if __name__ == "__main__":
    main()
