"""Scaling probe: spearman_quality_logprob vs corpus size.

The op is the COMPOSITION of two full scoring pipelines (quality
heuristic + corpus-trained unigram LM) and two histogram-based
average-rank passes.  Claim under test: the pipelines are scan-bound
(per-doc throughput holds or rises with n) and the rank machinery
stays distinct-value-sized (score cardinality, not corpus size), so
wall grows ~linearly and the plan survives a 100× scale-up.

Method: the sf0.1 documents are amplified in-plan (id-offset copies,
text unchanged — score distributions repeat, which STRESSES the tie
handling: the histogram rank tables keep constant size while the scan
grows).  Min-of-3 after one warm-up per point.

Run: python tools/scale_probe_spearman.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.corpus_extra import (
    _docs,
    _spearman_over_docs,
)
from k_means_hadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
MULTS = (1, 4, 16)


def main() -> None:
    spark = get_spark("scale-probe-spearman")
    spark.sparkContext.setLogLevel("ERROR")
    base = _docs(spark, SF_DIR)
    rows = []
    for mult in MULTS:
        if mult == 1:
            docs = base
        else:
            docs = base.select(
                F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("c"),
                *base.columns,
            ).select(
                (F.col("doc_id") + F.col("c") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                *[c for c in base.columns if c != "doc_id"],
            )
        n = docs.count()

        def run():
            _spearman_over_docs(docs).write.mode("overwrite").format(
                "noop"
            ).save()

        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        rows.append((mult, n, best))
        print(
            f"mult={mult} docs={n} best={best:.2f}s docs/s={n / best:,.0f}",
            flush=True,
        )

    print("\n| mult | docs | wall | docs/sec |")
    print("|---|---|---|---|")
    for mult, n, best in rows:
        print(f"| {mult}x | {n} | {best:.2f} s | {n / best:,.0f} |")


if __name__ == "__main__":
    main()
