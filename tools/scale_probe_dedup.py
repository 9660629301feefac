"""Scaling probe: the MinHash+LSH dedup tier vs corpus size.

Method: the sf0.1 documents table (5 000 docs) is amplified IN-PLAN —
each copy gets a distinct doc_id offset and a per-copy token prefix
injected into the text, so the shingle sets of copies differ and the
candidate-pair count stays corpus-proportional instead of exploding
quadratically (amplifying verbatim copies would measure the pair
blow-up, not the pipeline).  Each point times the full candidate
pipeline end-to-end (shingle → 16-hash signature → banding →
(band,bucket) equi-self-join → distinct), min-of-3 after one warm-up.

The 100 TB claim under test: shuffle volume is corpus-proportional
(signatures, then banded keys), so wall time should grow ~linearly in
docs and per-doc throughput should hold or rise as fixed costs
amortize — the same signature as the Lloyd / moment / graph probes.

Run: python tools/scale_probe_dedup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators import dedup
from k_means_hadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
MULTS = (1, 4, 16)


def amplified(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    if mult == 1:
        return base
    return base.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("c"), "doc_id", "text"
    ).select(
        (F.col("doc_id") + F.col("c") * F.lit(1_000_000)).alias("doc_id"),
        F.concat(
            F.lit("copytok"), F.col("c").cast("string"), F.lit(" "), F.col("text")
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("scale-probe-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for mult in MULTS:
        docs = amplified(spark, mult)
        n_docs = docs.count()

        def run():
            dedup.minhash_lsh_candidates(docs, n=3).write.mode("overwrite").format(
                "noop"
            ).save()

        run()  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        rows.append((mult, n_docs, best))
        print(f"mult={mult} docs={n_docs} best={best:.2f}s docs/s={n_docs / best:,.0f}", flush=True)

    print("\n| mult | docs | wall | docs/sec |")
    print("|---|---|---|---|")
    for mult, n_docs, best in rows:
        print(f"| {mult}x | {n_docs} | {best:.2f} s | {n_docs / best:,.0f} |")


if __name__ == "__main__":
    main()
