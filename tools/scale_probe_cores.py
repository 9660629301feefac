"""Cores-scaling probe at an amplified fixture (round-13 verdict item 9).

sf0.1 is overhead-dominated: the round-12 driver's 8-core run beat its
32-core run by ~21%, which says nothing about the engine's parallel
scaling.  This tool materializes a DETERMINISTIC 16x amplification of
the sf0.1 fixture (~270 MB parquet) so the top-cost queries can be
timed at 8 vs 32 cores with enough work per task for parallelism to
matter.

Amplification (the scale_probe_dedup recipe, key-consistent):
- documents: copy c gets doc_id += c*1e7 (multiples of 10 preserve the
  incremental-batch ``doc_id % 10`` split) and a per-copy token
  ``cNN`` prepended to text so shingle sets differ across copies —
  near-dup candidate counts stay corpus-proportional instead of every
  clone pairing with its 15 siblings.
- embeddings: vec_id += c*1e7 (vectors unchanged; k-means seeds are
  copy-0 ids, so the flagship init still resolves).
- lineitem/orders: l_orderkey/o_orderkey += c*1e7; o_custkey and
  customer.c_custkey += c*1e6 (joins stay consistent).
- events + dimensions (region/nation/part/supplier): copied verbatim.

Graph queries (hits/pagerank/triangles) are deliberately NOT in the
probe list: their bounded-subgraph filter (l_partkey <= cap) keys on
the dimension domain, so amplified copies either fall outside the cap
or densify the same subgraph — either way the measurement would not be
a clean data-scaling read.  tools/scale_probe_graph.py covers them.

Usage:
    python tools/scale_probe_cores.py build [outdir]   # default /dev/shm/sfamp16
    SPARK_GRAFT_SF_DIR=/dev/shm/sfamp16 SPARK_GRAFT_CPUS=8  python bench.py --only <PROBE...>
    SPARK_GRAFT_SF_DIR=/dev/shm/sfamp16 SPARK_GRAFT_CPUS=32 python bench.py --only <PROBE...>
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MULT = 16
SRC = "/root/testdata/sf0.1"

# top-cost non-graph queries from plans/r13/bench_r13_pre_optimization.json
PROBE = [
    "kmeans_lloyd",
    "umass_topic_coherence",
    "dedup_prefix_filter",
    "rfm_segments",
    "streaming_minhash_store",
    "ingest_increment",
    "spearman_quality_logprob",
    "dedup_incremental_stored",
    "quantile_normalize_scores",
    "corr_matrix_lineitem",
    "zonemap_prune_audit",
]


def build(out: str) -> None:
    from pyspark.sql import functions as F

    from k_means_hadoop_spark.session import get_spark

    spark = get_spark("scale_probe_cores_build")
    os.makedirs(out, exist_ok=True)

    def amplify(table: str, fn) -> None:
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = [fn(base, c) for c in range(MULT)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: x{MULT}", flush=True)

    amplify(
        "documents",
        lambda d, c: d.withColumn("doc_id", F.col("doc_id") + 10_000_000 * c)
        .withColumn("text", F.concat(F.lit(f"c{c:02d} "), F.col("text"))),
    )
    amplify(
        "embeddings",
        lambda d, c: d.withColumn("vec_id", F.col("vec_id") + 10_000_000 * c),
    )
    amplify(
        "lineitem",
        lambda d, c: d.withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000 * c),
    )
    amplify(
        "orders",
        lambda d, c: d.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000 * c)
        .withColumn("o_custkey", F.col("o_custkey") + 1_000_000 * c),
    )
    amplify(
        "customer",
        lambda d, c: d.withColumn("c_custkey", F.col("c_custkey") + 1_000_000 * c),
    )
    for t in ("region", "nation", "part", "supplier", "events"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: verbatim", flush=True)
    print(f"fixture ready: {out}")
    print("probe list:", " ".join(PROBE))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "build":
        build(sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sfamp16")
    else:
        print(__doc__)
