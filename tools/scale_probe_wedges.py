"""Scaling probe: wedge/candidate growth for the round-7 graph ops.

`adamic_adar_links` and `clustering_coefficient_nodes` build all
candidates from shared-neighbor / canonical-orientation equi-joins
whose intermediate size is the WEDGE count W = Σ_z C(deg(z), 2) —
growing with the square of node degrees, the one quantity that can
bend badly as density rises (round-7 verdict item 7).

Method: lineitem is amplified in-plan with order-key offsets (×4,
×16) over the SAME bounded part domain (l_partkey <= 300, the ops'
real cap), so each step densifies the graph — the worst case for
wedges, unlike disjoint-copy amplification which only grows them
linearly.  For each point we record edges, exact W, the candidate
rows the Adamic-Adar join actually produces, and the wall time of a
full count() over that join.

What bounds it: with the part-domain cap D = 300 the graph can only
densify toward complete — deg(z) <= D−1, so W <= D·C(D−1, 2) ≈ 13.3M
and the DISTINCT candidate pairs cap at C(D, 2) = 44 850.  The probe
verifies the curve approaches that ceiling instead of diverging.  For
an UNCAPPED graph the same join would grow with Σdeg² unbounded; the
documented mitigation is a degree cap mirrored in the oracle (the
`dedup_ngram_jaccard_capped` pattern) — not needed while the ops
define themselves on the bounded subgraph.

Run: python tools/scale_probe_wedges.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from k_means_hadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
MULTS = (1, 4, 16)
MAX_PART = 300  # the ops' real subgraph cap (analytics._GRAPH_MAX_PART)


def main() -> None:
    spark = get_spark("scale-probe-wedges")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_partkey") <= MAX_PART)
        .select("l_orderkey", "l_partkey")
    )
    print(f"{'mult':>5} {'edges':>8} {'wedges':>10} {'aa_cand':>9} {'wall_s':>7}")
    for mult in MULTS:
        li = base.select(
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("c"),
            "l_orderkey",
            "l_partkey",
        ).select(
            # offset order keys -> more baskets over the SAME parts
            (F.col("l_orderkey") + F.col("c") * 10_000_000).alias("l_orderkey"),
            # rotate part ids so the copies add NEW co-purchase pairs
            ((F.col("l_partkey") + F.col("c") * 7) % MAX_PART + 1).alias(
                "l_partkey"
            ),
        ).distinct()
        a, b = li.alias("a"), li.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_edges = edges.count()
        nbrs = edges.select(
            F.col("pa").alias("node"), F.col("pb").alias("nbr")
        ).unionByName(
            edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
        )
        deg = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
        wedges = deg.agg(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
        ).first()["w"]
        # the Adamic-Adar candidate join, timed end to end
        n1 = nbrs.select(F.col("nbr").alias("u"), F.col("node").alias("z"))
        n2 = nbrs.select(F.col("nbr").alias("v"), F.col("node").alias("z2"))
        t0 = time.perf_counter()
        cand = (
            n1.join(
                n2, (F.col("z") == F.col("z2")) & (F.col("u") < F.col("v"))
            )
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .count()
        )
        wall = time.perf_counter() - t0
        print(f"{mult:>5} {n_edges:>8} {int(wedges):>10} {cand:>9} {wall:>7.2f}")


if __name__ == "__main__":
    main()
