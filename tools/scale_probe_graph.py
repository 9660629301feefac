"""Scaling probe: the four unrolled graph iterations (PageRank, label
propagation, BFS levels, weighted shortest paths) vs graph size.

Method: the co-purchase graph is grown NATURALLY — by raising the
part-id bound (`_GRAPH_MAX_PART`) that defines the registered bounded
subgraph, and the top-K edge cut for PageRank — so each scale point is
a real graph from the same sf0.1 lineitem, not an amplified copy.
Per point: one warm-up, then min-of-3 full executions (count()), the
bench.py protocol.  The claim under test (round-4 verdict item 6): the
per-iteration cost of each loop is join+groupBy over node-/edge-sized
tables only, so wall time should grow ~linearly in |E| while
throughput (edges/sec) holds or rises — the same signature the Lloyd
and moment-reduce probes showed.

Run: python tools/scale_probe_graph.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_hadoop_spark.operators import analytics
from k_means_hadoop_spark.operators import relational
from k_means_hadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
BOUNDS = (300, 1200, 4800)      # _GRAPH_MAX_PART for LP / BFS / SP
EDGE_TOPS = (200, 800, 3200)    # _PR_EDGE_TOP for PageRank


def timed(fn, runs: int = 3) -> float:
    fn()  # warm-up
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("scale-probe-graph")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for bound, etop in zip(BOUNDS, EDGE_TOPS):
        analytics._GRAPH_MAX_PART = bound
        relational._PR_EDGE_TOP = etop
        edges = analytics._copurchase_edges(spark, SF_DIR)
        n_edges = edges.count()
        n_nodes = (
            edges.selectExpr("pa AS p").union(edges.selectExpr("pb AS p")).distinct().count()
        )
        t_lp = timed(lambda: analytics.label_prop_communities(spark, SF_DIR).count())
        t_bfs = timed(lambda: analytics.bfs_levels(spark, SF_DIR).count())
        t_sp = timed(lambda: analytics.shortest_paths_weighted(spark, SF_DIR).count())
        t_pr = timed(lambda: relational.pagerank_copurchase(spark, SF_DIR).count())
        rows.append((bound, etop, n_nodes, n_edges, t_lp, t_bfs, t_sp, t_pr))
        print(
            f"bound={bound} etop={etop} nodes={n_nodes} edges={n_edges} "
            f"lp={t_lp:.2f}s bfs={t_bfs:.2f}s sp={t_sp:.2f}s pr={t_pr:.2f}s",
            flush=True,
        )

    print("\n| bound | nodes | edges | label_prop | bfs | shortest_paths | edges/s (lp) | pr_edges | pagerank |")
    print("|---|---|---|---|---|---|---|---|---|")
    for bound, etop, n_nodes, n_edges, t_lp, t_bfs, t_sp, t_pr in rows:
        print(
            f"| {bound} | {n_nodes} | {n_edges} | {t_lp:.2f} s | {t_bfs:.2f} s "
            f"| {t_sp:.2f} s | {n_edges / t_lp:,.0f} | {etop} | {t_pr:.2f} s |"
        )


if __name__ == "__main__":
    main()
