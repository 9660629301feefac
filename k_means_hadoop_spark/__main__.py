"""CLI entry point — the Spark-native equivalent of the reference's
``script.sh`` → ``hadoop jar`` run (SURVEY.md §3.1, entry point A).

The reference interactively asks for k, seed ids (or ``-`` for random),
and max iterations (``-1`` = until convergence), runs the MapReduce
Lloyd loop, writes the two labeled-output files, and prints the
iteration count (KMeans.java:283) and Jaccard coefficient
(KMeans.java:662-663).  This CLI takes the same three parameters as
flags, runs the DataFrame loop, writes the same two sinks, prints the
same two lines::

    python -m k_means_hadoop_spark --input data/iris.tsv -k 3 \
        --seeds 1,51,101 --max-iter -1 --out /tmp/run1

Differences from the reference, by design: seeded (reproducible) random
init instead of the reference's unseeded ``Math.random`` (SURVEY.md §2.6
I1), and distributed output writes instead of driver-side file loops.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="k_means_hadoop_spark")
    ap.add_argument("--input", required=True, help="TSV points file (id\\tlabel\\tf1..fd), glob ok")
    ap.add_argument("-k", type=int, required=True, help="number of clusters")
    ap.add_argument("--seeds", default="-", help="comma-separated seed row ids, or '-' for random (I1)")
    ap.add_argument("--max-iter", type=int, default=-1, help="-1 = run until convergence (C2)")
    ap.add_argument("--out", default=None, help="output directory for the two labeled sinks (S6)")
    ap.add_argument("--seed", type=int, default=42, help="RNG seed for random init")
    args = ap.parse_args(argv)

    from k_means_hadoop_spark.operators.evaluation import jaccard_reference
    from k_means_hadoop_spark.operators.kmeans import init_ids, init_random, lloyd_kmeans
    from k_means_hadoop_spark.session import get_spark
    from k_means_hadoop_spark.sources.points import read_points_tsv
    from k_means_hadoop_spark.sources.sinks import write_final_output, write_plot_output

    spark = get_spark("k_means_hadoop_spark-cli")
    pts = read_points_tsv(spark, args.input)

    if args.seeds != "-":
        seed_ids = [int(s) for s in args.seeds.split(",")]
        if len(seed_ids) != args.k:
            ap.error(f"--seeds gives {len(seed_ids)} ids but -k is {args.k}")
        cents = init_ids(pts, seed_ids)
    else:
        cents = init_random(pts, k=args.k, seed=args.seed)

    res = lloyd_kmeans(pts, cents, max_iter=args.max_iter)

    if args.out:
        write_final_output(res.assignments, f"{args.out}/finalOutput")
        write_plot_output(res.assignments, f"{args.out}/cluster_data_toPlot")

    jac = jaccard_reference(res.assignments).first()
    # same two report lines as the reference (KMeans.java:283, :662-663)
    print(f"Total Number of Iterations - {res.iterations}")
    print(f"Jaccard Co-effcient - {jac['jaccard'] * 100}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
