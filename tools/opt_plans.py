"""Capture .explain("formatted") for registry queries into plans/r12/.

Usage:
    python tools/opt_plans.py <tag> <name> [<name> ...]
    python tools/opt_plans.py <tag> --top    # the round-12 optimization watchlist

Writes plans/r12/<name>_<tag>.txt for each query (tag = before/after).
Also prints a one-line summary per query: #Exchange, join strategies,
Python-boundary nodes — the plan-shape facts OPTIMIZATION_r12.md cites.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_hadoop_spark import registry
from k_means_hadoop_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The top-cost queries from the committed quiet BENCH_LOCAL_r11.json,
# plus the four round-12 additions (never benched before this round).
WATCHLIST = [
    "kmeans_lloyd",
    "dedup_prefix_filter",
    "dedup_incremental_stored",
    "silhouette_sampled",
    "streaming_minhash_store",
    "bpe_compression",
    "ingest_increment",
    "umass_topic_coherence",
    "bpe_train_merges",
    "curate_corpus_release",
    "rfm_segments",
    "spearman_quality_logprob",
    "dedup_simhash_banded",
    "dedup_incremental",
    "dedup_components",
    "corr_matrix_lineitem",
    "silhouette_by_cluster",
    "hits_copurchase",
    "minhash_estimate_audit",
    "streaming_stateful_totals",
    "curate_corpus_full",
    "quantile_normalize_scores",
    "dedup_embedding_bucketed",
    "quality_classifier",
    "zonemap_prune_audit",
    "streaming_topk_users",
    "knn_pq_rerank",
    "knn_ivf_pq",
    "dedup_minhash_verified",
    "auc_quality_vs_gopher",
    "ogg_codec_id_stats",
    "warc_wet_stats",
    "warc_shard_scan",
    "dedup_edit_components",
]


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = sorted(set(re.findall(r"\b(\w*Join\w*)\b", plan)))
    py = sorted(set(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas|PythonMapInArrow)\b", plan)))
    scans = len(re.findall(r"Scan parquet", plan))
    return f"Exchange={n_ex} scans={scans} joins={joins} python={py}"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--top"]:
        names = WATCHLIST
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("opt_plans")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = registry.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
