"""Extended relational surface: sketch accuracy and as-of join
semantics that the DuckDB hash-compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.relational import (
    approx_distinct_parts,
    asof_join_purchase_before_click,
    distinct_agg_parts_per_flag,
)
from k_means_hadoop_spark.sources.events import load_events


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The in-plan HLL++ tolerance verdict must hold (approx_ok true for
    every flag) and the exact side must match the exact-distinct query."""
    got = {
        r["l_returnflag"]: (r["n_parts_exact"], r["approx_ok"])
        for r in approx_distinct_parts(spark, sf_dir).collect()
    }
    exact = {r["l_returnflag"]: r["n_parts"] for r in distinct_agg_parts_per_flag(spark, sf_dir).collect()}
    assert set(got) == set(exact)
    for flag, n in exact.items():
        assert got[flag] == (n, True), (flag, got[flag], n)


def test_lloyd_partition_invariance(spark, sf_dir):
    """Cluster sizes and membership must not depend on the input's
    physical partitioning; centroids agree to float-roundoff (the
    per-partition partial sums legally reassociate)."""
    from k_means_hadoop_spark.operators.kmeans import init_ids, lloyd_kmeans
    from k_means_hadoop_spark.sources.points import points_from_embeddings

    pts = points_from_embeddings(spark, sf_dir)
    seeds = [1, 51, 101]
    r1 = lloyd_kmeans(pts, init_ids(pts, seeds), max_iter=5)
    r7 = lloyd_kmeans(pts.repartition(7), init_ids(pts, seeds), max_iter=5)
    sizes = lambda r: sorted(
        (row["cluster"], row["n"])
        for row in r.assignments.groupBy("cluster").count().withColumnRenamed("count", "n").collect()
    )
    assert sizes(r1) == sizes(r7)
    for (c1, v1), (c7, v7) in zip(r1.centroids, r7.centroids):
        assert c1 == c7
        assert all(abs(a - b) < 1e-9 for a, b in zip(v1, v7))


def test_stop_shingle_cap(spark):
    """max_doc_freq drops hot shingles from the candidate join but keeps
    the Jaccard denominators exact."""
    from k_means_hadoop_spark.operators.dedup import ngram_jaccard_pairs, shingle_table

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "the quick brown fox jumps low"),
            (3, "the quick brown cat sits here"),
            (4, "completely different words entirely now yes"),
        ],
        "doc_id long, text string",
    )
    # 'the quick brown' appears in 3 docs; cap=2 drops it
    capped = shingle_table(docs, n=3, max_doc_freq=2)
    assert capped.filter(F.col("shingle") == "the quick brown").count() == 0
    exact = {(r["a_id"], r["b_id"]) for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    pruned = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(docs, threshold=0.3, max_doc_freq=2).collect()
    }
    assert pruned <= exact  # pruning only removes candidates
    assert (1, 2) in pruned  # docs 1-2 still share non-hot shingles


def test_asof_join_matches_naive(spark, sf_dir):
    """The union+window as-of join must equal the naive per-click argmax
    (computed driver-side over one user's events)."""
    ev = load_events(spark, sf_dir)
    uid = ev.filter(F.col("event_type") == "click").first()["user_id"]
    rows = ev.filter(F.col("user_id") == uid).select("event_id", "event_type", "ts", "value").collect()
    purchases = sorted(
        [r for r in rows if r["event_type"] == "purchase"], key=lambda r: (r["ts"], r["event_id"])
    )
    expected = {}
    for c in (r for r in rows if r["event_type"] == "click"):
        before = [p for p in purchases if p["ts"] <= c["ts"]]
        expected[c["event_id"]] = before[-1]["event_id"] if before else -1
    got = {
        r["click_id"]: r["purchase_id"]
        for r in asof_join_purchase_before_click(spark, sf_dir).filter(F.col("user_id") == uid).collect()
    }
    assert got == expected


# ------------------------------------------------- duplicate_components

def test_duplicate_components_topologies(spark):
    """Min-label propagation on a known graph: a 4-chain (worst-case
    diameter for its size), a triangle, and a disjoint pair must each
    collapse to their minimum id — and converge, not just stop at
    max_iter."""
    from k_means_hadoop_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4, triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id bigint, b_id bigint",
    )
    got = {
        (r.doc_id, r.comp_id) for r in duplicate_components(pairs).collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (4, 1),
            (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}
    assert got == want


def test_duplicate_components_chain_needs_propagation(spark):
    """A straight 6-chain given in worst order still converges to one
    component (labels must travel the full diameter, proving the loop
    iterates rather than doing a single neighbor pass)."""
    from k_means_hadoop_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(5, 6), (4, 5), (3, 4), (2, 3), (1, 2)], "a_id bigint, b_id bigint"
    )
    got = {(r.doc_id, r.comp_id) for r in duplicate_components(pairs).collect()}
    assert got == {(n, 1) for n in range(1, 7)}


def test_approx_percentiles_rank_accuracy(spark, sf_dir):
    """The percentile sketch's guarantee is on RANK, not value (a long
    tail can make adjacent ranks far apart in value): each sketch output
    must sit within 0.5% of its target quantile in the empirical CDF
    (rows-only query: the sketch output is engine-specific, so accuracy
    IS its correctness check)."""
    from k_means_hadoop_spark import registry

    from k_means_hadoop_spark.operators.relational import approx_percentile_values

    rows = approx_percentile_values(spark, sf_dir).collect()
    assert rows, "events fixture must produce at least one event type"
    for r in rows:
        assert r["n_events"] > 0
        assert (r["ok_p50"], r["ok_p90"], r["ok_p99"]) == (True, True, True), tuple(r)


def test_duplicate_components_random_graphs_match_union_find(spark):
    """Randomized adversary for the distributed CC: 30 seeded random
    graphs (disjoint id spaces, all in ONE Spark run) must match a
    driver-side union-find exactly — catches propagation bugs no
    hand-built topology covers."""
    import random

    from k_means_hadoop_spark.operators.dedup import duplicate_components

    rnd = random.Random(42)
    edges = []
    for g in range(30):
        base = g * 1000
        n = rnd.randint(2, 12)
        for _ in range(rnd.randint(1, 18)):
            a, b = rnd.randint(0, n - 1), rnd.randint(0, n - 1)
            if a != b:
                edges.append((base + min(a, b), base + max(a, b)))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "a_id bigint, b_id bigint")
    got = {r.doc_id: r.comp_id for r in duplicate_components(pairs).collect()}
    assert got == want


def test_stratified_sample_deterministic_and_rate_accurate(spark, sf_dir):
    """sampleBy is rows-only (engine-internal RNG): pin what IS
    guaranteed — the same seed yields the identical sample, and each
    stratum's realized rate tracks its configured fraction."""
    from k_means_hadoop_spark.operators.curation import (
        SAMPLE_FRACTIONS,
        stratified_sample_langs,
    )

    a = sorted(tuple(r) for r in stratified_sample_langs(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in stratified_sample_langs(spark, sf_dir).collect())
    assert a == b, "same seed must reproduce the identical sample"

    totals = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert {lang for lang, _n, _ok in a} == set(SAMPLE_FRACTIONS)
    for lang, n_total, rate_ok in a:
        assert n_total == totals[lang], (lang, n_total, totals[lang])
        assert rate_ok is True, f"{lang}: realized rate outside binomial tolerance"


def test_neardup_mllib_precision_and_recall(spark, sf_dir):
    """MLlib MinHashLSH near-dup vs the exact operator: every reported
    pair must be a TRUE pair with the exact Jaccard (approxSimilarityJoin
    verifies candidates exactly -> precision 1); recall is the
    approximation and must stay high at 16 hash tables."""
    from k_means_hadoop_spark.operators.dedup import neardup_mllib_minhash, ngram_jaccard_pairs
    from k_means_hadoop_spark.registry_pipeline import NGRAM_N, NGRAM_THRESHOLD, _docs

    docs = _docs(spark, sf_dir)
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in neardup_mllib_minhash(docs, n=NGRAM_N, threshold=NGRAM_THRESHOLD).collect()
    }
    true = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=NGRAM_THRESHOLD).collect()
    }
    assert set(got) <= set(true), "approx join reported a non-pair (precision must be 1)"
    for pair, j in got.items():
        assert abs(j - true[pair]) < 1e-5, f"{pair}: jaccard mismatch {j} vs {true[pair]}"
    assert len(got) >= 0.8 * len(true), f"recall {len(got)}/{len(true)} below 0.8"


def test_knn_mllib_lsh_recall_vs_exact_euclidean(spark, sf_dir):
    """BucketedRandomProjectionLSH top-k vs exact Euclidean top-k
    (numpy): per query, >= 60% of the true neighbor set must be found —
    the approximate-tier contract at 8 hash tables."""
    import numpy as np

    from k_means_hadoop_spark.operators.similarity import knn_mllib_lsh
    from k_means_hadoop_spark.registry_pipeline import KNN_QUERY_IDS, _emb

    emb = _emb(spark, sf_dir)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    got = {}
    for r in knn_mllib_lsh(emb, KNN_QUERY_IDS, k=5).collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    for qid in KNN_QUERY_IDS:
        q = mat[ids == qid][0]
        d = np.sqrt(((mat - q) ** 2).sum(axis=1))
        d[ids == qid] = np.inf
        true5 = set(int(i) for i in ids[np.argsort(d, kind="stable")[:5]])
        overlap = len(got.get(qid, set()) & true5)
        assert overlap >= 3, f"q{qid}: only {overlap}/5 true neighbors found"


def test_knn_ivf_full_probe_equals_bruteforce_and_partial_recall(spark, sf_dir):
    """IVF correctness ladder: probing ALL cells must reproduce the
    exact brute-force top-k bit-for-bit (the quantizer only PRUNES —
    it must never alter scores or ordering), and the production
    partial probe (nprobe=2 of 8 -> 25% of the corpus scanned) must
    keep mean recall well above the scan fraction."""
    import numpy as np

    from k_means_hadoop_spark.operators.similarity import knn_bruteforce, knn_ivf
    from k_means_hadoop_spark.registry_pipeline import KNN_QUERY_IDS, _emb

    emb = _emb(spark, sf_dir)
    full = sorted(tuple(r) for r in knn_ivf(emb, KNN_QUERY_IDS, k=5, n_cells=8, nprobe=8).collect())
    bf = sorted(tuple(r) for r in knn_bruteforce(emb, KNN_QUERY_IDS, k=5).collect())
    assert full == bf, "nprobe=n_cells must be exhaustive => identical to brute force"

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    got = {}
    for r in knn_ivf(emb, KNN_QUERY_IDS, k=5).collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    recalls = []
    for qid in KNN_QUERY_IDS:
        q = norm[ids == qid][0]
        sim = norm @ q
        sim[ids == qid] = -np.inf
        true5 = set(int(i) for i in ids[np.argsort(-sim, kind="stable")[:5]])
        recalls.append(len(got.get(qid, set()) & true5) / 5)
    assert sum(recalls) / len(recalls) >= 0.4, f"mean recall {recalls}"


def test_approx_top_terms_counts_exact_within_budget(spark, sf_dir):
    """approx_top_k accuracy: the synthetic vocabulary is far below the
    sketch's tracked-item budget, so every reported count must equal
    the exact count and the reported counts must be the true top-k
    count multiset (term membership at the boundary may tie)."""
    from collections import Counter

    from k_means_hadoop_spark.registry_pipeline import APPROX_TOP_K, _docs, q_approx_top_terms
    from pyspark.sql import functions as F

    got = {r["rank"]: r["n"] for r in q_approx_top_terms(spark, sf_dir).collect()}
    assert len(got) == APPROX_TOP_K
    exact = {
        r["term"]: r["n"]
        for r in _docs(spark, sf_dir)
        .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"))
        .filter("term != ''")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the (rank, n) ladder must be exactly the sorted true count ladder
    want = sorted(exact.values(), reverse=True)[:APPROX_TOP_K]
    assert [got[i + 1] for i in range(APPROX_TOP_K)] == want
    assert Counter(got.values()) == Counter(want)


def test_simhash_banded_equals_bruteforce_on_random_fingerprints(spark):
    """Pigeonhole recall-1 property on randomized fingerprints, not just
    the fixture: for max_hamming <= bands-1 the banded equi-join must
    produce EXACTLY the brute-force pair set (including hamming values)."""
    import random

    from k_means_hadoop_spark.operators.dedup import simhash_pairs, simhash_pairs_banded

    rng = random.Random(7)
    base = rng.getrandbits(32)
    rows = []
    for i in range(60):
        if i % 3 == 0:
            # near-dup of base: flip up to 4 bits (some within, some past the cap)
            fp = base
            for b in rng.sample(range(32), rng.randint(0, 4)):
                fp ^= 1 << b
        else:
            fp = rng.getrandbits(32)
        rows.append((i, fp))
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")
    brute = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in simhash_pairs(sh, 3, unbounded_ok=True).collect()
    }
    banded = {
        (r["a_id"], r["b_id"], r["hamming"]) for r in simhash_pairs_banded(sh, 3).collect()
    }
    assert banded == brute
    assert brute  # the generator above must actually produce close pairs


def test_embedding_bucketed_precision_one_and_recall(spark, sf_dir):
    """Bucketed embedding near-dup: every reported pair must appear in
    the exact all-pairs result with the same cos_sim (precision 1 — the
    verification step is the exact measure), and recall over the PLANTED
    corpus must clear the banding's design floor.  The raw fixture has
    no near-dup pairs at all (max pairwise cosine ≈ 0.51), so the
    planted clones are what makes this test discriminating: the exact
    set is asserted NON-EMPTY, and every sign-preserving clone pair must
    be recalled (the clone shares its original's signature in every
    band, so missing one is a candidate-generation bug, not bad luck)."""
    from k_means_hadoop_spark.operators.dedup import (
        embedding_neardup_bucketed,
        embedding_neardup_pairs,
    )
    from k_means_hadoop_spark.registry_pipeline import (
        PLANT_IDS,
        PLANT_OFFSET,
        _planted_emb,
    )

    planted = _planted_emb(spark, sf_dir, max_id=500)
    exact = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in embedding_neardup_pairs(
            planted, threshold=0.9, unbounded_ok=True
        ).collect()
    }
    assert exact, "planted corpus must contain near-dup pairs above threshold"
    assert {(i, i + PLANT_OFFSET) for i in PLANT_IDS} <= set(exact)
    got = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in embedding_neardup_bucketed(planted, threshold=0.9).collect()
    }
    assert set(got) <= set(exact)
    for pair, sim in got.items():
        assert abs(sim - exact[pair]) < 1e-9
    # sign-preserving clones collide in EVERY band → recall 1 on them
    assert {(i, i + PLANT_OFFSET) for i in PLANT_IDS} <= set(got)
    assert len(got) >= 0.5 * len(exact), f"recall {len(got)}/{len(exact)}"


def test_interleave_bits_matches_reference_morton(spark):
    """Catalyst Morton code vs an independent Python bit-twiddle over a
    grid including edge values."""
    from k_means_hadoop_spark.functions.zorder import interleave_bits

    def morton(x: int, y: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in [0, 1, 2, 3, 127, 128, 255] for y in [0, 1, 5, 95, 254, 255]]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", interleave_bits(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)
    # the curve is a bijection on the grid: all codes distinct
    assert len(set(got.values())) == len(pts)


def test_hll_sketch_merge_accuracy(spark, sf_dir):
    """Day-sketch union estimate must land within HLL's expected error of
    the exact distinct count — both per day and for the merged ALL row
    (merging sketches must not degrade the estimate)."""
    from k_means_hadoop_spark.operators.relational import hll_users_daily

    got = {
        r["day"]: (r["exact_users"], r["est_ok"])
        for r in hll_users_daily(spark, sf_dir).collect()
    }
    from k_means_hadoop_spark.sources.events import load_events

    ev = load_events(spark, sf_dir)
    exact_all = ev.select("user_id").distinct().count()
    assert got["ALL"] == (exact_all, True), (got["ALL"], exact_all)
    exact_daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for day, n in exact_daily.items():
        assert got[day] == (n, True), (day, got[day], n)


def test_quality_classifier_distills_heuristic(spark, sf_dir):
    """The model-based quality filter must (a) reproduce itself exactly
    across runs (training is deterministic: fixed slice, LBFGS, no RNG
    stream) and (b) agree with the heuristic gate it distills on the
    held-out (unlabeled) slice well above chance."""
    from k_means_hadoop_spark.operators.curation import _QC_LABEL_MOD, quality_classifier
    from k_means_hadoop_spark.operators.text import quality_scores

    out1 = {r["doc_id"]: (r["p_keep"], r["keep"]) for r in quality_classifier(spark, sf_dir).collect()}
    out2 = {r["doc_id"]: (r["p_keep"], r["keep"]) for r in quality_classifier(spark, sf_dir).collect()}
    assert out1 == out2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    heur = {r["doc_id"]: int(r["quality"] >= 0.5) for r in quality_scores(docs).collect()}
    held = [d for d in heur if d % _QC_LABEL_MOD != 0]
    assert held
    agree = sum(out1[d][1] == heur[d] for d in held) / len(held)
    assert agree >= 0.8, f"classifier/heuristic agreement {agree:.2f} on held-out slice"


def test_incremental_dedup_planted_statuses(spark):
    """Planted-duplicate semantics: a batch doc byte-identical to a
    corpus doc is 'exact_dup' (identical text ⇒ identical signature, so
    the LSH tier would also catch it — exact wins by precedence), a
    batch doc sharing no shingles with any corpus doc is 'new', and the
    batch comes back exactly once per doc."""
    from k_means_hadoop_spark.operators.dedup import incremental_dedup

    corpus = [(i, f"common word stream number {i} alpha beta gamma delta epsilon") for i in range(1, 9)]
    batch = [
        (101, corpus[2][1]),                      # exact copy of doc 3
        (102, "entirely unrelated zq xv wk jy pm"),  # shares nothing
    ]
    docs = spark.createDataFrame(corpus + batch, "doc_id long, text string")
    out = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup(docs, F.col("doc_id") > 100).collect()
    }
    assert out == {101: "exact_dup", 102: "new"}


def test_incremental_stored_roundtrips_index(spark, tmp_path):
    """The persisted-index variant must produce the identical statuses
    through the parquet store, and the store must hold both index
    tables (bands + md5 digests) a real ingest service maintains."""
    from k_means_hadoop_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_stored,
    )

    corpus = [(i, f"common word stream number {i} alpha beta gamma delta epsilon") for i in range(1, 9)]
    batch = [(101, corpus[2][1]), (102, "entirely unrelated zq xv wk jy pm")]
    docs = spark.createDataFrame(corpus + batch, "doc_id long, text string")
    flag = F.col("doc_id") > 100
    direct = {(r["doc_id"], r["status"]) for r in incremental_dedup(docs, flag).collect()}
    store = str(tmp_path / "store")
    stored = {
        (r["doc_id"], r["status"])
        for r in incremental_dedup_stored(docs, flag, store).collect()
    }
    assert stored == direct
    bands = spark.read.parquet(f"{store}/bands")
    assert set(bands.columns) == {"doc_id", "band", "bucket"}
    assert spark.read.parquet(f"{store}/md5").columns == ["text_md5"]


def test_pq_rerank_recall_ladder(spark, sf_dir):
    """PQ two-stage accuracy: (a) the exact-rerank tier's kept set must
    recover well above half the true euclidean top-5 (the ADC shortlist
    is the only recall loss — measured 0.80 at the registry parameters),
    and (b) rerank recall must be >= raw-ADC-top-5 recall (re-ranking a
    deep shortlist can only help)."""
    from k_means_hadoop_spark import registry_pipeline as rp
    from k_means_hadoop_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = emb.select(
        F.col("vec_id").cast("int").alias("vid"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    q = vecs.filter(F.col("vid").isin(rp.KNN_QUERY_IDS)).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec")
    )
    from pyspark.sql import Window

    d = F.sqrt(
        F.aggregate(
            F.zip_with("qvec", "vec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    # rank on the 6-dp-ROUNDED distance — the registry convention the
    # operators use — so a tie at the rounding boundary orders the same
    # way here as in knn_pq/knn_pq_rerank (unrounded ranking could swap
    # boundary neighbors and make the recall comparison order-sensitive)
    w = Window.partitionBy("qid").orderBy(F.col("d"), F.col("nid"))
    exact = {
        (r["qid"], r["nid"])
        for r in (
            vecs.crossJoin(F.broadcast(q))
            .filter(F.col("vid") != F.col("qid"))
            .select("qid", F.col("vid").alias("nid"), F.round(d, 6).alias("d"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
        ).collect()
    }

    rerank = {
        (r["qid"], r["nid"])
        for r in rp.q_knn_pq_rerank(spark, sf_dir).collect()
    }
    adc = {(r["qid"], r["nid"]) for r in rp.q_knn_pq(spark, sf_dir).collect()}
    recall_rerank = len(rerank & exact) / len(exact)
    recall_adc = len(adc & exact) / len(exact)
    assert recall_rerank >= 0.6, f"rerank recall {recall_rerank:.2f}"
    assert recall_rerank >= recall_adc, (recall_rerank, recall_adc)


def test_all_pairs_oracle_measures_require_opt_in(spark):
    """The O(n²) oracle measures must refuse unbounded inputs: callers
    either pass the built-in id bound or explicitly acknowledge they
    bounded the input themselves (round-2 verdict item 7)."""
    import pytest as _pytest

    from k_means_hadoop_spark.operators.dedup import (
        embedding_neardup_pairs,
        simhash_pairs,
    )

    sh = spark.createDataFrame([(1, 3), (2, 5)], "doc_id long, simhash long")
    with _pytest.raises(ValueError, match="all-pairs"):
        simhash_pairs(sh, 3)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id int, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="all-pairs"):
        embedding_neardup_pairs(emb, threshold=0.9)
    # both unlock with the explicit flag / bound
    assert simhash_pairs(sh, 3, unbounded_ok=True).count() >= 0
    assert embedding_neardup_pairs(emb, threshold=0.9, max_id=10).count() >= 0


def test_planted_ann_recall_signbit_and_lsh(spark, sf_dir):
    """Planted-neighbor recall for the bucketed ANN tiers (round-2
    verdict item 4): each PLANT_ID's clone is its true nearest neighbor
    by a wide margin (cos ≈ 0.9997 vs ≤ 0.52 for everything else).

    knn_signbit_lsh: the perturbation preserves every sign, so the
    clone shares its original's bucket in ALL cases — recall of the
    planted neighbor must be 1, rank 1 (missing one is a bucketing bug,
    not bad luck).

    knn_lsh (random hyperplanes): a clone's plane-dot signs can differ
    when a dot sits near zero, so recall < 1 is legitimate — but the
    fixture+seed are fixed, so the planted recall is deterministic;
    assert the measured floor (>= half the planted neighbors found,
    each at rank 1 when found)."""
    from k_means_hadoop_spark.operators.similarity import knn_lsh, knn_signbit_lsh
    from k_means_hadoop_spark.registry_pipeline import (
        KNN_SIGNBIT_BITS,
        PLANT_IDS,
        PLANT_OFFSET,
        _planted_emb,
    )

    planted = _planted_emb(spark, sf_dir)
    sb = {
        (r["qid"], r["nid"]): r["rank"]
        for r in knn_signbit_lsh(
            planted, PLANT_IDS, k=5, n_bits=KNN_SIGNBIT_BITS
        ).collect()
    }
    for q in PLANT_IDS:
        assert sb.get((q, q + PLANT_OFFSET)) == 1, (q, sb)

    lsh = {
        (r["qid"], r["nid"]): r["rank"]
        for r in knn_lsh(planted, PLANT_IDS, k=5).collect()
    }
    found = [q for q in PLANT_IDS if (q, q + PLANT_OFFSET) in lsh]
    assert len(found) * 2 >= len(PLANT_IDS), f"planted LSH recall {found}"
    for q in found:
        assert lsh[(q, q + PLANT_OFFSET)] == 1


def test_pii_redact_plants_and_cleans(spark, sf_dir):
    """Every planted email/phone/IP must be counted and fully redacted:
    no raw pattern survives in `clean`, placeholders appear exactly
    n times, and the planted grid (every 37th/41st/43rd doc) is the
    exact touched set."""
    from k_means_hadoop_spark.operators.curation import pii_redact_docs
    import re

    rows = pii_redact_docs(spark, sf_dir).collect()
    assert rows, "planted grid must touch some docs"
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\d{3}-\d{3}-\d{4}")
    ip = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    for r in rows:
        assert r["doc_id"] % 37 == 0 or r["doc_id"] % 41 == 0 or r["doc_id"] % 43 == 0
        assert not email.search(r["clean"]), r["clean"]
        assert not phone.search(r["clean"]), r["clean"]
        assert not ip.search(r["clean"]), r["clean"]
        assert r["clean"].count("<EMAIL>") == r["n_emails"] == (1 if r["doc_id"] % 37 == 0 else 0)
        assert r["clean"].count("<PHONE>") == r["n_phones"] == (1 if r["doc_id"] % 41 == 0 else 0)
        assert r["clean"].count("<IP>") == r["n_ips"] == (1 if r["doc_id"] % 43 == 0 else 0)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    expected = {i for i in range(n_docs) if i % 37 == 0 or i % 41 == 0 or i % 43 == 0}
    assert {r["doc_id"] for r in rows} == expected


def test_langid_confusion_partitions_corpus(spark, sf_dir):
    """The confusion matrix is a partition of the corpus: cell counts
    sum to the doc count, and the diagonal is non-trivial (the heuristic
    must beat all-undetermined on the labeled fixture)."""
    from k_means_hadoop_spark.operators.text import langid_confusion

    rows = langid_confusion(spark.read.parquet(f"{sf_dir}/documents.parquet")).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    diag = sum(r["n"] for r in rows if r["true_lang"] == r["pred_lang"])
    assert diag > 0


def test_tokenizer_bigrams_counts_all_occurrences(spark):
    """Merge-pair counting must keep within-doc repeats (the BPE count
    is occurrences, not document frequency) and rank deterministically."""
    from k_means_hadoop_spark.operators.text import tokenizer_fit_bigrams

    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "a b c"), (2, "x y")],
        "doc_id long, text string",
    )
    got = [(r["pair"], r["n"]) for r in tokenizer_fit_bigrams(docs, k=10).collect()]
    # "a b": 3 in doc0 + 1 in doc1; "b a": 2 in doc0; "b c", "x y": 1
    assert got == [("a b", 4), ("b a", 2), ("b c", 1), ("x y", 1)]


def test_boilerplate_spans_planted_grid(spark, sf_dir):
    """Planted license-header shingles must flag exactly the 7-grid docs
    with at least the 4 within-sentence shingles each (8 plant tokens →
    8-5+1 windows)."""
    from k_means_hadoop_spark.operators.curation import boilerplate_spans

    rows = boilerplate_spans(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 7 == 0
        assert r["n_boiler"] >= 4
        assert 0 < r["boiler_ratio"] <= 1
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert {r["doc_id"] for r in rows} == {i for i in range(n_docs) if i % 7 == 0}


def test_release_pipeline_gates_bite(spark, sf_dir):
    """curate_corpus_release must be curate_corpus_full plus two ACTIVE
    gates: per split it never admits more docs, at least one split
    shrinks (the boilerplate cut), and the redacted token accounting
    differs from the raw one somewhere (plants + placeholders)."""
    from k_means_hadoop_spark.operators.curation import (
        curate_corpus_full,
        curate_corpus_release,
    )

    full = {r["split"]: (r["n_docs"], r["total_tokens"]) for r in curate_corpus_full(spark, sf_dir).collect()}
    rel = {r["split"]: (r["n_docs"], r["total_tokens"]) for r in curate_corpus_release(spark, sf_dir).collect()}
    assert set(rel) == set(full)
    assert all(rel[s][0] <= full[s][0] for s in rel)
    assert any(rel[s][0] < full[s][0] for s in rel), "boilerplate gate never fired"
    # redaction check only meaningful on splits whose doc set is
    # unchanged (otherwise the token delta conflates both gates); if a
    # fixture change makes every split shrink, skip rather than
    # vacuously fail
    same_docs = [s for s in rel if rel[s][0] == full[s][0]]
    if same_docs:
        assert any(
            rel[s][1] != full[s][1] for s in same_docs
        ), "redaction accounting identical to raw accounting"


def test_pq_plan_cache_reuse(spark, sf_dir):
    """With a plan_cache_key the second knn_pq call must reuse the built
    index texts (no re-collect) and produce identical results."""
    from k_means_hadoop_spark.operators import similarity
    from k_means_hadoop_spark.registry_pipeline import (
        KNN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
        PQ_M,
        _emb,
    )

    similarity._PQ_PLAN_CACHE.clear()
    emb = _emb(spark, sf_dir)
    r1 = sorted(
        tuple(r)
        for r in similarity.knn_pq(
            emb, KNN_QUERY_IDS, PQ_CODEBOOK_IDS, k=5, m=PQ_M, plan_cache_key="t"
        ).collect()
    )
    assert len(similarity._PQ_PLAN_CACHE) == 1
    cached = next(iter(similarity._PQ_PLAN_CACHE.values()))
    r2 = sorted(
        tuple(r)
        for r in similarity.knn_pq(
            emb, KNN_QUERY_IDS, PQ_CODEBOOK_IDS, k=5, m=PQ_M, plan_cache_key="t"
        ).collect()
    )
    assert next(iter(similarity._PQ_PLAN_CACHE.values())) is cached  # reused, not rebuilt
    assert r1 == r2
    similarity._PQ_PLAN_CACHE.clear()


def test_pq_plan_cache_invalidates_on_data_change(spark, tmp_path):
    """The cache key folds in a fingerprint of the data files behind the
    plan_cache_key path: rewriting the parquet at the same path (a
    regenerated fixture, a refreshed corpus in a long-lived service)
    must miss the cache and rebuild the ADC tables from the NEW data —
    a stale hit here silently serves distances computed from vanished
    embeddings."""
    import time

    from k_means_hadoop_spark.operators import similarity

    path = str(tmp_path / "emb")

    def write(scale: float) -> None:
        spark.createDataFrame(
            [(i, [scale * i, scale * (i + 1), 1.0, 0.5]) for i in range(1, 21)],
            "vec_id int, embedding array<float>",
        ).write.mode("overwrite").parquet(path)

    write(1.0)
    similarity._PQ_PLAN_CACHE.clear()
    emb = spark.read.parquet(path)
    r1 = sorted(
        tuple(r)
        for r in similarity.knn_pq(
            emb, [1, 2], list(range(3, 19)), k=3, m=2, plan_cache_key=path
        ).collect()
    )
    assert len(similarity._PQ_PLAN_CACHE) == 1
    # parquet filenames can repeat across overwrites; mtime_ns (plus
    # size) is the discriminator — nudge the clock past fs granularity
    time.sleep(0.01)
    write(2.0)
    emb2 = spark.read.parquet(path)
    r2 = sorted(
        tuple(r)
        for r in similarity.knn_pq(
            emb2, [1, 2], list(range(3, 19)), k=3, m=2, plan_cache_key=path
        ).collect()
    )
    assert len(similarity._PQ_PLAN_CACHE) == 2, "data change did not miss the cache"
    assert r1 != r2  # distances derive from the new embeddings
    similarity._PQ_PLAN_CACHE.clear()


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """The one-DAG BPE trainer must learn exactly the merges a
    straightforward Python implementation learns on the same corpus
    (pair counting, count-desc/a/b tie-break, leftmost-greedy
    application — each round depends on the previous round's merge
    being applied correctly)."""
    import re as _re
    from collections import Counter

    from k_means_hadoop_spark.operators.text import bpe_train_merges

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    corpora = [
        _re.split(r"\s+", t.lower().strip()) for t in docs.values()
    ]

    def top_pair(corp):
        c = Counter()
        for toks in corp:
            for i in range(len(toks) - 1):
                c[(toks[i], toks[i + 1])] += 1
        return min(c.items(), key=lambda kv: (-kv[1], kv[0]))  # count desc, (a,b) asc

    def apply(corp, a, b):
        out = []
        for toks in corp:
            acc = []
            for t in toks:
                if acc and acc[-1] == a and t == b:
                    acc[-1] = a + " " + b
                else:
                    acc.append(t)
            out.append(acc)
        return out

    want = []
    for r in range(1, 4):
        (a, b), n = top_pair(corpora)
        want.append((r, a, b, n))
        corpora = apply(corpora, a, b)

    got = sorted(
        (r["round"], r["a"], r["b"], r["n"]) for r in bpe_train_merges(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), n_rounds=3
        ).collect()
    )
    assert got == want, (got, want)


def test_bpe_checkpoint_invariant(spark, sf_dir):
    """localCheckpoint is a lineage cut, not a semantics change: the
    learned merge table must be bit-identical with and without
    per-round checkpoints."""
    from k_means_hadoop_spark.operators.text import bpe_train_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = sorted(
        (r["round"], r["a"], r["b"], r["n"])
        for r in bpe_train_merges(docs, n_rounds=6, checkpoint_every=0).collect()
    )
    chk = sorted(
        (r["round"], r["a"], r["b"], r["n"])
        for r in bpe_train_merges(docs, n_rounds=6, checkpoint_every=2).collect()
    )
    assert base == chk, (base, chk)


def test_bpe_plan_depth_bounded_by_checkpoint(spark, sf_dir):
    """The per-round checkpoint keeps Catalyst plan size bounded by the
    checkpoint window, not the total round count: a 12-round fit's
    final token table must plan against the last checkpoint (an
    ExistingRDD scan), and its plan must not be materially larger than
    a 6-round fit's with the same window — the superlinear nesting the
    docstring warns about is gone."""
    from k_means_hadoop_spark.operators.text import bpe_apply_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    # 12 rounds checkpoint at r=4,8 → 4 rounds nest above the last cut;
    # 8 rounds checkpoint at r=4 → also 4 rounds above.  Same window ⇒
    # same plan size, regardless of total round count (each un-cut round
    # DOUBLES the plan tree — cur feeds both the pair count and the
    # merge join — so without the cut 12 rounds would be 2^8× larger).
    p12 = bpe_apply_merges(docs, n_rounds=12, checkpoint_every=4)._jdf.queryExecution().analyzed().toString()
    p8 = bpe_apply_merges(docs, n_rounds=8, checkpoint_every=4)._jdf.queryExecution().analyzed().toString()
    assert "ExistingRDD" in p12 or "LogicalRDD" in p12
    assert len(p12) < 1.5 * len(p8), (len(p12), len(p8))


def test_bpe_degenerate_round_fails_loudly(spark):
    """A round with no adjacent pair anywhere used to empty the token
    table silently (crossJoin with an empty top-1); it must now raise
    with the round number at execution."""
    import pytest as _pytest

    from k_means_hadoop_spark.operators.text import bpe_compression, bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, "spark")], "doc_id int, text string"
    )
    with _pytest.raises(Exception, match="no adjacent token pairs"):
        bpe_train_merges(docs, n_rounds=2).collect()
    with _pytest.raises(Exception, match="no adjacent token pairs"):
        bpe_compression(docs, n_rounds=1).collect()


# ------------------------------------------------------------------ round 4


def test_gopher_gate_both_classes_and_no_shuffle(spark, sf_dir):
    """The gate must actually gate (both verdicts present, multiple
    distinct failure reasons) and stay map-only (no Exchange: it is the
    in-scan filter it claims to be)."""
    from k_means_hadoop_spark.operators.text import gopher_quality_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_quality_gate(docs)
    reasons = {r["reason"] for r in out.select("reason").distinct().collect()}
    assert "pass" in reasons and len(reasons) >= 3, reasons
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bigram_logprob_counts_and_range(spark, sf_dir):
    """Every document with >= 2 tokens scores exactly n_words - 1
    adjacent pairs, and every interpolated probability is < 1 (negative
    log-score)."""
    from k_means_hadoop_spark.operators.text import bigram_logprob, gopher_quality_gate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bg = bigram_logprob(docs)
    words = gopher_quality_gate(docs).select("doc_id", "n_words")
    joined = bg.join(words, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["n_bigrams"] == r["n_words"] - 1, r
        assert r["avg_logprob"] < 0.0, r


def test_mixture_plan_budget_and_caps(spark, sf_dir):
    """Both planner branches engage (>= 1 capped stratum at epochs 1.0,
    >= 1 uncapped below 1.0), no stratum exceeds its availability, and
    the total allocation lands within one redistribution pass of the
    budget (<= budget, and > the proportional first pass alone)."""
    from k_means_hadoop_spark.operators.curation import dataset_mixture_plan

    rows = dataset_mixture_plan(spark, sf_dir).collect()
    assert len(rows) >= 2
    capped = [r for r in rows if r["epochs"] >= 0.999999]
    uncapped = [r for r in rows if r["epochs"] < 0.999999]
    assert capped and uncapped, rows
    for r in rows:
        assert r["alloc_tokens"] <= r["avail_tokens"] + 1e-6, r
    total_avail = sum(r["avail_tokens"] for r in rows)
    budget = total_avail * 9 // 10
    assert sum(r["alloc_tokens"] for r in rows) <= budget + 1e-3
    assert sum(r["alloc_tokens"] for r in rows) > sum(
        min(r["target_tokens"], float(r["avail_tokens"])) for r in rows
    ) - 1e-3


def test_funnel_pattern_matches_python_reference(spark, sf_dir):
    """The regex conversion count must equal a pure-Python greedy scan
    of the same per-user symbol sequence (independent of any regex
    engine's matching discipline)."""
    import re

    from k_means_hadoop_spark.operators.relational import (
        _FUNNEL_PATTERN,
        event_funnel_pattern,
    )
    from k_means_hadoop_spark.sources.events import load_events

    got = {r["user_id"]: r["conversions"] for r in event_funnel_pattern(spark, sf_dir).collect()}
    ev = (
        load_events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs: dict = {}
    sym = {"view": "v", "click": "c", "purchase": "p", "signup": "s", "error": "e"}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(sym[r["event_type"]])

    def greedy(seq: str) -> int:
        # leftmost non-overlapping scan: v ... c ... p with no p inside
        n, i = 0, 0
        pat = re.compile(_FUNNEL_PATTERN)
        while True:
            m = pat.search(seq, i)
            if not m:
                return n
            n += 1
            i = m.end()

    for uid, syms in seqs.items():
        assert got[uid] == greedy("".join(syms)), uid


def test_er_blocked_pairs_verified(spark, sf_dir):
    """Every emitted pair shares the blocking noun and is within the
    edit-distance bound; at least one pair exists (non-vacuous)."""
    from k_means_hadoop_spark.operators.relational import _ER_MAX_LEV, er_blocked_fuzzy

    rows = er_blocked_fuzzy(spark, sf_dir).collect()
    assert rows

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for r in rows:
        assert r["name_a"].split()[-1] == r["name_b"].split()[-1], r
        assert r["lev_dist"] == lev(r["name_a"], r["name_b"]) <= _ER_MAX_LEV, r


def test_ewma_matches_local_recurrence(spark, sf_dir):
    """The folded EWMA equals the day-by-day recurrence computed locally
    from the same daily totals."""
    from k_means_hadoop_spark.operators.relational import _EWMA_ALPHA, ewma_daily_purchases

    rows = sorted(ewma_daily_purchases(spark, sf_dir).collect(), key=lambda r: r["day"])
    assert len(rows) >= 2
    prev = None
    for r in rows:
        expect = r["total"] if prev is None else r["total"] * _EWMA_ALPHA + prev * (1 - _EWMA_ALPHA)
        assert abs(r["ewma"] - round(expect, 6)) <= 1e-6, r
        # carry the unrounded recurrence forward on the rounded totals
        prev = expect


def test_anomaly_days_flags_tail(spark, sf_dir):
    """z-scores must be centered (mean ~ 0 per type) and the fixture
    contains at least one flagged day."""
    from k_means_hadoop_spark.operators.relational import anomaly_event_days

    rows = anomaly_event_days(spark, sf_dir).collect()
    assert any(r["is_anomaly"] for r in rows)
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["z"])
    for t, zs in by_type.items():
        assert abs(sum(zs) / len(zs)) < 1e-3, t


def test_compact_shards_reduces_files_content_identical(spark, tmp_path):
    """Compaction must shrink the file count to the byte-derived target
    and keep every row byte-identical."""
    from k_means_hadoop_spark.sources.sinks import compact_parquet

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    df = spark.range(0, 10_000).selectExpr("id", "id * 7 AS v")
    df.repartition(32).write.mode("overwrite").parquet(frag)
    n_files = compact_parquet(spark, frag, out, target_bytes=1 << 30)
    assert n_files == 1
    import os

    frag_files = [f for f in os.listdir(frag) if f.endswith(".parquet")]
    out_files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(frag_files) == 32 and len(out_files) == 1
    a = {(r["id"], r["v"]) for r in spark.read.parquet(out).collect()}
    b = {(r["id"], r["v"]) for r in df.collect()}
    assert a == b


def test_ivf_pq_agrees_with_pq_on_probed_cells(spark, sf_dir):
    """IVF+PQ is PQ restricted to probed cells: every pair it returns
    must carry the SAME ADC distance knn_pq computes, and per query it
    returns exactly k rows (cells are fixture-dense enough)."""
    from k_means_hadoop_spark.operators.similarity import knn_ivf_pq, knn_pq
    from k_means_hadoop_spark.registry_pipeline import (
        IVFPQ_CELL_IDS,
        IVFPQ_NPROBE,
        KNN_QUERY_IDS,
        PQ_CODEBOOK_IDS,
        PQ_M,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivfpq = knn_ivf_pq(
        emb, KNN_QUERY_IDS, IVFPQ_CELL_IDS, PQ_CODEBOOK_IDS, k=5, m=PQ_M,
        nprobe=IVFPQ_NPROBE,
    ).collect()
    full = {
        (r["qid"], r["nid"]): r["approx_dist"]
        for r in knn_pq(emb, KNN_QUERY_IDS, PQ_CODEBOOK_IDS, k=500, m=PQ_M).collect()
    }
    per_q: dict = {}
    for r in ivfpq:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        assert full[(r["qid"], r["nid"])] == r["approx_dist"], r
    assert set(per_q) == set(KNN_QUERY_IDS)
    assert all(v == 5 for v in per_q.values()), per_q


def test_containment_catches_asymmetric_subset(spark, sf_dir):
    """Every planted prefix-clone must surface with containment exactly
    1.0 in the clone→original direction while the symmetric Jaccard
    stays below the near-dup threshold — the case Jaccard-only dedup
    misses by design."""
    from k_means_hadoop_spark.registry_pipeline import (
        CONTAIN_PLANT_IDS,
        CONTAIN_PLANT_OFFSET,
        q_dedup_containment,
    )

    rows = {(r["a_id"], r["b_id"]): r for r in q_dedup_containment(spark, sf_dir).collect()}
    for pid in CONTAIN_PLANT_IDS:
        r = rows[(pid, pid + CONTAIN_PLANT_OFFSET)]
        assert r["c_b_in_a"] == 1.0, r
        jac = r["common"] / (r["common"] / r["c_a_in_b"] + r["common"] / r["c_b_in_a"] - r["common"])
        assert jac < 0.7, (r, jac)


def test_knn_filtered_respects_language(spark, sf_dir):
    """Every neighbor shares the query's language, and the filter
    actually changes at least one query's top-k vs the unfiltered
    search (non-vacuous filter)."""
    from k_means_hadoop_spark.operators.similarity import knn_bruteforce, knn_filtered
    from k_means_hadoop_spark.registry_pipeline import KNN_QUERY_IDS

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    filt = knn_filtered(emb, docs, KNN_QUERY_IDS, k=5).collect()
    assert filt
    for r in filt:
        assert r["lang"] == lang[r["qid"]], r
        assert lang[r["nid"]] == lang[r["qid"]], r
    unfiltered = {
        (r["qid"], r["nid"]) for r in knn_bruteforce(emb, KNN_QUERY_IDS, k=5).collect()
    }
    assert {(r["qid"], r["nid"]) for r in filt} != unfiltered


def test_split_by_group_no_source_crosses_splits(spark, sf_dir):
    """Leakage-safety by construction: recompute the per-(source, split)
    membership row-by-row and assert every source maps to exactly one
    split, while all three splits are populated."""
    from k_means_hadoop_spark.operators.curation import (
        _GSPLIT_SALT,
        _GSPLIT_TRAIN_LT,
        split_by_group,
    )
    from k_means_hadoop_spark.functions.hashing import stable_hash64

    from pyspark.sql import functions as SF

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = stable_hash64(SF.concat(SF.lit(_GSPLIT_SALT), SF.col("source"))) % SF.lit(10)
    split = (
        SF.when(h < _GSPLIT_TRAIN_LT, SF.lit("train"))
        .when(h < _GSPLIT_TRAIN_LT + 1, SF.lit("val"))
        .otherwise(SF.lit("test"))
    )
    per_source = (
        docs.select("source", split.alias("split"))
        .groupBy("source")
        .agg(SF.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_source)
    out = {r["split"]: r for r in split_by_group(spark, sf_dir).collect()}
    assert set(out) == {"train", "val", "test"}, out
    assert sum(r["n_docs"] for r in out.values()) == docs.count()


def test_udtf_analyze_dynamic_schema_and_validation(spark):
    """The analyze() UDTF produces a different relation type per call
    site (n=2 vs n=4) and rejects a non-positive n at plan time."""
    import pytest as _pytest

    from k_means_hadoop_spark.functions.udtfs import register_ngram_cols

    register_ngram_cols(spark)
    spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string").createOrReplaceTempView(
        "_udtf_dyn_docs"
    )
    two = spark.sql("SELECT g.* FROM _udtf_dyn_docs d, LATERAL ngram_cols(d.text, 2) g")
    four = spark.sql("SELECT g.* FROM _udtf_dyn_docs d, LATERAL ngram_cols(d.text, 4) g")
    assert two.columns == ["pos", "t0", "t1"]
    assert four.columns == ["pos", "t0", "t1", "t2", "t3"]
    assert two.count() == 4 and four.count() == 2
    with _pytest.raises(Exception, match="positive"):
        spark.sql("SELECT g.* FROM _udtf_dyn_docs d, LATERAL ngram_cols(d.text, 0) g").collect()


def test_bigram_logprob_matches_python_reference(spark):
    """The interpolated bigram score must equal a pure-Python
    implementation of the same model (corpus-trained counts, λ-backoff
    to unigram mass) on a small corpus computed by hand."""
    import math

    from k_means_hadoop_spark.operators.text import BIGRAM_LAMBDA, bigram_logprob

    texts = {
        1: "the cat sat on the mat",
        2: "the cat ran",
        3: "a dog sat on a log",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id int, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in bigram_logprob(docs).collect()}

    toks = {i: t.split() for i, t in texts.items()}
    uni: dict = {}
    bg: dict = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    n_total = sum(uni.values())
    lam = BIGRAM_LAMBDA
    for i, ts in toks.items():
        lps = [
            math.log(lam * (bg[(a, b)] / uni[a]) + (1 - lam) * (uni[b] / n_total))
            for a, b in zip(ts, ts[1:])
        ]
        assert got[i][0] == len(lps)
        assert abs(got[i][1] - round(sum(lps) / len(lps), 6)) <= 1e-6, (i, got[i])


def test_pagerank_mass_conserved(spark, sf_dir):
    """Rank mass must be conserved (Σrank = 1 within float tolerance on
    a dangling-free graph) and every node strictly positive."""
    from k_means_hadoop_spark.operators.relational import pagerank_copurchase

    rows = pagerank_copurchase(spark, sf_dir).collect()
    assert rows
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-3, total
    assert all(r["rank"] > 0 for r in rows)
