"""Semantics pins for the round-4d corpus-pipeline operators
(cross-engine parity is covered by test_oracle_parity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_hadoop_spark.operators import corpus_extra


def test_curriculum_phases_follow_quality_order(spark, sf_dir):
    df = corpus_extra.curriculum_schedule(spark, sf_dir).toPandas()
    assert set(df["phase"]) == {1, 2, 3, 4}
    # phases are contiguous in the quality ordering: the worst quality
    # in phase k must be >= the best quality in phase k+1 (ties broken
    # by doc_id can interleave equal scores only)
    for k in (1, 2, 3):
        assert df[df.phase == k]["quality"].min() >= df[df.phase == k + 1]["quality"].max() - 1e-9
    # each phase's token budget is ~1/4 of total (within one document)
    total = df["n_tokens"].sum()
    max_doc = df["n_tokens"].max()
    for k in (1, 2, 3, 4):
        share = df[df.phase == k]["n_tokens"].sum()
        assert share <= total / 4 + max_doc


def test_perplexity_buckets_are_rank_thirds(spark, sf_dir):
    df = corpus_extra.perplexity_buckets(spark, sf_dir).toPandas()
    sizes = df.groupby("bucket").size()
    assert set(sizes.index) == {"head", "middle", "tail"}
    assert sizes.max() - sizes.min() <= 1
    assert df[df.bucket == "head"]["avg_logprob"].min() >= df[df.bucket == "tail"]["avg_logprob"].max() - 1e-9


def test_repeated_ngram_spans_detect_planted_clones(spark, sf_dir):
    from k_means_hadoop_spark.functions.hashing import word_ngrams

    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in corpus_extra.repeated_ngram_spans(spark, sf_dir).collect()
    }
    docs = corpus_extra._docs(spark, sf_dir)
    for r in (
        docs.where(F.col("doc_id") <= 3)
        .select(
            "doc_id",
            F.size(word_ngrams(F.col("text"), corpus_extra._SPAN_N)).alias("n"),
        )
        .collect()
    ):
        if r["n"] > 0:
            # the verbatim clone shares every distinct 8-gram
            assert got[(r["doc_id"], r["doc_id"] + 300000)] == r["n"]


def test_mad_gate_flags_planted_outliers(spark, sf_dir):
    df = corpus_extra.mad_outlier_docs(spark, sf_dir).toPandas()
    planted = df[df.doc_id > 200000]
    assert len(planted) == 3, "all 3 stretched clones must be flagged"
    # every flagged row genuinely violates the gate
    assert ((df["n_chars"] - df["med"]).abs() > 3 * df["mad"]).all()


def test_dup_rate_engages_only_on_planted_sources(spark, sf_dir):
    df = corpus_extra.dedup_rate_by_source(spark, sf_dir).toPandas()
    planted_sources = set(
        r["source"]
        for r in corpus_extra._docs(spark, sf_dir)
        .where(F.col("doc_id") <= 5)
        .select("source")
        .collect()
    )
    with_dups = set(df[df.dup_rate > 0]["source"])
    assert with_dups == planted_sources
    assert (df[~df.source.isin(planted_sources)]["dup_rate"] == 0).all()
    # rate definition holds exactly
    recon = 1.0 - df["n_unique"] / df["n_docs"]
    assert (recon.round(6) == df["dup_rate"]).all()
