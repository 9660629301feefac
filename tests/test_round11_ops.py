"""Round-11 pins: the LSH→levenshtein dedup composition and the
edit-distance ASCII parity bound.

1. ``dedup.edit_verified_pairs`` (round-10 verdict item 3) is the
   100 TB composition the ``edit_distance_pairs`` docstring prescribes:
   MinHash LSH candidates → threshold levenshtein verify.  Pins:
   precision 1 (output ⊆ the exact length-banded operator's pairs) and
   the candidate-count reduction that justifies the composition (the
   LSH candidate set is an order of magnitude smaller than the pure
   length band's).
2. The edit-distance oracle pairing is exact only on single-byte text
   (Spark levenshtein counts CHARACTERS, DuckDB counts BYTES —
   dedup.py's unicode-seam note).  Round-10 verdict item 4: that bound
   must be ENFORCED, not just stated — the fixture pin fails if a
   non-ASCII document ever enters any shipped documents table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from k_means_hadoop_spark.operators import dedup
from k_means_hadoop_spark.registry_pipeline import EDIT_DIST_MAX, NGRAM_N, _docs


def test_edit_verified_precision_one(spark, sf_dir):
    """Every (a_id, b_id, dist) the composition emits appears verbatim
    in the exact length-banded operator's output: LSH banding may drop
    pairs (recall < 1) but can never invent or mis-measure one."""
    exact = {
        (r.a_id, r.b_id, r.dist)
        for r in dedup.edit_distance_pairs(
            _docs(spark, sf_dir), max_dist=EDIT_DIST_MAX
        ).collect()
    }
    verified = {
        (r.a_id, r.b_id, r.dist)
        for r in dedup.edit_verified_pairs(
            _docs(spark, sf_dir), n=NGRAM_N, max_dist=EDIT_DIST_MAX
        ).collect()
    }
    assert verified  # the planted near-identical docs must surface
    assert verified <= exact


def test_edit_verified_candidate_reduction(spark, sf_dir):
    """The reason the composition exists: the content-banded candidate
    set must be an order of magnitude smaller than the pure length
    band's (measured 146 vs 2692 at sf0.001, 150 vs 2748 at sf0.01)."""
    docs = _docs(spark, sf_dir)
    t, band = EDIT_DIST_MAX, 8
    d = docs.select(
        "doc_id",
        F.length("text").alias("len"),
        F.expr(f"CAST(length(text) AS BIGINT) DIV {band}").alias("bk"),
    )
    a = d.select(
        F.col("doc_id").alias("a_id"),
        F.col("len").alias("la"),
        F.explode(F.array(F.col("bk") - 1, F.col("bk"), F.col("bk") + 1)).alias("k"),
    )
    b = d.select(
        F.col("doc_id").alias("b_id"), F.col("len").alias("lb"), F.col("bk").alias("k")
    )
    length_band = (
        a.join(b, "k")
        .filter((F.col("a_id") < F.col("b_id")) & (F.abs(F.col("la") - F.col("lb")) <= t))
        .count()
    )
    lsh = dedup.minhash_lsh_candidates(docs, NGRAM_N).count()
    assert lsh * 10 <= length_band, (lsh, length_band)


@pytest.mark.parametrize("sf", ["0.001", "0.01", "0.1"])
def test_documents_fixture_is_single_byte(spark, sf):
    """The enforced ASCII bound (dedup.py's unicode-seam note): Spark's
    levenshtein counts characters, DuckDB's counts bytes, so every
    edit-distance oracle pairing is exact only while octet_length ==
    char_length for every document.  If a multi-byte doc ever lands in
    a shipped fixture, THIS fails — not a silent driver hash flip."""
    path = f"/root/testdata/sf{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"no testdata at {path}")
    docs = spark.read.parquet(path)
    multi = docs.filter(F.octet_length("text") != F.length("text")).count()
    assert multi == 0
