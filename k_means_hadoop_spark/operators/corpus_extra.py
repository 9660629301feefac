"""Corpus-pipeline extensions (round 4d): curriculum construction,
CCNet-style perplexity bucketing, cross-document exact n-gram span
detection, robust (median/MAD) outlier gating, and per-source exact
duplication rates.

Each query composes an ALREADY hash-verified scoring stage (the quality
score, the unigram LM, the shingle tokenizer — both engine sides reused
verbatim from their green entries) with new exact-integer or
rank-deterministic logic, so the float-determinism burden stays where
it was already discharged.

Where the fixture cannot supply the interesting case (it contains no
exact duplicates and no length outliers), the query PLANTS deterministic
rows inside itself on both engine sides — the repo-standard pattern
(round-2 verdict: a hash-match on the empty case proves nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k_means_hadoop_spark.functions.hashing import word_ngrams, word_ngrams_sql
from k_means_hadoop_spark.operators import text
from k_means_hadoop_spark.partitioning import fan_out


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(spark.read.parquet(f"{sf_dir}/documents.parquet"))


# ------------------------------------------------- curriculum schedule
#
# Quality-ordered curriculum: documents sorted best-first, cut into 4
# phases of (approximately) equal TOKEN budget — the "clean data last"
# schedule large pretraining runs use.  Phase boundaries come from
# exact integer cumulative sums; the only floats are the (already
# hash-verified, 6dp-rounded) quality scores used for ordering, with
# doc_id as the total-order tiebreak.

_CURRICULUM_PHASES = 4
_PHASE_EXPR = (
    "least({p}, 1 + CAST(floor((cum - n_tokens) * {p}.0 / total) AS INT))"
).format(p=_CURRICULUM_PHASES)


def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, quality, phase) — phase 1 holds the
    highest-quality documents up to 1/4 of total tokens, and so on.
    A document's phase is decided by the cumulative tokens BEFORE it,
    so phases are contiguous in the quality ordering."""
    q = text.quality_scores(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "quality"
    )
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = q.agg(F.sum("n_tokens").alias("total"))
    return (
        q.withColumn("cum", F.sum("n_tokens").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            F.expr(_PHASE_EXPR).alias("phase"),
        )
    )


def _curriculum_sql() -> str:
    from k_means_hadoop_spark.registry_pipeline import _quality_sql

    return f"""
WITH q AS (SELECT doc_id, n_tokens, quality FROM ({_quality_sql()})),
t AS (SELECT SUM(n_tokens)::BIGINT AS total FROM q),
r AS (SELECT doc_id, n_tokens, quality,
             SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
      FROM q)
SELECT doc_id, n_tokens, quality, {_PHASE_EXPR} AS phase
FROM r CROSS JOIN t
"""


# ------------------------------------------------- perplexity buckets
#
# CCNet-style head/middle/tail partition of the corpus by unigram-LM
# score.  Rank-based thirds (ntile over the rounded score with doc_id
# tiebreak) instead of value thresholds: the cut is then deterministic
# by construction — no engine ever compares a float against an
# interpolated percentile boundary.


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob, bucket) — bucket ∈
    head/middle/tail, best scores first.  At 100 TB the global ntile
    sort is replaced by a sampled-quantile cut; the fixture-exact form
    keeps the oracle total."""
    lp = text.unigram_logprob(_docs(spark, sf_dir))
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col("doc_id").asc())
    n = F.ntile(3).over(w)
    return lp.select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        F.when(n == 1, F.lit("head"))
        .when(n == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _perplexity_sql() -> str:
    from k_means_hadoop_spark.registry_pipeline import _unigram_logprob_sql

    return f"""
WITH lp AS ({_unigram_logprob_sql()}),
r AS (SELECT doc_id, n_tokens, avg_logprob,
             ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id ASC) AS nt
      FROM lp)
SELECT doc_id, n_tokens, avg_logprob,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM r
"""


# ------------------------------------------------- repeated n-gram spans
#
# Cross-document exact 8-gram overlap — the "training data appears
# verbatim elsewhere" detector (the suffix-array substring-dedup
# signal, expressed as an inverted n-gram index: gram → docs → pairs).
# Unlike MinHash/Jaccard (similarity of WHOLE documents) this counts
# shared exact spans, so it catches a paragraph quoted inside an
# otherwise unrelated document.

_SPAN_N = 8
_SPAN_MAX_ID = 400  # fixture-scale pair bound (same pattern as NEARDUP_MAX_ID)


def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_shared) — pairs of documents sharing ≥1 exact
    8-gram, with the count of distinct shared 8-grams.  Inverted-index
    join: shuffle is gram-partitioned, pair fan-out bounded by
    per-gram document frequency (production adds the stop-gram cap
    ``shingle_table(max_doc_freq=...)`` uses)."""
    base = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") <= _SPAN_MAX_ID)
        .select("doc_id", "text")
    )
    # planted verbatim clones (doc_id+300000): sf0.1's corpus shares no
    # natural 8-gram under the id cap, and a 0-row hash-match proves
    # nothing — the clones guarantee real span pairs at every sf
    d = base.unionByName(
        base.where(F.col("doc_id") <= 3).select(
            (F.col("doc_id") + F.lit(300000)).alias("doc_id"), "text"
        )
    )
    g = d.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), _SPAN_N)).alias("gram")
    )
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _spans_sql() -> str:
    ng = word_ngrams_sql("text", _SPAN_N)
    return f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id <= {_SPAN_MAX_ID}
  UNION ALL
  SELECT doc_id + 300000, text FROM documents WHERE doc_id <= 3),
g AS (SELECT doc_id, unnest({ng}) AS gram FROM d)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ------------------------------------------------- median/MAD outlier gate
#
# Robust per-language length outliers: |x − median| > 3·MAD.  The
# fixture's lengths are too well-behaved to produce any (measured: 0
# at every sf), so the query plants 3 deterministic stretched clones
# (doc_id+200000, n_chars×20) on both engine sides; the planted rows
# are exactly the rows the gate must flag.  All values are integers or
# exact quarter-step medians — no float drift surface.


def mad_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_chars, med, mad) — documents whose length is a
    robust outlier within their language."""
    base = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    planted = (
        base.where(F.col("doc_id") <= 3)
        .select(
            (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
            "lang",
            (F.col("n_chars") * F.lit(20)).alias("n_chars"),
        )
    )
    d = base.unionByName(planted)
    med = d.groupBy("lang").agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    dev = d.join(F.broadcast(med), "lang").withColumn(
        "dev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "lang")
        .where(F.col("dev") > F.lit(3) * F.col("mad"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


_MAD_SQL = """
WITH d AS (
  SELECT doc_id, lang, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 200000, lang, n_chars * 20 FROM documents WHERE doc_id <= 3),
m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY lang),
dev AS (SELECT doc_id, d.lang, n_chars, med, abs(n_chars - med) AS dev
        FROM d JOIN m USING (lang)),
md AS (SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY lang)
SELECT doc_id, dev.lang, n_chars,
       round(med, 6) AS med, round(mad, 6) AS mad
FROM dev JOIN md USING (lang)
WHERE dev > 3 * mad
"""


# ------------------------------------------------- per-source dup rate
#
# Exact-duplicate rate per source — the ingest-monitoring rollup over
# the ``dedup_exact`` signal.  The fixture has no exact duplicates
# (500 distinct md5s), so 5 clone rows are planted (doc_id ≤ 5
# re-appended) on both sides; their sources carry the non-zero rates.


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_unique, dup_rate)."""
    base = _docs(spark, sf_dir).select("doc_id", "source", "text")
    d = base.select("source", "text").unionByName(
        base.where(F.col("doc_id") <= 5).select("source", "text")
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.round(
            F.lit(1.0)
            - F.countDistinct(F.md5("text")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


_DUP_RATE_SQL = """
WITH d AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id <= 5)
SELECT source, count(*)::BIGINT AS n_docs,
       count(DISTINCT md5(text))::BIGINT AS n_unique,
       round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM d GROUP BY source
"""


CORPUS_EXTRA_QUERIES = {
    "curriculum_schedule": (curriculum_schedule, _curriculum_sql()),
    "perplexity_buckets": (perplexity_buckets, _perplexity_sql()),
    "repeated_ngram_spans": (repeated_ngram_spans, _spans_sql()),
    "mad_outlier_docs": (mad_outlier_docs, _MAD_SQL),
    "dedup_rate_by_source": (dedup_rate_by_source, _DUP_RATE_SQL),
}
