"""Round-6 relational & time-series additions (beyond-reference —
SURVEY.md §2.9): TPC-H Q11 shape, gaps-and-islands streaks, window
distribution functions, autocorrelation, classical seasonal
decomposition, Theil-Sen robust trend, multi-touch attribution, a
zone-map pruning audit, and Apriori-style frequent triples.

Cross-engine determinism conventions (same as operators/analytics.py):
- counts/sums stay in exact integer/decimal space as long as possible;
- every surviving double is produced by ONE division (or an identical
  literal expression tree) of exact operands, then stabilized with the
  engine-identical floor(x*1e6 + 0.5)/1e6 form (round(x, 6) breaks
  ties differently across engines on exact 6dp halves);
- orderings used by window functions are total (tie-broken by keys).

Scale notes per query are in the docstrings; none of these plans joins
two corpus-sized relations on a non-key, and every group-by reduces to
day/user/part-level cardinality before any wide output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k_means_hadoop_spark.operators.relational import _dec, _t

# engine-identical 6dp stabilization (see module docstring)
_FL6_SQL = "floor(({x}) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE)"


def _fl6(c: F.Column) -> F.Column:
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# --------------------------------------------- TPC-H Q11 shape
#
# "Important parts": per-part revenue vs a threshold derived from a
# scalar subquery over the whole relation (Q11's HAVING-share shape;
# the driver schema has no partsupp, so revenue stands in for stock
# value).  The threshold is scale-free — share > 1.5x the mean share
# (the fixture's revenue-per-part spread tops out ~1.9x, so 1.5x
# selects a stable ~1% tail at every sf).  The comparison stays in
# exact decimal space (value * n_parts * 2 > total * 3); only the
# reported share is a double.


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, part_value, share_bp) for parts whose revenue share
    exceeds 1.5x the mean share.  One corpus pass (partial-agg to
    part grain), a broadcast of the one-row total, and an exact
    decimal filter — Q11's plan shape without a second scan."""
    li = _t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - _dec("l_discount")
    )
    val = li.groupBy("l_partkey").agg(F.sum(rev).alias("value"))
    tot = val.agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    share = (
        F.col("value").cast("double")
        * F.lit(10000.0)
        / F.col("total").cast("double")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value") * F.col("n_parts") * F.lit(2)
            > F.col("total") * F.lit(3)
        )
        .select(
            "l_partkey",
            F.col("value").cast("double").alias("part_value"),
            _fl6(share).alias("share_bp"),
        )
    )


Q11_SQL = """
WITH val AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS value
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(value) AS total, count(*)::BIGINT AS n_parts FROM val)
SELECT l_partkey,
       CAST(value AS DOUBLE) AS part_value,
       {share} AS share_bp
FROM val CROSS JOIN tot
WHERE value * n_parts * 2 > total * 3
""".format(
    share=_FL6_SQL.format(
        x="CAST(value AS DOUBLE) * CAST(10000 AS DOUBLE) / CAST(total AS DOUBLE)"
    )
)


# --------------------------------------------- gaps and islands


def streaks_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, longest_streak, active_days, n_streaks) — longest run
    of consecutive active days per user, the classic gaps-and-islands
    plan: island key = day - row_number() is constant within a run.
    Shuffles: one distinct, one user-partitioned window, two user-grain
    aggs — all on the user key, so a 1000-executor run co-partitions
    every stage after the first exchange."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = daily.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    st = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return st.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


STREAKS_SQL = """
WITH daily AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
isl AS (SELECT user_id, day,
        day - (row_number() OVER (PARTITION BY user_id ORDER BY day))::INT AS island
        FROM daily),
st AS (SELECT user_id, island, count(*)::BIGINT AS len FROM isl GROUP BY 1, 2)
SELECT user_id, max(len)::BIGINT AS longest_streak,
       sum(len)::BIGINT AS active_days, count(*)::BIGINT AS n_streaks
FROM st GROUP BY 1
"""


# --------------------------------------------- window distribution fns


def window_percentiles_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, c_nationkey, pct_rank, cume, decile) — percent_rank /
    cume_dist / ntile over a TOTAL order (acctbal tie-broken by key),
    so both ratios are exact rationals (rn-1)/(n-1) and rn/n; the 6dp
    floor-stabilization guards the reachable 6dp-half ties (n-1 can
    carry a 2^7 factor).  Single nation-partitioned window — no global
    sort."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        _fl6(F.percent_rank().over(w)).alias("pct_rank"),
        _fl6(F.cume_dist().over(w)).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


WINDOW_PCT_SQL = """
SELECT c_custkey, c_nationkey,
       {pr} AS pct_rank,
       {cd} AS cume,
       (ntile(10) OVER w)::INT AS decile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""".format(
    pr=_FL6_SQL.format(x="percent_rank() OVER w"),
    cd=_FL6_SQL.format(x="cume_dist() OVER w"),
)


# --------------------------------------------- autocorrelation
#
# ACF of the daily event-count series at lags 1..7, computed entirely
# in exact integer space: with N = days, T = Σx, Q = Σx², and per-lag
# pair sums (sxy, s1, s2, n_pairs), the standard estimator
#   r_L = Σ(x_t-μ)(x_{t-L}-μ) / Σ(x_t-μ)²
# multiplies through by N² to
#   num = N²·sxy - T·N·(s1+s2) + n_pairs·T²
#   den = N²·Q - N·T²
# — exact DECIMAL(38,0) on both engines; ONE double division survives.

_ACF_MAX_LAG = 7


def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag, n_pairs, acf) for lags 1..7 over the daily event-count
    series.  The series is day-grain (tiny — one partial agg over the
    corpus); the lag join and the final agg are day-sized, so corpus
    scale only affects the first aggregation.

    Round 13 (verdict item 4, shrinking the global-window allowlist):
    the lag pairing joins on CALENDAR arithmetic —
    ``date_sub(a.day, lag) == b.day`` — instead of a row index from an
    unpartitioned ``row_number`` window, so no all-to-one sort exists
    anywhere in the plan.  On a gapless series the two forms are
    row-identical (rn(a) − rn(b) == lag ⟺ datediff(a.day, b.day) ==
    lag), and the events fixture is gapless at every shipped SF
    (pinned by tests/test_advice_fixes_r7.py::
    test_events_daily_series_gapless).  The DuckDB oracle keeps the rn
    form — equal under the same pin.  For sparse sources the calendar
    form is also the semantically correct one (the r6-ADVICE caveat
    about gaps aliasing as lag-1 neighbors disappears)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    g = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("t"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    a = daily.select(F.col("day"), F.col("x").alias("xt")).withColumn(
        "lag", F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG)))
    )
    b = daily.select(F.col("day").alias("dayb"), F.col("x").alias("xl"))
    pairs = a.join(b, F.date_sub(a.day, a.lag) == b.dayb)
    per = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("xt") * F.col("xl")).alias("sxy"),
        F.sum("xt").alias("s1"),
        F.sum("xl").alias("s2"),
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    j = per.crossJoin(F.broadcast(g))
    num = (
        d38(F.col("n")) * d38(F.col("n")) * d38(F.col("sxy"))
        - d38(F.col("t")) * d38(F.col("n")) * (d38(F.col("s1")) + d38(F.col("s2")))
        + d38(F.col("n_pairs")) * d38(F.col("t")) * d38(F.col("t"))
    )
    den = d38(F.col("n")) * d38(F.col("n")) * d38(F.col("q")) - d38(
        F.col("n")
    ) * d38(F.col("t")) * d38(F.col("t"))
    return j.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        _fl6(num.cast("double") / den.cast("double")).alias("acf"),
    )


ACF_SQL = """
WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY 1),
d AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily),
g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS t, sum(x * x)::BIGINT AS q FROM d),
pairs AS (SELECT l.lag, a.x AS xt, b.x AS xl
          FROM d a CROSS JOIN generate_series(1, {maxlag}) l(lag)
          JOIN d b ON b.rn = a.rn - l.lag),
per AS (SELECT lag, count(*)::BIGINT AS n_pairs, sum(xt * xl)::BIGINT AS sxy,
               sum(xt)::BIGINT AS s1, sum(xl)::BIGINT AS s2
        FROM pairs GROUP BY 1)
SELECT lag::INT AS lag, n_pairs,
       {acf} AS acf
FROM per CROSS JOIN g
""".format(
    maxlag=_ACF_MAX_LAG,
    acf=_FL6_SQL.format(
        x="CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))"
        " - CAST(t AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * (CAST(s1 AS DECIMAL(38,0)) + CAST(s2 AS DECIMAL(38,0)))"
        " + CAST(n_pairs AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) AS DOUBLE)"
        " / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))"
        " - CAST(n AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) AS DOUBLE)"
    ),
)


# --------------------------------------------- seasonal decomposition
#
# Classical additive decomposition of the daily purchase-count series:
# trend = centered 7-day moving average (only where the window holds 7
# CONSECUTIVE days), seasonal = per-day-of-week mean of the detrended
# series, residual = the rest.  All three are single divisions of
# exact integers: detrended*7 = 7x - sum7 is an integer, so
#   trend    = sum7 / 7
#   seasonal = S_dow / (7*K_dow)
#   residual = (K_dow*(7x - sum7) - S_dow) / (7*K_dow).
# Day-of-week is the portable (day - DATE '2024-01-01') % 7 — Spark's
# dayofweek() and DuckDB's dayofweek() disagree on week start.


def seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, x, dow, trend, seasonal, residual) for days with a full
    centered 7-day window.  Day-grain throughout after one corpus
    partial-agg; the single unpartitioned window runs over ~365 rows
    per year of data — never corpus-sized."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "x",
        F.count(F.lit(1)).over(w7).alias("cnt7"),
        F.sum("x").over(w7).alias("sum7"),
        F.min("day").over(w7).alias("d0"),
        F.max("day").over(w7).alias("d1"),
    )
    valid = t.filter(
        (F.col("cnt7") == 7) & (F.datediff(F.col("d1"), F.col("d0")) == 6)
    ).withColumn(
        "dow",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) % 7,
    )
    det = valid.withColumn("det7", F.lit(7) * F.col("x") - F.col("sum7"))
    s = det.groupBy("dow").agg(
        F.sum("det7").alias("sdow"), F.count(F.lit(1)).alias("kdow")
    )
    den = (F.lit(7) * F.col("kdow")).cast("double")
    res_num = (
        F.col("kdow") * (F.lit(7) * F.col("x") - F.col("sum7")) - F.col("sdow")
    ).cast("double")
    return det.join(F.broadcast(s), "dow").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("bigint").alias("x"),
        F.col("dow").cast("int").alias("dow"),
        _fl6(F.col("sum7").cast("double") / F.lit(7.0)).alias("trend"),
        _fl6(F.col("sdow").cast("double") / den).alias("seasonal"),
        _fl6(res_num / den).alias("residual"),
    )


SEASONAL_SQL = """
WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
t AS (SELECT day, x,
        count(*) OVER w7 AS cnt7, sum(x) OVER w7 AS sum7,
        min(day) OVER w7 AS d0, max(day) OVER w7 AS d1
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
valid AS (SELECT day, x, sum7, (day - DATE '2024-01-01') % 7 AS dow
          FROM t WHERE cnt7 = 7 AND d1 - d0 = 6),
det AS (SELECT *, 7 * x - sum7 AS det7 FROM valid),
s AS (SELECT dow, sum(det7)::BIGINT AS sdow, count(*)::BIGINT AS kdow
      FROM det GROUP BY 1)
SELECT strftime(det.day, '%Y-%m-%d') AS day, det.x::BIGINT AS x, det.dow::INT AS dow,
       {trend} AS trend,
       {seasonal} AS seasonal,
       {residual} AS residual
FROM det JOIN s ON s.dow = det.dow
""".format(
    trend=_FL6_SQL.format(x="CAST(sum7 AS DOUBLE) / CAST(7 AS DOUBLE)"),
    seasonal=_FL6_SQL.format(
        x="CAST(sdow AS DOUBLE) / CAST(7 * kdow AS DOUBLE)"
    ),
    residual=_FL6_SQL.format(
        x="CAST(kdow * (7 * det.x - sum7) - sdow AS DOUBLE) / CAST(7 * kdow AS DOUBLE)"
    ),
)


# --------------------------------------------- Theil-Sen robust trend
#
# Median of all pairwise slopes of the daily event-count series — the
# breakdown-point-0.29 alternative to OLS (Theil 1950 / Sen 1968).
# Slopes are single divisions of exact integers; the median is
# positional over the total order (slope, i, j), so both engines pick
# the identical middle elements.  The day series is tiny (k days →
# k(k-1)/2 pairs at day grain), so the quadratic pair join is on the
# REDUCED series, never the corpus.


def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_days, n_pairs, theil_sen_slope, ols_slope): robust
    vs least-squares slope of daily event counts (events/day per day
    of series index)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    d = daily.withColumn("i", F.row_number().over(Window.orderBy("day")))
    a = d.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = d.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    slopes = (
        a.join(b, F.col("ib") > F.col("ia"))
        .select(
            "ia",
            "ib",
            (
                (F.col("xb") - F.col("xa")).cast("double")
                / (F.col("ib") - F.col("ia")).cast("double")
            ).alias("slope"),
        )
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("slope", "ia", "ib"))
        )
    )
    m = slopes.agg(F.count(F.lit(1)).alias("m"))
    med = (
        slopes.crossJoin(F.broadcast(m))
        .filter(
            (F.col("rn") == F.expr("(m + 1) DIV 2"))
            | (F.col("rn") == F.expr("(m + 2) DIV 2"))
        )
        .agg(F.avg("slope").alias("ts_slope"))
    )
    g = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").alias("si"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("i")).alias("sii"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    ols = (
        (F.col("n") * F.col("six") - F.col("si") * F.col("sx")).cast("double")
        / (F.col("n") * F.col("sii") - F.col("si") * F.col("si")).cast("double")
    )
    return (
        g.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(med))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("m").cast("bigint").alias("n_pairs"),
            _fl6(F.col("ts_slope")).alias("theil_sen_slope"),
            _fl6(ols).alias("ols_slope"),
        )
    )


THEIL_SEN_SQL = """
WITH daily AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x FROM events GROUP BY 1),
d AS (SELECT x, row_number() OVER (ORDER BY day) AS i FROM daily),
slopes AS (SELECT a.i AS ia, b.i AS ib,
                  CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
           FROM d a JOIN d b ON b.i > a.i),
r AS (SELECT slope, row_number() OVER (ORDER BY slope, ia, ib) AS rn FROM slopes),
m AS (SELECT count(*)::BIGINT AS m FROM slopes),
med AS (SELECT avg(slope) AS ts_slope FROM r CROSS JOIN m
        WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2),
g AS (SELECT count(*)::BIGINT AS n, sum(i)::BIGINT AS si, sum(x)::BIGINT AS sx,
             sum(i * i)::BIGINT AS sii, sum(i * x)::BIGINT AS six
      FROM d)
SELECT n AS n_days, m AS n_pairs,
       {ts} AS theil_sen_slope,
       {ols} AS ols_slope
FROM g CROSS JOIN m CROSS JOIN med
""".format(
    ts=_FL6_SQL.format(x="ts_slope"),
    ols=_FL6_SQL.format(
        x="CAST(n * six - si * sx AS DOUBLE) / CAST(n * sii - si * si AS DOUBLE)"
    ),
)


# --------------------------------------------- multi-touch attribution

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, in microseconds


def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(model, touch, revenue, n_purchases) — purchase revenue credited
    under two attribution models: 'first_touch' (the session's opening
    event type) and 'last_touch' (the event immediately preceding the
    purchase; 'direct' if the purchase opens its session).  Sessions =
    30-min inactivity gaps per user (same semantics as
    sessionize_by_gap).  Revenue stays DECIMAL until the final cast.
    Everything after the one user-partitioned window is touch-grain."""
    ev = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).withColumn("us", F.unix_micros("ts"))
    s = s.withColumn("prev_us", F.lag("us").over(wu)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = s.withColumn(
        "sess",
        F.sum("new_sess").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    s = s.withColumn("first_et", F.first("event_type").over(ws)).withColumn(
        "prev_et", F.lag("event_type").over(ws)
    )
    pur = s.filter(F.col("event_type") == "purchase")
    first = pur.groupBy(F.col("first_et").alias("touch")).agg(
        F.sum(_dec("value")).alias("rev"), F.count(F.lit(1)).alias("np")
    ).select(F.lit("first_touch").alias("model"), "touch", "rev", "np")
    last = pur.groupBy(
        F.coalesce(F.col("prev_et"), F.lit("direct")).alias("touch")
    ).agg(
        F.sum(_dec("value")).alias("rev"), F.count(F.lit(1)).alias("np")
    ).select(F.lit("last_touch").alias("model"), "touch", "rev", "np")
    return first.unionByName(last).select(
        "model",
        "touch",
        F.col("rev").cast("double").alias("revenue"),
        F.col("np").cast("bigint").alias("n_purchases"),
    )


ATTRIBUTION_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type, value,
         epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER wu AS prev_us
  FROM events
  WINDOW wu AS (PARTITION BY user_id ORDER BY ts, event_id)),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {gap}
                 THEN 1 ELSE 0 END AS new_sess
  FROM s),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged),
touched AS (
  SELECT *, first_value(event_type) OVER ws AS first_et,
         lag(event_type) OVER ws AS prev_et
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id)),
pur AS (SELECT * FROM touched WHERE event_type = 'purchase')
SELECT 'first_touch' AS model, first_et AS touch,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_purchases
FROM pur GROUP BY 1, 2
UNION ALL
SELECT 'last_touch' AS model, coalesce(prev_et, 'direct') AS touch,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n_purchases
FROM pur GROUP BY 1, 2
""".format(gap=_SESSION_GAP_US)


# --------------------------------------------- zone-map pruning audit
#
# Models the file-skipping win of a sort-ordered layout: the same
# lineitem rows are assigned to 64 "files" two ways — hash layout
# (l_orderkey % 64, the default write pattern) and sort layout
# (ntile(64) over l_shipdate) — then per-file min/max zone maps are
# checked against a 6-month shipdate predicate.  At 100 TB this is the
# difference between scanning every file and scanning ~1/12 of them;
# the audit quantifies it from the data itself.  (A production audit
# reads parquet footer stats; the ntile here MODELS the sorted layout
# so the query stays self-contained.)

_ZM_FILES = 64
_ZM_LO = "1997-01-01"
_ZM_HI = "1997-07-01"


def zonemap_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(layout, n_files, files_pruned, rows_total, rows_scanned,
    rows_matched) for hash vs shipdate-sorted layouts under the
    predicate l_shipdate in [{lo}, {hi})."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    lo = F.lit(_ZM_LO).cast("timestamp")
    hi = F.lit(_ZM_HI).cast("timestamp")
    hashed = li.select(
        F.lit("hash").alias("layout"),
        (F.col("l_orderkey") % _ZM_FILES).alias("file_id"),
        "l_shipdate",
    )
    # the sorted-layout file assignment is a GLOBAL ntile over the raw
    # fact table — the one place this query must totally order lineitem.
    # A window ntile would collapse every row into ONE task; the
    # range-partitioned prefix count + closed-form ntile (the
    # rfm_segments treatment, round-9) keeps the sort parallel.
    from k_means_hadoop_spark.partitioning import (
        ntile_expr,
        prefix_sum_literal_bounds,
        scan_parts,
    )

    # fact-grain input: size the range shuffle from the scan's split
    # count (grows with the data; floors at the measured-best 8
    # locally) so no slice outgrows an executor.  This is the ONE
    # promoted call site of the recompute-safe literal-bounds variant
    # (round-10 verdict item 6): fact-grain input is exactly where
    # prefix_sum's localCheckpoint storage cost and fault-tolerance
    # caveat bind, the measured cost is a local tie (see
    # partitioning.py), and the result is boundary-invariant — pinned
    # hash-identical at all three SFs.
    ranked = prefix_sum_literal_bounds(
        li.withColumn("_one", F.lit(1)),
        "_one",
        [("l_shipdate", True), ("l_orderkey", True), ("l_linenumber", True)],
        out_col="_rn",
        num_parts=scan_parts(li),
    )
    n_df = ranked.agg(F.count(F.lit(1)).alias("_n"))
    sorted_ = ranked.crossJoin(F.broadcast(n_df)).select(
        F.lit("sorted").alias("layout"),
        (F.expr(ntile_expr("_rn", "_n", _ZM_FILES)) - 1)
        .cast("bigint")
        .alias("file_id"),
        "l_shipdate",
    )
    match = F.when((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi), 1).otherwise(0)
    zones = (
        hashed.unionByName(sorted_)
        .groupBy("layout", "file_id")
        .agg(
            F.min("l_shipdate").alias("zmin"),
            F.max("l_shipdate").alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(match).alias("n_match"),
        )
    )
    pruned = (F.col("zmax") < lo) | (F.col("zmin") >= hi)
    return zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(pruned.cast("int")).cast("bigint").alias("files_pruned"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(~pruned, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("n_match").cast("bigint").alias("rows_matched"),
    )


zonemap_prune_audit.__doc__ = zonemap_prune_audit.__doc__.format(
    lo=_ZM_LO, hi=_ZM_HI
)

ZONEMAP_SQL = """
WITH li AS (SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem),
assigned AS (
  SELECT 'hash' AS layout, l_orderkey % {nf} AS file_id, l_shipdate FROM li
  UNION ALL
  SELECT 'sorted' AS layout,
         (ntile({nf}) OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) - 1)::BIGINT,
         l_shipdate
  FROM li),
zones AS (
  SELECT layout, file_id, min(l_shipdate) AS zmin, max(l_shipdate) AS zmax,
         count(*)::BIGINT AS n_rows,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '{lo}'
                   AND l_shipdate < TIMESTAMP '{hi}' THEN 1 ELSE 0 END)::BIGINT AS n_match
  FROM assigned GROUP BY 1, 2)
SELECT layout, count(*)::BIGINT AS n_files,
       sum(CASE WHEN zmax < TIMESTAMP '{lo}' OR zmin >= TIMESTAMP '{hi}'
                THEN 1 ELSE 0 END)::BIGINT AS files_pruned,
       sum(n_rows)::BIGINT AS rows_total,
       sum(CASE WHEN zmax < TIMESTAMP '{lo}' OR zmin >= TIMESTAMP '{hi}'
                THEN 0 ELSE n_rows END)::BIGINT AS rows_scanned,
       sum(n_match)::BIGINT AS rows_matched
FROM zones GROUP BY 1
""".format(nf=_ZM_FILES, lo=_ZM_LO, hi=_ZM_HI)


# --------------------------------------------- frequent triples

_TRIPLES_TOP_K = 20


def market_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p1, p2, p3, support) — top-{k} most frequent part TRIPLES
    co-occurring in an order (the 3-itemset step of Apriori;
    market_basket_pairs is the 2-itemset step).  Per-order expansion
    is O(Σ C(basket,3)); TPC-H baskets are ≤7 lines, so the explode is
    linear in orders — no threshold tuning needed because the output
    is a deterministic top-k, not a support cut."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    i1 = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    i2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2"))
    i3 = li.select(F.col("l_orderkey").alias("o3"), F.col("l_partkey").alias("p3"))
    triples = (
        i1.join(i2, (F.col("o") == F.col("o2")) & (F.col("p1") < F.col("p2")))
        .join(i3, (F.col("o") == F.col("o3")) & (F.col("p2") < F.col("p3")))
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    w = Window.orderBy(
        F.col("support").desc(), F.col("p1"), F.col("p2"), F.col("p3")
    )
    return (
        triples.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TRIPLES_TOP_K)
        .drop("rn")
    )


market_basket_triples.__doc__ = market_basket_triples.__doc__.format(
    k=_TRIPLES_TOP_K
)

TRIPLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
triples AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
         count(*)::BIGINT AS support
  FROM li a
  JOIN li b ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
  JOIN li c ON c.l_orderkey = a.l_orderkey AND c.l_partkey > b.l_partkey
  GROUP BY 1, 2, 3)
SELECT p1, p2, p3, support FROM triples
ORDER BY support DESC, p1, p2, p3
LIMIT {k}
""".format(k=_TRIPLES_TOP_K)


# --------------------------------------------- Hilbert curve locality
#
# The Hilbert space-filling curve as the layout alternative to Z-order
# (zorder_events_curve): same multi-dimensional file-skipping idea, but
# consecutive keys are always grid-adjacent, so range scans touch
# fewer, tighter rectangles.  xy2d is the standard mask-descent
# algorithm (rx/ry quadrant bits, d += s²·((3rx)⊕ry), reflect+swap
# rotation) — pure integer arithmetic, unrolled over 8 bit levels as a
# column chain, bit-identical in DuckDB by construction.  The query
# PROVES the locality claim on data: total Manhattan jump between
# key-consecutive points, Hilbert vs Z-order (Hilbert's every step on
# a dense grid is distance 1; Z-order takes 2^k-sized jumps at
# quadrant seams).

_HILBERT_BITS = 8
_HILBERT_N = 1 << _HILBERT_BITS


def _hilbert_steps() -> list[tuple[int, dict[str, str]]]:
    """Per-level expression templates over state columns (hx, hy, hd)
    — the SAME text drives Spark (withColumn chain) and DuckDB
    (chained CTEs); all-integer math, so parity is exact."""
    steps = []
    s = _HILBERT_N // 2
    while s > 0:
        steps.append(
            (
                s,
                {
                    "rx": f"CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END",
                    "ry": f"CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END",
                    # (3·rx) XOR ry == 3rx + ry - 2·rx·ry for bits
                    "nd": f"hd + {s * s} * (3 * rx + ry - 2 * rx * ry)",
                    "nx": (
                        "CASE WHEN ry = 0 THEN (CASE WHEN rx = 1"
                        f" THEN {_HILBERT_N - 1} - hy ELSE hy END)"
                        " ELSE hx END"
                    ),
                    "ny": (
                        "CASE WHEN ry = 0 THEN (CASE WHEN rx = 1"
                        f" THEN {_HILBERT_N - 1} - hx ELSE hx END)"
                        " ELSE hy END"
                    ),
                },
            )
        )
        s //= 2
    return steps


def _hilbert_key(df: DataFrame) -> DataFrame:
    """Append hkey computed from int columns x, y in [0, 256)."""
    d = df.withColumn("hx", F.col("x")).withColumn("hy", F.col("y")).withColumn(
        "hd", F.lit(0).cast("bigint")
    )
    for _s, ex in _hilbert_steps():
        d = (
            d.withColumn("rx", F.expr(ex["rx"]))
            .withColumn("ry", F.expr(ex["ry"]))
            .withColumn("hd", F.expr(ex["nd"]))
            .withColumn("nx", F.expr(ex["nx"]))
            .withColumn("ny", F.expr(ex["ny"]))
            .drop("hx", "hy")
            .withColumnRenamed("nx", "hx")
            .withColumnRenamed("ny", "hy")
            .drop("rx", "ry")
        )
    return d.withColumnRenamed("hd", "hkey").drop("hx", "hy")


def hilbert_vs_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(curve, n_points, total_jump, max_jump, avg_jump) — Manhattan
    distance between key-consecutive points for the Hilbert vs Z-order
    layouts of the distinct (part mod 256, order mod 256) point set.
    The curve keys are a pure per-row map; the comparison is one lag
    window per curve over the (bounded, <= 65536-row) distinct point
    set."""
    from k_means_hadoop_spark.functions.zorder import interleave_bits

    li = _t(spark, sf_dir, "lineitem")
    pts = (
        li.select(
            (F.col("l_partkey") % _HILBERT_N).cast("int").alias("x"),
            (F.col("l_orderkey") % _HILBERT_N).cast("int").alias("y"),
        )
        .distinct()
    )
    h = _hilbert_key(pts).select("x", "y", F.col("hkey").alias("key"))
    z = pts.select(
        "x",
        "y",
        interleave_bits(F.col("x"), F.col("y"), _HILBERT_BITS).alias("key"),
    )

    def jumps(df: DataFrame, name: str) -> DataFrame:
        w = Window.orderBy("key")
        j = df.select(
            (
                F.abs(F.col("x") - F.lag("x").over(w))
                + F.abs(F.col("y") - F.lag("y").over(w))
            ).alias("jump")
        ).filter(F.col("jump").isNotNull())
        return j.agg(
            F.lit(name).alias("curve"),
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_points"),
            F.sum("jump").cast("bigint").alias("total_jump"),
            F.max("jump").cast("bigint").alias("max_jump"),
            _fl6(
                F.sum("jump").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_jump"),
        )

    return jumps(h, "hilbert").unionByName(jumps(z, "zorder"))


def _hilbert_sql() -> str:
    from k_means_hadoop_spark.functions.zorder import interleave_bits_sql

    ctes = [
        """pts AS (SELECT DISTINCT (l_partkey % {n})::INT AS x,
                       (l_orderkey % {n})::INT AS y
        FROM lineitem),
l0 AS (SELECT x, y, x AS hx, y AS hy, 0::BIGINT AS hd FROM pts)""".format(
            n=_HILBERT_N
        )
    ]
    prev = "l0"
    for i, (_s, ex) in enumerate(_hilbert_steps(), start=1):
        ctes.append(
            f"""r{i} AS (SELECT *, {ex['rx']} AS rx, {ex['ry']} AS ry FROM {prev}),
l{i} AS (SELECT x, y, {ex['nx']} AS hx, {ex['ny']} AS hy, {ex['nd']} AS hd FROM r{i})"""
        )
        prev = f"l{i}"
    z = interleave_bits_sql("x", "y", _HILBERT_BITS)
    jumps = """
j_{tag} AS (SELECT abs(x - lag(x) OVER (ORDER BY key))
                   + abs(y - lag(y) OVER (ORDER BY key)) AS jump
            FROM k_{tag}),
a_{tag} AS (SELECT '{tag}' AS curve,
              (count(*) + 1)::BIGINT AS n_points,
              sum(jump)::BIGINT AS total_jump,
              max(jump)::BIGINT AS max_jump,
              {avg} AS avg_jump
            FROM j_{tag} WHERE jump IS NOT NULL)"""
    avg = _FL6_SQL.format(
        x="CAST(sum(jump) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f""",
k_hilbert AS (SELECT x, y, hd AS key FROM {prev}),
k_zorder AS (SELECT x, y, {z} AS key FROM pts),"""
        + jumps.format(tag="hilbert", avg=avg)
        + ","
        + jumps.format(tag="zorder", avg=avg)
        + """
SELECT * FROM a_hilbert UNION ALL SELECT * FROM a_zorder"""
    )


TRENDS_QUERIES = {
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "streaks_active_users": (streaks_active_users, STREAKS_SQL),
    "window_percentiles_customers": (
        window_percentiles_customers,
        WINDOW_PCT_SQL,
    ),
    "acf_daily_events": (acf_daily_events, ACF_SQL),
    "seasonal_decompose_weekly": (seasonal_decompose_weekly, SEASONAL_SQL),
    "theil_sen_daily_trend": (theil_sen_daily_trend, THEIL_SEN_SQL),
    "attribution_first_last": (attribution_first_last, ATTRIBUTION_SQL),
    "zonemap_prune_audit": (zonemap_prune_audit, ZONEMAP_SQL),
    "market_basket_triples": (market_basket_triples, TRIPLES_SQL),
    "hilbert_vs_zorder_locality": (
        hilbert_vs_zorder_locality,
        _hilbert_sql(),
    ),
}
