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
    """HLL++ estimate must be within 3×rsd(=2%) of the exact count."""
    approx = {r["l_returnflag"]: r["n_parts_approx"] for r in approx_distinct_parts(spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: r["n_parts"] for r in distinct_agg_parts_per_flag(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for flag, n in exact.items():
        assert abs(approx[flag] - n) <= max(3, 0.06 * n), (flag, approx[flag], n)


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
