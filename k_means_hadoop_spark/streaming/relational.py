"""Streaming relational operators (beyond-reference; the reference is
batch-only — SURVEY.md §2.9): stateful key dedup and stream-static
dimension enrichment.

Both are the production shapes a training-data ingest pipeline runs
continuously: dedup-on-arrival and join-to-dims-on-arrival.  Both are
drained with ``availableNow`` in tests so a batch SQL oracle checks them
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_keys(events: DataFrame, keys: list[str]) -> DataFrame:
    """First-seen streaming deduplication on ``keys``.

    Emits each distinct key combination once (append mode).  Projecting
    to the keys BEFORE ``dropDuplicates`` keeps the state store entries
    key-sized — never whole events.

    State is O(distinct keys) and unbounded here, which is correct for
    the drain-a-table tests; a forever-running stream at 100 TB/day
    should bound it with ``withWatermark(ts, ...)`` +
    ``dropDuplicatesWithinWatermark`` (same plan, state evicted past the
    watermark).
    """
    return events.select(*keys).dropDuplicates(keys)


def enrich_events_with_customer(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static equi-join: each arriving event picks up its
    customer's nation and segment.

    The static side is broadcast per micro-batch (customers is a
    dimension); the stream side never shuffles — the join is stateless,
    so append mode emits each event exactly once.
    """
    dim = F.broadcast(
        customers.select("c_custkey", "c_nationkey", "c_mktsegment")
    )
    return events.join(dim, events.user_id == dim.c_custkey).select(
        "event_id", "user_id", "event_type", "value", "c_nationkey", "c_mktsegment"
    )


def join_view_click_streams(
    views: DataFrame, clicks: DataFrame, within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM interval join: each click pairs with the same
    user's view events from the preceding ``within`` interval — the
    online attribution join (which impression led to this click?).

    Both sides carry a watermark and the join condition bounds
    click_ts - view_ts, so Spark can size the join state: a buffered
    view is dropped once the watermark passes view_ts + within (state
    is O(rate × interval), NOT O(stream length)).  Inner join + append
    mode → each matched pair is emitted exactly once; drained with
    availableNow over a finite source this equals the batch interval
    join, which is what the oracle asserts.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        F.expr(
            f"""v_user = c_user
            AND click_ts >= view_ts
            AND click_ts <= view_ts + INTERVAL {within}"""
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )
