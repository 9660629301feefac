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
