"""Arbitrary stateful streaming via ``applyInPandasWithState`` —
the custom-stateful-operator seam (beyond-reference; the reference is
batch-only, SURVEY.md §2.9).

``stateful_user_totals`` keeps one running (count, sum) per user across
micro-batches: the minimal honest demonstration that per-key state
persists and accumulates through the state store — the same machinery a
custom sessionizer or online clusterer builds on.  State is (n, s) per
user — O(users), never O(events).

At 100 TB the shape holds: groupBy(user) shuffles each micro-batch once,
state lives partitioned in the state store (RocksDB in production),
Arrow batches cross the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def _update_user_totals(key, pdfs, state: GroupState):
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update semantics:
    one refreshed row per user per micro-batch it appears in)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
