"""Physical-plan inspection helpers.

The engine's scale guarantees (filters reach the scan, dims broadcast,
one shuffle per aggregation, zero-shuffle assignment) are pinned by
plan-regression tests; this module is the one parser they share.

``explain("formatted")`` prints every node twice — once in the tree
sketch, once in the detail list headed ``(N) Op`` — so node counting
must match the detail header, not a raw substring (a substring count
double-counts every node).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, op: str) -> int:
    """Count physical nodes by their detail header ``(N) Op``."""
    return len(re.findall(rf"\(\d+\) {op}\b", plan))


def pushed_filters(plan: str) -> list[str]:
    """Every ``PushedFilters: [...]`` list in the plan, one string per scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
