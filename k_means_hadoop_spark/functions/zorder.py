"""Z-order (Morton) curve math as pure Catalyst expressions.

Z-ordering is the data-layout lever the reference never needed but a
100 TB lakehouse lives on: sort-within-partitions by the interleaved
bits of two (or more) filter columns and every written file covers a
tight hyper-rectangle of BOTH dimensions, so min/max footer stats prune
files for queries filtering on either column — multi-dimensional file
skipping from a one-dimensional sort key.

The interleave is integer bit arithmetic only (shift/and/multiply-
free-of-floats), so the identical value is computable in DuckDB —
the curve itself is oracle-checkable, and the write-side usage is
``df.sortWithinPartitions(zorder_key(...))`` (see sinks tests for the
range-clustered variant of the same stats-skipping argument).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interleave_bits(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton code of two ``bits``-wide non-negative ints: x occupies the
    even bit positions, y the odd ones.  Inputs must already be reduced
    to [0, 2^bits) — callers bucket/clamp first (that IS the z-order
    resolution choice)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("bigint")
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("bigint")
        z = z + xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
    return z


def interleave_bits_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """DuckDB SQL computing the same Morton code (pure BIGINT math)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")::BIGINT"
