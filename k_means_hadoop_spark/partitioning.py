"""Partitioning helpers.

``fan_out`` fixes the small-file parallelism trap: a parquet file with a
single row-group arrives as ONE input split, so every downstream
explode/hash/aggregate runs single-threaded no matter how many cores the
cluster has.  At real scale (TB-range inputs, many files / row-groups)
the scan already yields >= parallelism splits and this is a no-op — the
repartition only fires when the scan is narrower than the cluster, so it
never introduces a full-corpus shuffle on a well-partitioned 100 TB
input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan's input parallelism is below
    the cluster's default parallelism (or ``min_parts``)."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def prefix_sum(
    df,
    value_col: str,
    order_cols: list,
    out_col: str = "cum",
    num_parts: int = 8,
):
    """Distributed inclusive prefix sum of ``value_col`` under the
    total order ``order_cols`` — the two-phase scan that replaces a
    global ``Window.orderBy`` (which collapses every row into ONE
    partition: the classic hidden scale-killer of cumulative queries).

    Phase 1: range-repartition by the order (each partition holds a
    contiguous key range), per-partition window cumsum.  Phase 2: the
    per-partition totals (num_parts rows) are collected into broadcast
    offsets added to each row.  Identical result to the single-window
    form for ANY total order; cost is one range shuffle + one tiny
    collect instead of an all-to-one sort.

    ``num_parts``: the RESULT is partition-count-invariant (exact
    integer/decimal math, offsets from an ordered driver-side fold),
    so the count affects execution shape only.  The default 8 is the
    measured sweet spot at test scale — round-9 measured BOTH
    alternatives worse at sf0.1 (defaultParallelism=32: +20-40% task
    overhead on gini/rfm/zonemap; AQE-sized ``repartitionByRange``
    with no count: the same or worse) — and at cluster scale a caller
    ranking truly fact-sized input should pass an explicit count
    sized to the cluster (8-way over 10^8 rows = 12.5M rows/task:
    heavy but parallel and spill-safe, vs the ONE task of the window
    form this helper replaces)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ordered = df.repartitionByRange(num_parts, *order_cols)
    # PIN the partition assignment: repartitionByRange samples its
    # bounds per evaluation, so computing the local cumsums and the
    # partition totals from two separate evaluations can see DIFFERENT
    # _pid assignments (observed as off-by-one phases at sf0.1).  The
    # checkpoint materializes one assignment both passes share.
    part = ordered.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_local", F.sum(value_col).over(w_in))
    # per-partition totals via SUM of the raw values (not max of the
    # cumsum — that identity needs non-negative values; sum is sign-safe)
    totals_df = part.groupBy("_pid").agg(F.sum(value_col).alias("_ptot"))
    sum_type = totals_df.schema["_ptot"].dataType
    totals = totals_df.orderBy("_pid").collect()
    # offsets must keep the SUM's type: int() here would silently
    # truncate fractional totals for float/decimal value columns
    import decimal

    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    if isinstance(sum_type, DecimalType):
        zero, conv = decimal.Decimal(0), decimal.Decimal
    elif isinstance(sum_type, (DoubleType, FloatType)):
        zero, conv = 0.0, float
    else:
        zero, conv = 0, int
    offsets = {}
    running = zero
    for r in totals:
        offsets[r["_pid"]] = running
        running += conv(r["_ptot"]) if r["_ptot"] is not None else zero
    off_df = df.sparkSession.createDataFrame(
        [(int(k), v) for k, v in offsets.items()],
        StructType(
            [
                StructField("_pid", IntegerType()),
                StructField("_off", sum_type if not isinstance(sum_type, IntegerType) else LongType()),
            ]
        ),
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


def ntile_expr(rn_col: str, n_col: str, k: int) -> str:
    """SQL expression reproducing ``ntile(k)`` bit-for-bit from a
    1-based global rank ``rn_col`` (e.g. a ``prefix_sum`` of ones) and
    the row count ``n_col`` — the scale-safe replacement for
    ``ntile(k).over(Window.orderBy(...))``, whose unpartitioned window
    collapses the input into ONE task.

    ntile semantics: with q = n DIV k and r = n % k, the first r tiles
    hold q+1 rows and the rest hold q, so

        tile = (rn + q) DIV (q + 1)              if rn <= r*(q+1)
             = r + (rn - r*(q+1) + q - 1) DIV q  otherwise

    The q = 0 division in the ELSE branch is unreachable: q = 0 forces
    r = n, so every rank takes the THEN branch."""
    q = f"({n_col} DIV {k})"
    r = f"({n_col} % {k})"
    return (
        f"CASE WHEN {rn_col} <= {r} * ({q} + 1)"
        f" THEN ({rn_col} + {q}) DIV ({q} + 1)"
        f" ELSE {r} + ({rn_col} - {r} * ({q} + 1) + {q} - 1) DIV {q} END"
    )
