"""Events-table source.

The driver's ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
([PARQUET_TYPE_ILLEGAL]).  With ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as BIGINT nanoseconds; this loader converts it to a
proper timestamp via integer division (``div`` — ns values ≈ 1.7e18
exceed double's 53-bit mantissa, so a float round-trip would corrupt
microseconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = ev.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Spark 4.1+ reads TIMESTAMP(NANOS) as TIMESTAMP_NTZ (micros,
        # truncated) and ignores nanosAsLong.  Normalize to TIMESTAMP so
        # unix_micros/window/watermark code downstream is type-stable;
        # session tz is pinned to UTC, so the wall-clock value is
        # preserved and epoch math matches the DuckDB oracle.
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev
