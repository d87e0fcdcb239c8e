"""Stream-stream interval join (SURVEY.md J5, streaming face).

Each left event joins right events of the same key whose event time
falls in [left.ts - lookback, left.ts]. On streams both sides carry
watermarks and the time-bound condition lets Spark evict join state:
left rows older than the watermark plus lookback can never match
again. Without the bound, stream-stream join state grows forever —
the difference between a demo and a 100 TB operator.

The same function applied to batch frames is the spec the streaming
tests compare against (unified semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(left.event_id, key, left ts, right.event_id, right ts) pairs
    with right.ts in [left.ts - lookback, left.ts]."""

    def floored(df: DataFrame) -> DataFrame:
        return df.withColumn("ts", F.timestamp_seconds(F.unix_timestamp("ts")))

    l = floored(left)
    r = floored(right)
    if left.isStreaming:
        l = l.withWatermark("ts", watermark)
        r = r.withWatermark("ts", watermark)
    l = l.select(
        F.col("event_id").alias("l_id"), F.col(key), F.col("ts").alias("l_ts")
    )
    r = r.select(
        F.col("event_id").alias("r_id"), F.col(key).alias("r_key"), F.col("ts").alias("r_ts")
    )
    joined = l.join(
        r,
        (F.col(key) == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "inner",
    )
    return joined.select(
        "l_id",
        key,
        F.unix_timestamp("l_ts").cast("long").alias("l_ts_s"),
        "r_id",
        F.unix_timestamp("r_ts").cast("long").alias("r_ts_s"),
    )
