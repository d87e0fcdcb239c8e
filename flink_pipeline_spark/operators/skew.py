"""Skew mitigation: salted two-stage aggregation.

At 100 TB a hot key (one sample with half the reads, one event_type
with half the stream) turns a groupBy into a single straggler task.
Salting splits each key into ``salt_buckets`` sub-keys for the first
(partial) aggregation, then a second, tiny aggregation merges the
partials — the same technique the reference got implicitly by having
many files per sample. AQE's skew-join handling covers JOINS
automatically; salting covers AGGREGATIONS with decomposable
aggregates (sum/count/min/max).

The salt must be DETERMINISTIC per row (not rand()) for replayable
results: here it hashes a secondary column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    salt_from: str,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation of ``aggs`` (out_col -> (fn, in_col), fn in
    sum/count/min/max) grouped by ``key``, salted on hash(salt_from)."""
    MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in FIRST:
            raise ValueError(f"{fn!r} is not decomposable; use plain groupBy")

    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            *[
                FIRST[fn](F.col(in_col)).alias(out)
                for out, (fn, in_col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(key).agg(
        *[MERGE[fn](F.col(out)).alias(out) for out, (fn, in_col) in aggs.items()]
    )
