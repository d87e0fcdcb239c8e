"""Event-time windowing (SURVEY.md ST10): tumbling / sliding / session
windows with watermarks.

One transform serves batch and streaming: Structured Streaming's
incremental execution of ``groupBy(window(...))`` produces the same
result set as the batch plan over the same inputs (the unified-API
guarantee), which is exactly what makes these oracle-checkable — the
correctness driver runs the batch plan, the streaming tests assert
stream==batch.

All window math happens on second-floored timestamps: the fixtures
carry ns-precision event time (FIXTURES.md) and flooring first keeps
Spark (us precision) and DuckDB (ns) in the same buckets.

Scale notes: windowed aggregation state is bounded by the watermark —
late data beyond ``delay`` is dropped and state for closed windows is
evicted; without the watermark a 100 TB stream accretes state forever.
The reference's polling cadence (poll every 2 s, report every 8 s/60 s,
workflow.py:439,456-460) maps to trigger intervals, not window widths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import round_agg


def _floored_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Project event time to whole seconds (cross-engine determinism)."""
    return df.withColumn(ts_col, F.timestamp_seconds(F.unix_timestamp(F.col(ts_col))))


def _window_agg(grouped):
    return grouped.agg(
        F.count("*").alias("n"),
        round_agg(F.sum("value")).alias("total_value"),
    )


def tumbling_counts(
    df: DataFrame,
    width: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling windows keyed by event_type: (ws, event_type, n, total_value)."""
    df = _floored_ts(df, ts_col)
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = _window_agg(df.groupBy(F.window(ts_col, width), "event_type"))
    return out.select(
        F.unix_timestamp("window.start").cast("long").alias("ws"),
        "event_type",
        "n",
        "total_value",
    )


def sliding_counts(
    df: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    df = _floored_ts(df, ts_col)
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = _window_agg(df.groupBy(F.window(ts_col, width, slide)))
    return out.select(
        F.unix_timestamp("window.start").cast("long").alias("ws"),
        "n",
        "total_value",
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per user: a new session starts when the
    inter-event gap reaches ``gap`` (the sessionization the reference's
    job-polling loop approximates with wall-clock cadence)."""
    df = _floored_ts(df, ts_col)
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = _window_agg(df.groupBy(F.session_window(F.col(ts_col), gap), "user_id"))
    return out.select(
        F.unix_timestamp("session_window.start").cast("long").alias("session_start"),
        "user_id",
        "n",
        "total_value",
    )


def enriched_counts(df: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: join each event to a STATIC
    dimension snapshot (customer market segment keyed by user_id) and
    roll up per (segment, event_type). The streaming dimension-join
    pattern: Structured Streaming hash-joins every micro-batch against
    the broadcast dim — the unbounded side never shuffles for the join,
    and only the final rollup keeps state. Works identically on a batch
    frame, which is what the oracle checks; stream==batch is asserted
    in tests/test_streaming.py."""
    d = dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        df.select("user_id", "event_type", "value")
        .join(F.broadcast(d), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n"),
            round_agg(F.sum("value")).alias("total_value"),
        )
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Exact dedup on ``keys``, streaming-compatible (ST11). On a batch
    frame it is a plain distinct, which is what the oracle checks.

    On a stream WITH a watermark this is ``dropDuplicatesWithinWatermark``
    (Spark 3.5+): a key's dedup state is EVICTED once the watermark
    passes its event time + delay, so state size is bounded by the keys
    arriving within one watermark window — not one entry per distinct
    key forever, which is untenable at 100 TB (plain ``dropDuplicates``
    accretes exactly that). The trade, stated: a duplicate arriving
    more than ``watermark`` after its first occurrence is re-emitted
    (at-least-once keys downstream); tests/test_streaming.py proves
    both the in-window suppression and the eviction-then-re-emission.
    Without a watermark the unbounded ``dropDuplicates`` form is kept
    for fixture-scale testing only."""
    if df.isStreaming:
        if watermark:
            return (
                _floored_ts(df, ts_col)
                .withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(keys)
            )
        return df.dropDuplicates(keys)
    return df.select(*keys).distinct()
