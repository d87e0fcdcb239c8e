"""Batch-checkable streaming queries (SURVEY.md §2.9).

Each query applies the SAME transform the streaming layer uses
(streaming/windows.py, streaming/state.py) to the batch events table;
Structured Streaming's unified semantics make the batch result the
specification for the stream (tests/test_streaming.py asserts
stream == batch on every one of these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import round_agg, round_sql
from ..sources.fixtures import fixture_df, fixture_values_sql
from ..streaming.state import track_jobs
from ..streaming.windows import (
    enriched_counts,
    session_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)
from .registry import ORACLES, register

_EVENTS_TS = "CAST(floor(epoch(ts)) AS BIGINT)"


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT CAST(floor({_EVENTS_TS} / 600) * 600 AS BIGINT) AS ws,
           event_type,
           count(*) AS n,
           {round_sql('sum(value)')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (ST10). Spark aligns window
    starts to the epoch, so the oracle is integer bucketing."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), "10 minutes")


@register(
    "q_stream_sliding",
    oracle=f"""
    SELECT CAST(floor({_EVENTS_TS} / 300) * 300 - o.off AS BIGINT) AS ws,
           count(*) AS n,
           {round_sql('sum(value)')} AS total_value
    FROM events CROSS JOIN (VALUES (0), (300)) o(off)
    GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (width 10 min, slide 5 min): every event falls in
    exactly width/slide = 2 windows; the oracle materializes both."""
    return sliding_counts(load_table(spark, sf_dir, "events"), "10 minutes", "5 minutes")


@register(
    "q_stream_session",
    oracle=f"""
    WITH t AS (
        SELECT user_id, {_EVENTS_TS} AS ts_s, value FROM events
    ), marked AS (
        -- strictly greater: an event at exactly prev + gap still merges
        -- (verified against session_window on an exact-1800s gap)
        SELECT *, CASE WHEN ts_s - lag(ts_s) OVER w > 1800 OR
                            lag(ts_s) OVER w IS NULL
                       THEN 1 ELSE 0 END AS new_session
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
    ), numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT min(ts_s) AS session_start, user_id, count(*) AS n,
           {round_sql('sum(value)')} AS total_value
    FROM numbered GROUP BY user_id, sid
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (30-minute gap, ST10): Spark's
    ``session_window`` vs the classic gaps-and-islands formulation in
    the oracle — a session closes only when the next event arrives
    strictly more than ``gap`` after the previous one (an event at
    exactly prev + gap merges)."""
    return session_counts(load_table(spark, sf_dir, "events"), "30 minutes")


@register(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on (user_id, event_type) (ST11); on a stream this is
    watermark-bounded dropDuplicates state."""
    return stream_dedup(load_table(spark, sf_dir, "events"), ["user_id", "event_type"])


@register(
    "q_stream_enrich",
    oracle=f"""
    SELECT c_mktsegment AS segment, event_type,
           count(*) AS n,
           {round_sql('sum(value)')} AS total_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY 1, 2
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: events joined to the static
    customer dimension (segment per user), rolled up per
    (segment, event_type). On a stream, every micro-batch hash-joins
    against the broadcast dim snapshot — the unbounded side never
    shuffles for the join; tests/test_streaming.py asserts
    stream == batch."""
    return enriched_counts(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


@register(
    "q_gap_fill",
    oracle=f"""
    WITH agg AS (
        SELECT event_type,
               CAST(floor({_EVENTS_TS} / 600) * 600 AS BIGINT) AS ws,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ), b AS (
        SELECT event_type, min(ws) AS mn, max(ws) AS mx FROM agg GROUP BY 1
    ), grid AS (
        SELECT event_type, unnest(generate_series(mn, mx, 600)) AS ws FROM b
    )
    SELECT g.event_type, g.ws, coalesce(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a
      ON a.event_type = g.event_type AND a.ws = g.ws
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: densify the per-type 10-minute count
    series so empty windows appear as explicit zero rows (the shape
    downstream forecasting/alerting expects — a missing row and a
    zero-count window are different facts). The window grid comes from
    sequence(min, max) per key — generated, never stored; the fill is
    one left join against the sparse aggregate. Fixture has real gaps
    (~1.6k of ~4.3k slots present per type), so the fill is exercised,
    not vacuous.

    Scale: the grid is keys x slots rows (tiny next to the events
    corpus); the only corpus-sized ops are the first aggregate's
    partial/merge. The grid side of the fill join is AQE-broadcastable."""
    e = load_table(spark, sf_dir, "events")
    agg = (
        e.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 600) * 600)
            .cast("long")
            .alias("ws"),
        )
        .groupBy("event_type", "ws")
        .agg(F.count("*").alias("n"))
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("ws").alias("mn"), F.max("ws").alias("mx")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.lit(600))).alias("ws"),
    )
    return grid.join(agg, ["event_type", "ws"], "left").select(
        "event_type", "ws", F.coalesce("n", F.lit(0)).alias("n")
    )


@register(
    "q_job_tracker",
    oracle=f"""
    SELECT job_id,
           arg_max(state, tick) AS final_state,
           arg_max(retcode, tick) AS retcode,
           (arg_max(state, tick) IN ('FAILED', 'KILLED')
            OR coalesce(arg_max(retcode, tick), 0) <> 0) AS failed,
           CAST(count(*) AS INT) AS n_events,
           min(tick) AS first_tick,
           max(tick) AS last_tick
    FROM {fixture_values_sql('job_events')}
    GROUP BY job_id
    """,
)
def q_job_tracker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AlignJob/_wait state machine (ST2) over the job-events fixture
    via grouped applyInPandas — the custom-stateful-operator path, still
    oracle-checkable because the fold is deterministic."""
    return track_jobs(fixture_df(spark, "job_events"))


@register(
    "q_stream_interval_join",
    oracle=f"""
    SELECT c.event_id AS l_id, c.user_id,
           {_EVENTS_TS.replace('ts', 'c.ts')} AS l_ts_s,
           p.event_id AS r_id,
           {_EVENTS_TS.replace('ts', 'p.ts')} AS r_ts_s
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND {_EVENTS_TS.replace('ts', 'p.ts')}
         BETWEEN {_EVENTS_TS.replace('ts', 'c.ts')} - 1800
             AND {_EVENTS_TS.replace('ts', 'c.ts')}
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (J5 streaming face), batch-checked:
    clicks enriched with all purchases of the same user in the
    preceding 30 minutes. On streams both sides carry watermarks and
    the time bound lets Spark evict join state (streaming/joins.py;
    stream==batch proven in tests/test_harness_and_joins.py)."""
    from pyspark.sql import functions as F

    from ..streaming.joins import interval_join

    e = load_table(spark, sf_dir, "events")
    return interval_join(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )


@register(
    "q_skew_salted_agg",
    oracle=f"""
    SELECT event_type, {round_sql('sum(value)')} AS total, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation (the hot-key survival path at
    100 TB): results must equal the plain groupBy — the oracle IS the
    plain formulation."""
    from pyspark.sql import functions as F

    from ..operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        key="event_type",
        salt_from="event_id",
        aggs={"total": ("sum", "value"), "n": ("count", "event_id")},
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        round_agg(F.col("total")).alias("total"),
        "n",
    )


@register(
    "q_sessionize",
    oracle=f"""
    WITH es AS (
        SELECT user_id, event_id, {_EVENTS_TS} AS es FROM events
    ), flagged AS (
        SELECT user_id, event_id, es,
               CASE WHEN lag(es) OVER w IS NULL
                         OR es - lag(es) OVER w > 86400
                    THEN 1 ELSE 0 END AS new_s
        FROM es
        WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    ), labeled AS (
        SELECT user_id, es,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(es) AS start_s, max(es) AS end_s,
           max(es) - min(es) AS duration_s
    FROM labeled GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: LABEL each user's events with a session id
    (gap rule: a strictly-greater-than-1-day silence opens a new
    session) and emit per-session stats. The labeling counterpart of
    `session_window` (q_stream_session) — that one aggregates into
    sessions, this one assigns ids events can carry downstream; the
    lag -> flag -> running-sum chain is the canonical formulation.

    Scale: the gap flag and the cumulative session counter are two
    ordered windows over the SAME user_id partitioning — one exchange,
    stacked Window operators (same shape as q_event_funnel, which is
    plan-shape-tested); then a per-(user, session) aggregate. All time
    arithmetic happens on floor'd epoch seconds so both engines
    difference identical integers."""
    e = load_table(spark, sf_dir, "events")
    es = e.select(
        "user_id", "event_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    prev = F.lag("es").over(w)
    flagged = es.withColumn(
        "new_s",
        F.when(prev.isNull() | (F.col("es") - prev > 86400), 1).otherwise(0),
    )
    labeled = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return labeled.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.count("*").alias("n_events"),
        F.min("es").alias("start_s"),
        F.max("es").alias("end_s"),
        (F.max("es") - F.min("es")).alias("duration_s"),
    )


@register(
    "q_scd2_history",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               {_EVENTS_TS} AS es
        FROM events
    ), flagged AS (
        SELECT *,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY es, event_id) AS prev_t
        FROM e
    ), ch AS (
        SELECT user_id, event_id, event_type, es FROM flagged
        WHERE prev_t IS NULL OR prev_t <> event_type
    )
    SELECT user_id, event_type, es AS valid_from,
           lead(es) OVER (
               PARTITION BY user_id ORDER BY es, event_id) AS valid_to,
           lead(es) OVER (
               PARTITION BY user_id ORDER BY es, event_id) IS NULL
             AS is_current
    FROM ch
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build (Kimball slowly-changing-dimension
    semantics) from the raw event log: collapse each user's stream to
    its event_type CHANGE points, then stamp every change row with a
    [valid_from, valid_to) validity interval — valid_to = the next
    change's timestamp, NULL marks the current row. This is the batch
    form of a CDC merge: the same change-point detection the stateful
    job tracker applies incrementally (streaming/state.py), here as a
    reprocessable lag -> filter -> lead window chain.

    Scale: two ordered windows over the SAME user_id partitioning (one
    exchange — the q_sessionize shape, plan-shape precedent there), and
    the second window runs on the already-collapsed change rows. Time
    arithmetic is floor'd epoch seconds; (es, event_id) is a total
    order per user, so ties cannot flip validity intervals between
    engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    ch = (
        e.withColumn("prev_t", F.lag("event_type").over(w))
        .filter(
            F.col("prev_t").isNull()
            | (F.col("prev_t") != F.col("event_type"))
        )
        .select("user_id", "event_id", "event_type", "es")
    )
    nxt = F.lead("es").over(w)
    return ch.select(
        "user_id",
        "event_type",
        F.col("es").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "q_time_travel",
    oracle=f"""
    WITH hist AS ({{scd2}}
    ), t AS (
        SELECT (min(valid_from) + max(valid_from)) // 2 AS t0 FROM hist
    )
    SELECT h.user_id, h.event_type,
           h.valid_from,
           CAST(t.t0 - h.valid_from AS BIGINT) AS state_age_s
    FROM hist h CROSS JOIN t
    WHERE h.valid_from <= t.t0
      AND (h.valid_to IS NULL OR h.valid_to > t.t0)
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) table reconstruction from the SCD2
    history — the read side of the temporal family: given the
    [valid_from, valid_to) intervals q_scd2_history builds, recover
    every user's state as of T plus how long that state had been held.
    T is corpus-derived (the midpoint of the change-point timestamp
    range) so the query is meaningful at every SF; in production T is
    a literal and this is the lakehouse "VERSION AS OF"/"TIMESTAMP AS
    OF" read, computed from data for tables without a transaction log.

    The oracle COMPOSES the registered q_scd2_history SQL as a CTE
    (the q_ann_recall convention), so any change to the history build
    flows into the time-travel read automatically.

    Scale: one half-open interval predicate per history row against a
    1-row broadcast scalar — no join beyond the history build itself;
    at most one row per (user, T) survives by the SCD2 invariant
    (intervals partition each user's timeline)."""
    hist = q_scd2_history(spark, sf_dir)
    t0 = hist.agg(
        ((F.min("valid_from") + F.max("valid_from")) / 2)
        .cast("long")
        .alias("t0")
    )
    return (
        hist.crossJoin(F.broadcast(t0))
        .filter(
            (F.col("valid_from") <= F.col("t0"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("t0")))
        )
        .select(
            "user_id",
            "event_type",
            "valid_from",
            (F.col("t0") - F.col("valid_from")).cast("long").alias("state_age_s"),
        )
    )


_TT = ORACLES["q_time_travel"]
ORACLES["q_time_travel"] = _TT.format(scd2=ORACLES["q_scd2_history"])
