"""Aggregation operators (SURVEY.md §2.4) + distinct/rollup/cube/pivot.

All are single groupBy/agg plans: Catalyst gives partial (map-side)
aggregation before the shuffle for free (the reference got this from
MapReduce combiners, mapred-site.xml:45-59), so at 100 TB the shuffle
carries one row per (partition x group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import money_sum, money_sum_sql, round_agg, round_sql
from ..operators.filename import parse_read_files, parsed_read_files_sql
from ..sources.fixtures import fixture_df, fixture_values_sql
from .registry import register


@register(
    "q_group_collect",
    oracle=f"""
    WITH {parsed_read_files_sql()}
    SELECT sample,
           coalesce(string_agg(filename, ',' ORDER BY filename)
               FILTER (WHERE read = 'R1'), '') AS r1_files,
           coalesce(string_agg(filename, ',' ORDER BY filename)
               FILTER (WHERE read = 'R2'), '') AS r2_files,
           count(*) AS n_files
    FROM parsed
    GROUP BY sample
    """,
)
def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by sample -> sorted R1/R2 file lists — the defaultdict
    pair-of-lists build (reference baseline_workflow.py:107-119) with
    the sort of :137-138 folded in (array_sort(collect_list))."""
    parsed = parse_read_files(fixture_df(spark, "read_files"))
    collect_sorted = lambda r: F.array_join(  # noqa: E731
        F.array_sort(F.collect_list(F.when(F.col("read") == r, F.col("filename")))), ","
    )
    return parsed.groupBy("sample").agg(
        collect_sorted("R1").alias("r1_files"),
        collect_sorted("R2").alias("r2_files"),
        F.count("*").alias("n_files"),
    )


@register(
    "q_count_group",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_count_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count aggregations — reference workflow.py:366-373, 479."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.countDistinct("o_custkey").alias("n_customers")
    )


@register(
    "q_bool_any",
    oracle="""
    SELECT user_id,
           bool_or(event_type = 'error') AS has_error,
           bool_and(value >= 0) AS all_nonneg
    FROM events
    GROUP BY user_id
    """,
)
def q_bool_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean ANY/ALL aggregation — ``any(j.failed for j in running)``
    (reference workflow.py:442)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.expr("bool_or(event_type = 'error')").alias("has_error"),
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
    )


@register(
    "q_phase_durations",
    oracle="""
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS first_s,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s,
           CAST(floor(epoch(max(ts))) AS BIGINT)
             - CAST(floor(epoch(min(ts))) AS BIGINT) AS span_s,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_phase_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase-duration aggregation: min/max timestamps and their delta —
    the bcl/align seconds report (reference workflow.py:523-548)."""
    e = load_table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts").cast("long")
    return (
        e.select("user_id", ts_s.alias("ts_s"))
        .groupBy("user_id")
        .agg(
            F.min("ts_s").alias("first_s"),
            F.max("ts_s").alias("last_s"),
            (F.max("ts_s") - F.min("ts_s")).alias("span_s"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q_attempts_rollup",
    oracle=f"""
    SELECT repeat_num,
           count(*) AS n_attempts,
           max(attempt_num) AS last_attempt,
           bool_or(retcode = 0) AS succeeded,
           {round_sql('sum(total_secs)')} AS total_secs_all,
           {round_sql('min(total_secs)')} AS best_secs
    FROM {fixture_values_sql('attempts')}
    GROUP BY repeat_num
    """,
)
def q_attempts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-repeat attempts rollup with success flag — reference
    experiment.py:324-359."""
    a = fixture_df(spark, "attempts")
    return a.groupBy("repeat_num").agg(
        F.count("*").alias("n_attempts"),
        F.max("attempt_num").alias("last_attempt"),
        F.expr("bool_or(retcode = 0)").alias("succeeded"),
        round_agg(F.sum("total_secs")).alias("total_secs_all"),
        round_agg(F.min("total_secs")).alias("best_secs"),
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@register(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {round_sql('sum(l_quantity)')} AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        round_agg(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {money_sum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-dimensional subtotals (cube)."""
    o = load_table(spark, sf_dir, "orders")
    # money totals (incl. the grand-total cell) in exact integer
    # cents — see the q_flagship / money_sum note
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "q_unpivot",
    oracle=f"""
    WITH wide AS (
        SELECT o_orderstatus,
               CAST(count(*) AS DOUBLE) AS cnt,
               {money_sum_sql('o_totalprice')} AS total
        FROM orders GROUP BY o_orderstatus
    )
    SELECT * FROM (UNPIVOT wide ON cnt, total INTO NAME metric VALUE val)
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of q_pivot: a wide per-status
    metrics row becomes (status, metric, val) long form, the shape
    metric stores and ML feature tables want. Spark's native unpivot is
    a zero-shuffle Expand over the already-aggregated frame.

    Parity invariant: every unpivoted metric here is NON-NULL by
    construction (count >= 1, sum over non-null totalprice). That
    matters because the engines diverge on NULL cells: Spark's unpivot
    KEEPS a (status, metric, NULL) row while DuckDB's UNPIVOT drops it
    by default — adding a nullable metric to the ON list without
    revisiting both sides would desynchronize row counts."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("cnt"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )
    return wide.unpivot(["o_orderstatus"], ["cnt", "total"], "metric", "val")


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {round_sql('sum(l_quantity)')} AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets — the non-hierarchical aggregation
    pattern ROLLUP/CUBE cannot express: detail cells plus subtotals by
    the SECOND key only ((flag, status) and (status)). One scan, one
    expand, partial aggregation before the shuffle like any groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(round_agg(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))


# HLL++ default relative standard deviation is 0.05; the gate allows
# 3 sigma, so a correct sketch fails with probability ~0.3% per cell.
APPROX_DISTINCT_RTOL = 0.15


@register(
    "q_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_ok,
           TRUE AS orders_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HLL++) — the 100 TB path for cardinality:
    constant memory per group vs exact countDistinct's shuffle of every
    distinct value. Sketch estimates are engine-specific, so the raw
    approx values can't hash-match an oracle; instead the query emits
    the exact counts plus booleans asserting the HLL estimate landed
    within APPROX_DISTINCT_RTOL of exact, and the oracle expects those
    booleans TRUE — a real driver gate on the sketch's accuracy. (The
    exact countDistinct columns are the test harness, not the scale
    path; a production rollup would emit only the sketches.)"""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_orderkey").alias("ao"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )

    def ok(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= F.lit(APPROX_DISTINCT_RTOL) * F.col(exact)
        )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        ok("ap", "exact_parts").alias("parts_ok"),
        ok("ao", "exact_orders").alias("orders_ok"),
    )


@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {round_sql("sum(l_quantity) FILTER (WHERE l_linestatus = 'O')")} AS O,
           {round_sql("sum(l_quantity) FILTER (WHERE l_linestatus = 'F')")} AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns. Pivot values are enumerated
    explicitly — at scale an un-enumerated pivot forces an extra pass
    to discover values."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return pivoted.select(
        "l_returnflag",
        round_agg(F.col("O")).alias("O"),
        round_agg(F.col("F")).alias("F"),
    )


@register(
    "q_map_ops",
    oracle="""
    SELECT n_name AS k, CAST(n_nationkey AS BIGINT) AS v
    FROM nation
    ORDER BY k
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + flatten-back (the GlobalConf dict analog,
    reference workflow.py:21-38): build map(name -> key), then explode
    to (k, v) rows so the result is oracle-comparable."""
    n = load_table(spark, sf_dir, "nation")
    mapped = n.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("n_name"), F.col("n_nationkey"))))
        ).alias("m")
    )
    return mapped.select(F.explode("m").alias("k", "v")).select(
        "k", F.col("v").cast("long").alias("v")
    )
