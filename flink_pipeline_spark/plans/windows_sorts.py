"""Window functions, sorts/limits/top-k, set operations
(SURVEY.md §2.5-2.7).

Determinism discipline: every window ORDER BY ends in a unique key
(custkey/orderkey/event_id) so ranks and running values are identical
across engines and across Spark partitionings. Scale notes: all
windows are partitioned by a key (never a global window over the fact
table); the only global sorts are over tiny dimensions or after
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import literal_frame
from ..catalog import load_table
from ..functions.portable import round_agg, round_sql
from ..operators.filename import parse_read_files, parsed_read_files_sql
from ..sources.fixtures import fixture_df, fixture_values_sql
from .registry import register

# ---------------------------------------------------------------------------
# §2.5 Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           rank() OVER (PARTITION BY c_nationkey
                        ORDER BY floor(c_acctbal / 1000) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey
                              ORDER BY floor(c_acctbal / 1000) DESC) AS drnk,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY floor(c_acctbal / 1000) DESC, c_custkey) AS rn
    FROM customer
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio. rank/dense_rank order by a coarse bucket (real ties
    exercised, still deterministic); row_number adds the unique key."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("long")
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("bal_bucket").desc())
    w_uni = Window.partitionBy("c_nationkey").orderBy(
        F.col("bal_bucket").desc(), F.col("c_custkey")
    )
    return (
        c.select("c_custkey", "c_nationkey", bucket.alias("bal_bucket"))
        .withColumn("rnk", F.rank().over(w_ties))
        .withColumn("drnk", F.dense_rank().over(w_ties))
        .withColumn("rn", F.row_number().over(w_uni))
    )


@register(
    "q_window_dist",
    oracle=f"""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           {round_sql('percent_rank() OVER w')} AS pct_rank,
           {round_sql('cume_dist() OVER w')} AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY floor(c_acctbal / 1000) DESC, c_custkey)
    """,
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window trio (ntile / percent_rank / cume_dist) —
    quartile bucketing and relative standing per nation. All three are
    position-sensitive, so the window orders by a UNIQUE key
    (bucket desc, custkey) and the fractional outputs are round_agg'd:
    deterministic on any engine, any partitioning."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.floor(F.col("c_acctbal") / 1000).desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        round_agg(F.percent_rank().over(w)).alias("pct_rank"),
        round_agg(F.cume_dist().over(w)).alias("cume"),
    )


@register(
    "q_window_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {round_sql('''sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_total,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderkey)
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead per customer over order time — reference
    analog: cumulative phase timing (workflow.py:523-548)."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.unix_timestamp("o_orderdate").cast("long")
    base = o.select("o_custkey", "o_orderkey", ts.alias("od_s"), "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy("od_s", "o_orderkey")
    return base.select(
        "o_custkey",
        "o_orderkey",
        round_agg(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@register(
    "q_window_frame",
    oracle=f"""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_10min,
           {round_sql('sum(value) OVER w')} AS val_last_10min
    FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
          FROM events) t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame window: activity in the trailing 10 minutes — the
    declarative form of the reference's periodic progress report every
    8s/60s (workflow.py:456-460)."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", "value", F.unix_timestamp("ts").cast("long").alias("ts_s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-600, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_10min"),
        round_agg(F.sum("value").over(w)).alias("val_last_10min"),
    )


@register(
    "q_last_per_group",
    oracle=f"""
    SELECT repeat_num, attempt_num, retcode, {round_sql('total_secs')} AS total_secs
    FROM (
        SELECT *, row_number() OVER (PARTITION BY repeat_num
                                     ORDER BY attempt_num DESC) AS rn
        FROM {fixture_values_sql('attempts')}
    ) t
    WHERE rn = 1
    """,
)
def q_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last attempt per repeat — the retry loop keeps the final attempt's
    outcome (reference experiment.py:345-357)."""
    a = fixture_df(spark, "attempts")
    w = Window.partitionBy("repeat_num").orderBy(F.col("attempt_num").desc())
    return (
        a.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "repeat_num",
            "attempt_num",
            "retcode",
            round_agg(F.col("total_secs")).alias("total_secs"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 Sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "q_sort",
    oracle=f"""
    SELECT s_suppkey, s_name, {round_sql('s_acctbal')} AS bal,
           row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS pos
    FROM supplier
    """,
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order made observable via position — the sorted-file-list
    guarantee (reference baseline_workflow.py:137-138). Global window
    is fine: supplier is a dimension (10 rows/SF unit)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_name",
        round_agg(F.col("s_acctbal")).alias("bal"),
        F.row_number().over(w).alias("pos"),
    )


@register(
    "q_offset_skip",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    ORDER BY o_orderkey OFFSET 2 LIMIT 5
    """,
)
def q_offset_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-skip: ordered offset+limit — ``stdout.split('\\n')[2:]``
    (reference workflow.py:327, 419, util.py:45)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").offset(2).limit(5)


@register(
    "q_limit1",
    oracle=f"""
    WITH {parsed_read_files_sql()}
    SELECT filename FROM parsed ORDER BY filename LIMIT 1
    """,
)
def q_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match short-circuit (reference workflow.py:79-82: first jar
    found wins) as ordered LIMIT 1."""
    parsed = parse_read_files(fixture_df(spark, "read_files"))
    return parsed.select("filename").orderBy("filename").limit(1)


@register(
    "q_topk",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name
    FROM (
        SELECT c_nationkey, c_custkey, c_name,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) t WHERE rn <= 2
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window rank — the scalable formulation (local
    top-k per partition before the shuffle; Spark's WindowExec plus AQE
    handle this without a global sort)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("c_nationkey", "c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------


@register(
    "q_union",
    oracle=f"""
    WITH {parsed_read_files_sql()}
    SELECT sample, count(*) AS n_files FROM (
        SELECT sample, filename FROM parsed WHERE read = 'R1'
        UNION ALL
        SELECT sample, filename FROM parsed WHERE read = 'R2'
    ) u GROUP BY sample
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of file scans — the multi-chunk gunzip concat
    (reference baseline_workflow.py:143-144, ``' '.join(r1_files)``)."""
    parsed = parse_read_files(fixture_df(spark, "read_files"))
    r1 = parsed.filter(F.col("read") == "R1").select("sample", "filename")
    r2 = parsed.filter(F.col("read") == "R2").select("sample", "filename")
    return r1.unionByName(r2).groupBy("sample").agg(F.count("*").alias("n_files"))


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT * FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9)) t(k)
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set subtraction (EXCEPT distinct) — the file-set subtraction
    semantics of reference workflow.py:360-378. Subtrahend is a literal
    key set so the result is non-empty at every SF (nation minus
    supplier-nations is empty: every nation has suppliers)."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    s = literal_frame(spark, [(k,) for k in range(10)], "nationkey INT")
    return n.subtract(s)
