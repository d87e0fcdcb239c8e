"""Multi-way-join analytics queries (TPC-H shapes adapted to the
fixture schema): the plans that exercise Catalyst's join ordering,
broadcast selection and partial aggregation at once — and the core of
the bench workload.

Scale notes: every dimension chain (region->nation->customer/supplier)
broadcasts; only the two fact tables (orders, lineitem) shuffle, on
their join keys; revenue aggregates are rounded portably BEFORE any
ranking so top-k cutoffs agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.portable import money_sum, money_sum_sql, round_agg, round_sql
from ..operators.topk import rank_after_topk
from .registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, revenue, o_orderpriority, rank FROM (
        SELECT l_orderkey, revenue, o_orderpriority,
               row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rank
        FROM (
            SELECT l.l_orderkey,
                   {round_sql(f'sum({_REV})')} AS revenue,
                   o.o_orderpriority
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l.l_orderkey, o.o_orderpriority
        ) agg
    ) ranked WHERE rank <= 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: 3-way join, filtered fact scan, grouped revenue,
    global top-10. Ranking happens on the PORTABLY ROUNDED revenue so
    the cutoff is engine-stable."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(round_agg(F.sum(F.expr(_REV))).alias("revenue"))
    )
    # top-k FIRST (TakeOrderedAndProject), rank attached over the <= 10
    # survivors — never a global window over every l_orderkey
    return rank_after_topk(agg, 10, "revenue", "l_orderkey").select(
        "l_orderkey", "revenue", "o_orderpriority", "rank"
    )


@register(
    "q_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {money_sum_sql(_REV)} AS revenue, count(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: 6-way join where supplier and customer must share
    a nation — the join-order stress test. Dimension chain broadcasts;
    facts shuffle once each."""
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            # per-nation money total: cents scale (see q_flagship note)
            money_sum(F.expr(_REV)).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, n_name, rank FROM (
        SELECT c.c_custkey, c.c_name,
               {round_sql(f'sum({_REV})')} AS revenue,
               n.n_name,
               row_number() OVER (ORDER BY {round_sql(f'sum({_REV})')} DESC,
                                  c.c_custkey) AS rank
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
    ) t WHERE rank <= 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: who returned the most revenue — join facts to
    the customer/nation dims, filter returned lines, top-20 customers."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round_agg(F.sum(F.expr(_REV))).alias("revenue"))
    )
    # same top-k-before-rank shape as q_shipping_priority
    return rank_after_topk(agg, 20, "revenue", "c_custkey").select(
        "c_custkey", "c_name", "revenue", "n_name", "rank"
    )


@register(
    "q_attribution",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es
        FROM events
    ), tagged AS (
        SELECT user_id, event_id, event_type, es,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS channel
        FROM e
    ), purchases AS (
        SELECT coalesce(channel, 'none') AS channel FROM tagged
        WHERE event_type = 'purchase'
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS t FROM purchases
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
           floor(count(*)::DOUBLE / t * 10000 + 0.5) / 10000 AS share
    FROM purchases CROSS JOIN tot
    GROUP BY channel, t
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH conversion attribution — the marketing-analytics
    staple over an event stream: each 'purchase' is credited to the
    user's most recent preceding NON-purchase event type (the
    last-non-null-carry window idiom: tag non-purchase rows, then
    last_value IGNORE NULLS over the exclusive preceding frame), with
    purchases that have no preceding touch credited to 'none'. Output
    is the per-channel conversion count and share — the report a
    growth team reads daily.

    Scale: ONE ordered window per user_id (the q_sessionize exchange
    shape) followed by a channel-cardinality-sized aggregate; the
    share denominator is a 1-row broadcast. first-touch attribution is
    the same plan with an UNBOUNDED-following frame; multi-touch
    is the same tag exploded — the carry idiom is the whole trick."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase").select(
        F.coalesce("channel", F.lit("none")).alias("channel")
    )
    tot = purchases.agg(F.count("*").cast("long").alias("t"))
    return (
        purchases.crossJoin(F.broadcast(tot))
        .groupBy("channel", "t")
        .agg(F.count("*").cast("long").alias("n_purchases"))
        .select(
            "channel",
            "n_purchases",
            round_agg(
                F.col("n_purchases").cast("double") / F.col("t")
            ).alias("share"),
        )
    )


@register(
    "q_nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {money_sum_sql(_REV)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice, l.l_discount
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
            OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape (volume shipping): bilateral trade between two
    nations by ship year — the 6-way join with TWO roles for the same
    dimension (nation joins once through the supplier chain and once
    through the customer chain) plus a disjunctive cross-pair
    predicate, the classic join-reorder + self-dimension-alias stress
    test. Rounds out the TPC-H shape family (Q1 flagship, Q3 shipping
    priority, Q5 local supplier volume, Q10 returned items).

    Scale: both nation aliases and supplier broadcast; lineitem and
    orders shuffle once each on the order key; the ship-date filter
    pushes into the scan; money totals in exact integer cents."""
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        money_sum(F.expr(_REV)).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


WEEK_S = 604800  # epoch seconds per week (the cohort grain)


@register(
    "q_events_retention",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // {WEEK_S} AS week
        FROM events
    ), cohort AS (
        SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
    ), active AS (
        SELECT DISTINCT e.user_id, c.cohort_week,
               e.week - c.cohort_week AS week_offset
        FROM e JOIN cohort c USING (user_id)
    ), size_ AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           s.cohort_size,
           {round_sql('count(*)::DOUBLE / s.cohort_size')} AS retention
    FROM active a JOIN size_ s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION — the product-analytics staple: users are
    cohorted by their first-activity week (epoch-week grain, integer
    division on floored epoch seconds so no timezone or float sits on
    a boundary), and each (cohort, weeks-since-first) cell reports how
    many of the cohort's users were active — the retention triangle a
    growth dashboard renders. Week arithmetic is all BIGINT; the
    retention share is one exact rational per cell.

    Scale: one map-side pass to (user, week) pairs, a per-user min
    agg for the cohort (combinable), a distinct on (user, cohort,
    offset) — all shuffles keyed by user or cohort, no windows; the
    final grid is #cohorts x #offsets (tiny). The cohort-size join is
    grid-sized (AQE broadcasts it)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"CAST(floor(unix_timestamp(ts)) AS BIGINT) div {WEEK_S}").alias(
            "week"
        ),
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    size = cohort.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
        .join(size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            round_agg(
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
    )


LATE_DAYS = 60  # "kept the order waiting": shipped > 60 days after order


@register(
    "q_waiting_suppliers",
    oracle=f"""
    WITH fo AS (
        SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ), late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
        WHERE l.l_shipdate > fo.o_orderdate + INTERVAL {LATE_DAYS} DAY
    ), w AS (
        SELECT l1.l_orderkey, l1.l_suppkey
        FROM late l1
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
        ) AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
        )
    )
    SELECT s_name, numwait, rank FROM (
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait,
               row_number() OVER (ORDER BY count(*) DESC, s.s_name) AS rank
        FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
        GROUP BY s.s_name
    ) t WHERE rank <= 10
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape (suppliers who kept orders waiting), adapted to
    the fixture schema: with no commit/receipt dates, "late" means the
    item shipped more than {LATE_DAYS} days after its finished ('F')
    order was placed. A late lineitem counts only when its order is
    multi-supplier (EXISTS another supplier's item -> LEFT SEMI join)
    AND its supplier is the SOLE late one (NOT EXISTS another
    supplier's late item -> LEFT ANTI join) — the classic
    correlated-exists pair that completes the TPC-H shape family
    (Q1/Q3/Q5/Q7/Q10) with the semi+anti composite-condition joins
    none of the other shapes exercise.

    Scale: the status filter pushes into the orders scan on BOTH
    derivations of the late set, and every lineitem scan prunes to
    three columns (Q21's l1/l2/l3 cost three pruned fact scans — the
    shape's intrinsic price); semi/anti joins shuffle on the order
    key — the same key both fact tables already join on — and
    carry the supplier-inequality as a cheap residual conjunct;
    supplier broadcasts for the final name lookup; top-10 is a window
    over the per-supplier aggregate (|suppliers| rows)."""
    fo = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(fo, li.l_orderkey == fo.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    sole = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    agg = (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )
    w = Window.orderBy(F.col("numwait").desc(), F.col("s_name"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("s_name", "numwait", "rank")
    )


q_waiting_suppliers.__doc__ = q_waiting_suppliers.__doc__.format(
    LATE_DAYS=LATE_DAYS
)


BIG_ORDER_QTY = 300  # Q18 threshold: orders with > 300 total quantity


@register(
    "q_big_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS qty_q
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT))
               > {BIG_ORDER_QTY} * 10000
    )
    SELECT c_name, o_orderkey, o_totalprice, total_qty, rank FROM (
        SELECT c.c_name, o.o_orderkey, o.o_totalprice,
               b.qty_q / 10000.0 AS total_qty,
               row_number() OVER (
                   ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rank
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    ) t WHERE rank <= 20
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds {BIG_ORDER_QTY}, with their customer,
    ranked by order value — the aggregated-HAVING IN-subquery shape
    (Q18's `o_orderkey IN (SELECT .. GROUP BY .. HAVING sum > Q)`)
    expressed directly as agg -> filter -> join, which is exactly the
    semi-join plan Catalyst rewrites the IN form into, except the
    aggregate is reused for the output column instead of computed
    twice.

    Portability: l_quantity is a non-integral DOUBLE, so the per-order
    total quantizes each row to BIGINT ten-thousandths BEFORE the sum
    (exact, order-independent) and both the HAVING cut and the emitted
    total divide out of that integer — no float sum anywhere.

    Scale: the qty aggregate is map-side-combinable on the lineitem
    scan's own key; the HAVING cut shrinks the agg output to the
    handful of jumbo orders BEFORE any join, so the orders/customer
    joins probe with a tiny build side (AQE will broadcast it); the
    final rank is a window over <= |big| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    qq = F.floor(F.col("l_quantity") * 10000 + F.lit(0.5)).cast("long")
    big = (
        li.select("l_orderkey", qq.alias("qq"))
        .groupBy("l_orderkey")
        .agg(F.sum("qq").alias("qty_q"))
        .filter(F.col("qty_q") > BIG_ORDER_QTY * 10000)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            (F.col("qty_q") / 10000.0).alias("total_qty"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty", "rank")
    )


q_big_orders.__doc__ = q_big_orders.__doc__.format(BIG_ORDER_QTY=BIG_ORDER_QTY)
