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


SMALL_QTY_BRAND = "Brand#13"  # Q17's single-brand probe


@register(
    "q_small_qty_revenue",
    oracle=f"""
    WITH pb AS (
        SELECT p_partkey FROM part WHERE p_brand = '{SMALL_QTY_BRAND}'
    ), stats AS (
        SELECT l_partkey,
               sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sumq100,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem JOIN pb ON l_partkey = p_partkey
        GROUP BY l_partkey
    )
    SELECT
        CAST(count(*) AS BIGINT) AS n_items,
        sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            / CAST(700 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN stats s ON l.l_partkey = s.l_partkey
    WHERE CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) * 5 * s.cnt
          < s.sumq100
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape (small-quantity-order revenue): the average
    yearly revenue lost if small orders — quantity below 20% of the
    part's own average — were no longer filled, for one brand. The
    correlated scalar subquery (`l_quantity < 0.2 * (SELECT avg(..)
    WHERE l2.l_partkey = p.p_partkey)`) becomes a per-part aggregate
    joined back onto the fact — the de-correlation Catalyst itself
    performs, written directly so the aggregate builds ONLY over the
    brand's parts (the brand filter pushes into both sides).

    Portability: `q < 0.2 * avg(q)` compares a double against an
    order-dependent float average, so both sides are cleared of
    division entirely — quantities quantize to BIGINT hundredths and
    the predicate is the integer cross-multiplication
    `q100 * 5 * cnt < sum(q100)`; revenue totals in exact integer
    cents, divided by 700 (cents x the 7-year window) only at the end.

    Scale: the brand filter keeps ~1/|brands| of parts, and the
    per-part stats table is brand-sized, so BOTH the stats build and
    the probe join broadcast the small side; lineitem shuffles once on
    l_partkey at most (AQE broadcasts stats instead at this SF). The
    output is one global row from a combinable agg."""
    pb = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == SMALL_QTY_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    q100 = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    brand_items = li.join(
        F.broadcast(pb), li.l_partkey == pb.p_partkey
    ).select("l_partkey", "l_extendedprice", q100.alias("q100"))
    stats = brand_items.groupBy("l_partkey").agg(
        F.sum("q100").alias("sumq100"),
        F.count("*").cast("long").alias("cnt"),
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        brand_items.join(F.broadcast(stats), "l_partkey")
        .filter(F.col("q100") * F.lit(5) * F.col("cnt") < F.col("sumq100"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            (F.sum(cents) / F.lit(700).cast("double")).alias("avg_yearly"),
        )
    )


@register(
    "q_cust_order_dist",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t GROUP BY c_count
    """,
)
def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape (customer order-count distribution): how many
    customers placed 0, 1, 2, ... non-urgent orders. The defining
    features are the predicate INSIDE the outer-join condition (an
    urgent order must not null out its customer — filtering after the
    join would) and the double aggregation, whose first level must
    COUNT THE JOIN KEY (count(o_orderkey), not count(*)) so no-order
    customers land in the c_count=0 bucket.

    Scale: the priority predicate prunes the orders scan before the
    join; the outer join shuffles both sides on the customer key;
    level-1 aggregation is per-customer (same key — no extra
    exchange), level-2 reduces to the #distinct-counts-sized grid
    with map-side combine. Skewed mega-customers salt level 1 if
    needed; the fixture keys are uniform."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT
        CAST(count(*) AS BIGINT) AS n_items,
        sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(floor({_REV} * 100 + 0.5) AS BIGINT)
                 ELSE 0 END) / CAST(100 AS DOUBLE) AS promo_revenue,
        floor(
            CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(floor({_REV} * 100 + 0.5) AS BIGINT)
                          ELSE 0 END) AS DOUBLE)
            / sum(CAST(floor({_REV} * 100 + 0.5) AS BIGINT))
            * 100 * 10000 + 0.5) / 10000 AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape (promotion effect): the share of a shipping
    window's revenue that came from promo-class parts — the
    conditional-aggregate ratio (`sum(CASE WHEN promo)/sum(all)`)
    computed in ONE pass over the joined fact, no self-join, no
    second scan.

    Portability: both numerator and denominator are exact integer
    cents (per-row floor-rounded, BIGINT-summed); the single
    float division and the x100 percent scaling happen once at the
    end, then portably round. The ship-window predicate pushes into
    the parquet scan; part broadcasts.

    Scale: one broadcast-joined fact scan with a fully combinable
    conditional agg — the cheapest possible shape for a ratio over a
    filtered fact. At 100 TB the only cost is the pruned scan itself."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.floor(F.expr(_REV) * 100 + F.lit(0.5)).cast("long")
    promo_cents = F.sum(
        F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0).cast("long"))
    )
    total_cents = F.sum(cents)
    share = F.floor(
        promo_cents.cast("double") / total_cents * 100 * 10000 + F.lit(0.5)
    ) / F.lit(10000)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.count("*").cast("long").alias("n_items"),
            (promo_cents / F.lit(100).cast("double")).alias("promo_revenue"),
            share.alias("promo_share_pct"),
        )
    )


# Q19's three (brand, size-band, quantity-band) disjuncts, adapted to
# the fixture's brand/size domains
PROMO_BANDS = [
    ("Brand#13", 1, 15, 1, 11),
    ("Brand#19", 1, 25, 10, 20),
    ("Brand#5", 1, 35, 20, 30),
]


def _band_sql(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> str:
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l_quantity >= {q_lo} AND l_quantity <= {q_hi})"
    )


@register(
    "q_banded_revenue",
    oracle=f"""
    SELECT
        CAST(count(*) AS BIGINT) AS n_items,
        {money_sum_sql(_REV)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {" OR ".join(_band_sql(*b) for b in PROMO_BANDS)}
    """,
)
def q_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape (discounted revenue, disjunctive bands): revenue
    from lineitems matching any of three (brand, part-size band,
    quantity band) conjunct groups — the OR-of-ANDs predicate that
    tests whether the optimizer can still PUSH the union of
    single-table bounds into each scan. Catalyst factors the common
    per-table envelopes out of the disjunction: the part scan gets the
    brand IN-list + max size bound, the lineitem scan the overall
    quantity envelope, and only the residual cross-table disjunction
    evaluates post-join.

    Portability: quantity bands compare integer-valued DOUBLEs against
    integer literals (exact in IEEE); revenue is exact integer cents.

    Scale: part broadcasts (brand IN-list prunes it first); lineitem
    never shuffles — the whole query is scan -> broadcast-probe ->
    combinable agg, the minimum possible shape for a disjunctive fact
    filter. One global row out."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = None
    for brand, s_lo, s_hi, q_lo, q_hi in PROMO_BANDS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )
        band = c if band is None else (band | c)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.count("*").cast("long").alias("n_items"),
            money_sum(F.expr(_REV)).alias("revenue"),
        )
    )


@register(
    "q_idle_rich_customers",
    oracle="""
    WITH pos AS (
        SELECT c_custkey, c_nationkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
        FROM customer WHERE c_acctbal > 0.0
    ), avg_ AS (
        SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
               CAST(count(*) AS BIGINT) AS cnt
        FROM pos
    ), rich AS (
        SELECT p.c_custkey, p.c_nationkey, p.bal_c
        FROM pos p CROSS JOIN avg_
        WHERE p.bal_c * avg_.cnt > avg_.sum_c
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           sum(r.bal_c) / CAST(100 AS DOUBLE) AS totacctbal
    FROM rich r
    JOIN nation n ON n.n_nationkey = r.c_nationkey
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey
    )
    GROUP BY n.n_name
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (global-counts opportunity): customers whose
    account balance beats the GLOBAL average of positive balances but
    who never placed an order — per nation, how many and how much. Two
    classic sub-shapes in one query: a global scalar aggregate gating
    a row-level predicate (1-row broadcast, cleared of division via
    the exact cross-multiplication `bal_cents * cnt > sum_cents`), and
    the no-orders condition as a LEFT ANTI join on the customer key.

    Scale: the scalar agg is one combinable pass over the pruned
    customer scan; the anti join shuffles the (already rich-filtered,
    tiny) customer side against orders' custkey projection — at 100 TB
    AQE broadcasts the rich side instead; nation broadcasts; the final
    grid is |nations| rows. The positive-balance filter pushes into
    the parquet scan on BOTH derivations."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 0.0
    )
    bal_c = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    pos = cust.select("c_custkey", "c_nationkey", bal_c.alias("bal_c"))
    avg_ = pos.agg(
        F.sum("bal_c").cast("long").alias("sum_c"),
        F.count("*").cast("long").alias("cnt"),
    )
    rich = (
        pos.crossJoin(F.broadcast(avg_))
        .filter(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
        .select("c_custkey", "c_nationkey", "bal_c")
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = load_table(spark, sf_dir, "nation")
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            (F.sum("bal_c") / F.lit(100).cast("double")).alias("totacctbal"),
        )
    )


@register(
    "q_rfm_segments",
    oracle="""
    WITH ref AS (
        SELECT max(o_orderdate) AS r FROM orders
    ), cust AS (
        SELECT o.o_custkey,
               CAST(date_diff('day', max(o.o_orderdate),
                              (SELECT r FROM ref)) AS BIGINT)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_c
        FROM orders o GROUP BY o.o_custkey
    ), scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_c,
               CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                    AS BIGINT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency ASC, o_custkey)
                    AS BIGINT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary_c ASC, o_custkey)
                    AS BIGINT) AS m_score
        FROM cust
    )
    SELECT o_custkey AS c_custkey, recency_days, frequency,
           monetary_c / CAST(100 AS DOUBLE) AS monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS segment
    FROM scored
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the customer-value quintile grid (recency /
    frequency / monetary) every retention team maintains: per customer,
    days since last order (against the corpus's own max order date, so
    the query is reproducible without a wall clock), order count, and
    lifetime spend, each scored into quintiles via ntile(5), composed
    into the classic 111..555 segment code (555 = recent, frequent,
    big spender).

    Determinism: every ntile ORDER BY carries the customer key as a
    tiebreak — quintile boundaries on tied metric values would
    otherwise depend on shuffle order; spend is exact integer cents;
    day arithmetic is integer against midnight timestamps.

    Scale: one per-customer aggregate (map-side combinable on the
    orders scan), then three GLOBAL ntile windows over the
    customer-dim-sized aggregate — a global sort each, the honest
    price of exact quantile bucketing (the reason this runs on the
    AGGREGATE, never the fact). At extreme customer counts swap
    exact ntile for approx-percentile cutpoints (q_percentile's
    machinery) and keep the same segment codes."""
    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("r"))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(cents).cast("long").alias("monetary_c"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("r"), F.col("last_order"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_c",
        )
    )
    w_r = Window.orderBy(F.col("recency_days").desc(), "o_custkey")
    w_f = Window.orderBy(F.col("frequency").asc(), "o_custkey")
    w_m = Window.orderBy(F.col("monetary_c").asc(), "o_custkey")
    scored = cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        F.ntile(5).over(w_r).cast("long").alias("r_score"),
        F.ntile(5).over(w_f).cast("long").alias("f_score"),
        F.ntile(5).over(w_m).cast("long").alias("m_score"),
    )
    return scored.select(
        F.col("o_custkey").alias("c_custkey"),
        "recency_days",
        "frequency",
        (F.col("monetary_c") / F.lit(100).cast("double")).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("segment"),
    )


@register(
    "q_cohort_ltv",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS m,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), coh AS (
        SELECT o_custkey, CAST(min(m) AS BIGINT) AS m0 FROM o
        GROUP BY o_custkey
    ), cell AS (
        SELECT coh.m0 AS cohort_month, o.m - coh.m0 AS age_months,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(o.cents) AS BIGINT) AS rev_c
        FROM o JOIN coh ON coh.o_custkey = o.o_custkey
        GROUP BY coh.m0, o.m - coh.m0
    )
    SELECT cohort_month, age_months, n_orders,
           rev_c / CAST(100 AS DOUBLE) AS revenue,
           CAST(sum(rev_c) OVER (
               PARTITION BY cohort_month ORDER BY age_months
           ) AS BIGINT) / CAST(100 AS DOUBLE) AS cum_revenue
    FROM cell
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — the lifetime-value grid finance and growth
    teams read together: customers cohorted by first-order month, and
    per (cohort, months-since-first) cell the order count, revenue,
    and the CUMULATIVE revenue the cohort has produced by that age.
    Comparing cum_revenue across cohorts at equal age is the LTV
    trajectory chart; its plateau is the payback ceiling.

    Determinism: month indices are exact integers (year*12 + month);
    revenue is exact integer cents, cumulated as BIGINT by an ordered
    window over the cohort grid BEFORE the single presentation
    division — no float accumulates.

    Scale: one per-customer min (combinable), one fact join against
    the customer-sized cohort map (AQE broadcasts it here; at 100 TB
    it co-shuffles on the customer key both sides already use), one
    grid aggregate, and a window over the #cohorts x #ages GRID —
    never over fact rows (the q_ratio_share convention)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("m"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    coh = o.groupBy("o_custkey").agg(F.min("m").cast("long").alias("m0"))
    cell = (
        o.join(coh, "o_custkey")
        .groupBy(
            F.col("m0").alias("cohort_month"),
            (F.col("m") - F.col("m0")).alias("age_months"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_c"),
        )
    )
    w = Window.partitionBy("cohort_month").orderBy("age_months")
    return cell.select(
        "cohort_month",
        "age_months",
        "n_orders",
        (F.col("rev_c") / F.lit(100).cast("double")).alias("revenue"),
        (
            F.sum("rev_c").over(w).cast("long") / F.lit(100).cast("double")
        ).alias("cum_revenue"),
    )
