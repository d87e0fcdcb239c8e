"""The remaining TPC-H query shapes (Q2/Q4/Q6/Q8/Q9/Q11/Q12/Q15/Q16/
Q20), adapted to the fixture schema — completing the 22-shape family
started in analytics.py (Q1 flagship, Q3, Q5, Q7, Q10, Q13, Q14, Q17,
Q18, Q19, Q21, Q22).

The fixture has no partsupp table and lineitem carries no
shipmode/commitdate/receiptdate, so the four partsupp shapes (Q2, Q9,
Q11, Q20) re-root their cost/stock side on the lineitem association
(min offered price, retail-derived cost, shipped-value importance,
shipped-quantity dominance) and Q12 groups by l_linestatus instead of
l_shipmode with "late" defined against the order date. Each docstring
states the adaptation; the SHAPE — the join topology, the correlation
pattern, the aggregate structure TPC-H designed the query to stress —
is preserved exactly.

Portability follows the house rules (functions/portable.py): money and
quantity arithmetic quantizes to BIGINT before any sum or comparison;
ratios cross-multiply instead of divide; the only float ops are final
presentations (one division) or portable rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import register

_REV = "l_extendedprice * (1 - l_discount)"
_REV_CENTS = f"CAST(floor(({_REV}) * 100 + 0.5) AS BIGINT)"


def _rev_cents_col() -> F.Column:
    return F.floor(F.expr(_REV) * 100 + F.lit(0.5)).cast("long")


# --------------------------------------------------------------- Q2
# Q2 probes p_size = N AND p_type LIKE '%BRASS'; the fixture's 6-value
# type domain x 50 sizes leaves ~6 parts per (size, type) — too thin
# to rank — so the probe keeps the size equality alone (~40 parts)
MIN_COST_SIZE = 15
MIN_COST_REGION = "EUROPE"


@register(
    "q_min_cost_supplier",
    oracle=f"""
    WITH eur AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = '{MIN_COST_REGION}'
    ), costs AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS cost_c
        FROM lineitem l
        JOIN eur e ON e.s_suppkey = l.l_suppkey
        GROUP BY l.l_partkey, l.l_suppkey
    ), best AS (
        SELECT l_partkey, min(cost_c) AS min_c
        FROM costs GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost, rank
    FROM (
        SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
               c.cost_c / 100.0 AS supply_cost,
               row_number() OVER (
                   ORDER BY e.s_acctbal DESC, p.p_partkey, e.s_name
               ) AS rank
        FROM costs c
        JOIN best b ON b.l_partkey = c.l_partkey AND c.cost_c = b.min_c
        JOIN eur e ON e.s_suppkey = c.l_suppkey
        JOIN part p ON p.p_partkey = c.l_partkey
        WHERE p.p_size = {MIN_COST_SIZE}
    ) t WHERE rank <= 10
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (minimum-cost supplier): for each qualifying part,
    the supplier in one region offering it at the groupwise-minimum
    cost, top-10 by account balance. The defining feature is the
    correlated scalar-min subquery (`ps_supplycost = (SELECT min(..)
    WHERE same part, region)`) — de-correlated here, as Catalyst
    would, into a per-part min aggregate joined back on
    (part, cost == min).

    Adaptation (no partsupp): "supply cost" is the minimum extended
    price the supplier ever shipped the part at, quantized to exact
    integer cents BEFORE the min so the equality rejoin compares
    integers, never floats.

    Scale: the region filter prunes suppliers before the fact
    aggregate builds (broadcast semi shape); the (part, supp) agg is
    map-side combinable on the scan; `best` is parts-sized and
    broadcasts back onto `costs`; part broadcasts. The global top-10
    ranks a tiny post-filter set."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == MIN_COST_REGION
    )
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    costs = (
        li.join(F.broadcast(eur.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price_c").alias("cost_c"))
    )
    best = costs.groupBy("l_partkey").agg(F.min("cost_c").alias("min_c"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") == MIN_COST_SIZE
    )
    hit = (
        costs.join(
            F.broadcast(best.withColumnRenamed("l_partkey", "b_partkey")),
            (costs.l_partkey == F.col("b_partkey"))
            & (costs.cost_c == F.col("min_c")),
        )
        .join(F.broadcast(eur), costs.l_suppkey == eur.s_suppkey)
        .join(F.broadcast(p), costs.l_partkey == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("cost_c") / 100.0).alias("supply_cost"),
        )
    )
    w = Window.orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
    return (
        hit.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "supply_cost", "rank",
        )
    )


# --------------------------------------------------------------- Q4
PRIORITY_LATE_DAYS = 30


@register(
    "q_order_priority_check",
    oracle=f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
                               + INTERVAL {PRIORITY_LATE_DAYS} DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape (order-priority checking): per priority class, how
    many of a quarter's orders had at least one line that shipped late
    — the correlated EXISTS whose subquery predicate references BOTH
    sides (l_shipdate vs the outer o_orderdate), which forces a
    LEFT SEMI join with a composite condition rather than a plain
    key-equality semi.

    Adaptation (no commit/receipt dates): "late" is shipped more than
    {PRIORITY_LATE_DAYS} days after the order was placed — the same
    definition q_waiting_suppliers (Q21) uses.

    Scale: the quarter filter prunes the orders scan; the semi join
    shuffles on the order key (the date comparison rides along as a
    residual conjunct — no extra exchange); output is a 5-row grid
    from a combinable count."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > o.o_orderdate + F.expr(f"INTERVAL {PRIORITY_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count")
    )


q_order_priority_check.__doc__ = q_order_priority_check.__doc__.format(
    PRIORITY_LATE_DAYS=PRIORITY_LATE_DAYS
)


# --------------------------------------------------------------- Q6
@register(
    "q_forecast_revenue",
    oracle="""
    SELECT
        CAST(count(*) AS BIGINT) AS n_items,
        sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                 AS BIGINT)) / CAST(100 AS DOUBLE) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape (forecasting revenue change): the revenue that
    would have been gained by eliminating small discounts on
    small-quantity orders in one year — the pure single-table
    filtered aggregate, TPC-H's scan-efficiency probe. Every predicate
    (date window, discount band, quantity bound) must reach the
    parquet scan as a pushed filter; the plan is scan -> combinable
    agg with NO exchange except the final 1-row reduce.

    Portability: the discount-band comparison reads the stored double
    against the same literal in both engines (no arithmetic, so no
    rounding hazard); the delta itself is exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    delta_c = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 100 + F.lit(0.5)
    ).cast("long")
    return li.agg(
        F.count("*").cast("long").alias("n_items"),
        (F.sum(delta_c) / F.lit(100).cast("double")).alias("revenue_delta"),
    )


# --------------------------------------------------------------- Q8
MKT_REGION = "ASIA"
MKT_NATION = "NATION_1"


@register(
    "q_market_share",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_REV_CENTS} AS rev_c,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = nc.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        WHERE r.r_name = '{MKT_REGION}'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           sum(CASE WHEN supp_nation = '{MKT_NATION}' THEN rev_c
                    ELSE 0 END) / CAST(100 AS DOUBLE) AS nation_revenue,
           sum(rev_c) / CAST(100 AS DOUBLE) AS total_revenue,
           floor(CAST(sum(CASE WHEN supp_nation = '{MKT_NATION}'
                               THEN rev_c ELSE 0 END) AS DOUBLE)
                 / sum(rev_c) * 10000 + 0.5) / 10000 AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape (national market share): within one region's
    customer orders, the share of revenue supplied by one nation, per
    order year — the 7-way join (nation joins TWICE, through the
    customer chain as a filter and through the supplier chain as the
    share dimension) feeding a conditional-aggregate ratio. Q8's
    original gates on a part type; with the region gate already
    exercising the filter chain the part hop is omitted — the
    double-role nation join IS the shape.

    Portability: numerator and denominator are exact integer cents;
    the share divides once at the end and portably rounds.

    Scale: the whole dimension chain (customer-side nation+region,
    supplier, supplier nation) broadcasts; lineitem and orders shuffle
    once each on the order key; the conditional agg is fully
    combinable onto a |years|-row grid. Customer joins via shuffle at
    100 TB (it is fact-sized); here AQE broadcasts it."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    nc = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == MKT_REGION)
    s = load_table(spark, sf_dir, "supplier")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cust_dim = (
        c.join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    sales = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_dim, o.o_custkey == cust_dim.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_cents_col().alias("rev_c"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == MKT_NATION, F.col("rev_c")).otherwise(
            F.lit(0).cast("long")
        )
    )
    den = F.sum("rev_c")
    share = F.floor(num.cast("double") / den * 10000 + F.lit(0.5)) / F.lit(10000)
    return sales.groupBy("o_year").agg(
        (num / F.lit(100).cast("double")).alias("nation_revenue"),
        (den / F.lit(100).cast("double")).alias("total_revenue"),
        share.alias("mkt_share"),
    )


# --------------------------------------------------------------- Q9
PROFIT_NAME_TOKEN = "bolt"  # Q9's p_name LIKE '%green%' stand-in
# cost model: half the part's retail price per unit (no partsupp
# supplycost in the fixture); profit is computed in 2x-tenth-milli-
# dollar integer units so the halving never leaves the integers
_PROFIT_UNITS = f"""
    2 * CAST(floor(({_REV}) * 10000 + 0.5) AS BIGINT)
    - CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
      * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
"""


@register(
    "q_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           sum(profit_u) / CAST(20000 AS DOUBLE) AS profit
    FROM (
        SELECT ns.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_PROFIT_UNITS} AS profit_u
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%{PROFIT_NAME_TOKEN}%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (product-type profit): profit on one product
    family, by supplier nation and order year — the infix-LIKE part
    filter (not prefix, so it cannot push as a range; it still prunes
    the broadcast build side) over a 5-way join with an arithmetic
    profit expression.

    Adaptation (no partsupp.ps_supplycost): unit cost is HALF the
    part's retail price. Profit stays integer end-to-end: revenue in
    tenth-milli-dollars x2, minus qty-hundredths x retail-cents
    (= tenth-milli-dollars x2 exactly), BIGINT-summed, divided by
    20000 once for presentation.

    Scale: part and supplier broadcast (part pruned by the LIKE
    first); lineitem/orders shuffle once on the order key; the agg
    reduces to a |nations| x |years| grid with map-side combine."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PROFIT_NAME_TOKEN)
    )
    s = load_table(spark, sf_dir, "supplier")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    profit_u = (
        F.lit(2).cast("long")
        * F.floor(F.expr(_REV) * 10000 + F.lit(0.5)).cast("long")
        - F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
        * F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit_u.alias("profit_u"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("profit_u") / F.lit(20000).cast("double")).alias("profit"))
    )


# --------------------------------------------------------------- Q11
# keep parts whose shipped value exceeds MEAN_NUM/MEAN_DEN x the mean
# part value (1.5x) — TPC-H scales Q11's fraction by SF for the same
# reason: a fixed fraction of the total returns nothing (or everything)
# as part cardinality grows; anchoring on the mean self-scales
MEAN_NUM, MEAN_DEN = 3, 2


@register(
    "q_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS val_c
        FROM lineitem GROUP BY l_partkey
    ), tot AS (
        SELECT CAST(sum(val_c) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS cnt
        FROM pv
    )
    SELECT l_partkey, val_c / CAST(100 AS DOUBLE) AS value
    FROM pv CROSS JOIN tot
    WHERE val_c * cnt * {MEAN_DEN} > {MEAN_NUM} * t
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape (important stock): parts whose aggregate shipped
    value exceeds a threshold derived from a GLOBAL scalar aggregate —
    the `HAVING sum(..) > (SELECT sum(..) * fraction)` shape: a 1-row
    global reduce gating a grouped aggregate.

    Adaptation (no partsupp): "value" is total shipped extended price
    per part instead of on-hand stock value, and the gate anchors on
    1.5x the MEAN part value rather than a fixed total fraction —
    TPC-H itself scales Q11's fraction by SF because a constant
    fraction of the total degenerates as part cardinality grows. The
    gate cross-multiplies exact cent integers
    (`val_c * n_parts * 2 > 3 * total_c`) — no float anywhere.

    Scale: one combinable per-part agg (keyed by the scan's own
    partkey), one 1-row reduce off its result (NOT a second fact
    scan), broadcast back as the gate. Output is the heavy tail above
    1.5x the mean."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    pv = (
        li.select("l_partkey", cents.alias("c"))
        .groupBy("l_partkey")
        .agg(F.sum("c").alias("val_c"))
    )
    tot = pv.agg(
        F.sum("val_c").cast("long").alias("t"),
        F.count("*").cast("long").alias("cnt"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val_c") * F.col("cnt") * F.lit(MEAN_DEN)
            > F.lit(MEAN_NUM) * F.col("t")
        )
        .select("l_partkey", (F.col("val_c") / 100.0).alias("value"))
    )


# --------------------------------------------------------------- Q12
SHIPMENT_LATE_DAYS = 60
_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "q_late_shipments",
    oracle=f"""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate
                         + INTERVAL {SHIPMENT_LATE_DAYS} DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (shipping-priority effect): among one year's
    LATE shipments, how many belonged to high- vs low-priority orders,
    split by a line attribute — the complementary conditional-count
    pair (`sum(CASE WHEN priority IN high)`, `sum(CASE WHEN NOT IN)`)
    whose two counts must partition every joined row exactly.

    Adaptation: no l_shipmode (grouped by l_linestatus instead) and no
    commit/receipt dates ("late" = shipped > {SHIPMENT_LATE_DAYS} days
    after order date, the q_waiting_suppliers definition).

    Scale: the ship-year window pushes into the lineitem scan; the
    join shuffles on the order key with the lateness comparison as a
    residual; output is a 2-row grid from a combinable conditional
    count."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {SHIPMENT_LATE_DAYS} DAYS")
    )
    is_high = F.col("o_orderpriority").isin(*_HIGH)
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, one).otherwise(zero)).alias("high_line_count"),
        F.sum(F.when(~is_high, one).otherwise(zero)).alias("low_line_count"),
    )


q_late_shipments.__doc__ = q_late_shipments.__doc__.format(
    SHIPMENT_LATE_DAYS=SHIPMENT_LATE_DAYS
)


# --------------------------------------------------------------- Q15
@register(
    "q_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT)) AS total_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY l_suppkey
    ), best AS (
        SELECT max(total_c) AS m FROM rev
    )
    SELECT s.s_suppkey, s.s_name,
           r.total_c / CAST(100 AS DOUBLE) AS total_revenue
    FROM rev r CROSS JOIN best b
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_c = b.m
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape (top supplier): the supplier(s) whose revenue
    over one window equals the GLOBAL maximum — Q15's revenue view +
    `total = (SELECT max(total) FROM view)` scalar subquery, the
    argmax-by-rejoin idiom. Ties return every maximal supplier in
    both engines identically because the compared totals are exact
    integer cents, never float sums.

    Scale: one combinable per-supplier agg over the pruned scan; the
    max is a 1-row reduce OF THE AGG (never a second fact pass),
    broadcast back as an equality gate; supplier broadcasts for the
    name."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.select("l_suppkey", _rev_cents_col().alias("c"))
        .groupBy("l_suppkey")
        .agg(F.sum("c").alias("total_c"))
    )
    best = rev.agg(F.max("total_c").alias("m"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_c") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c") / 100.0).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------- Q16
EXCLUDED_BRAND = "Brand#13"
COUNT_SIZES = (1, 9, 17, 25, 33, 41, 49)


@register(
    "q_supplier_part_count",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{EXCLUDED_BRAND}'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN ({", ".join(str(s) for s in COUNT_SIZES)})
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (parts/supplier relationship): how many DISTINCT
    suppliers ship each (brand, type, size) combination, excluding one
    brand, one type class, and a complained-about supplier set — the
    NOT-IN anti-join (safe here: s_suppkey is non-null) feeding a
    COUNT(DISTINCT) over a multi-attribute grid.

    Adaptation (no partsupp): the part-supplier association is the
    lineitem fact itself.

    Scale: the brand/type/size predicates prune the broadcast part
    build; the blacklist is supplier-subset-sized and broadcasts as a
    LEFT ANTI; count-distinct shuffles once on the full grouping key
    (Spark expands distinct aggregates to a two-phase plan
    automatically). The grid is |brands| x |types| x |sizes| bounded."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != EXCLUDED_BRAND)
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*COUNT_SIZES)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------- Q20
DOMINANT_PREFIX = "small"  # Q20's p_name LIKE 'forest%' stand-in


@register(
    "q_dominant_suppliers",
    oracle=f"""
    WITH pp AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '{DOMINANT_PREFIX}%'
    ), ps AS (
        SELECT l.l_partkey, l.l_suppkey,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS sq
        FROM lineitem l
        JOIN pp ON pp.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_partkey, l.l_suppkey
    ), pt AS (
        SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
        FROM ps GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS n_dominated
    FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.sq * 2 > pt.tq
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (potential part promotion): suppliers positioned
    to promote — those who, for at least one part in a name-prefixed
    family, shipped MORE THAN HALF of that part's total quantity in a
    year. Q20's nested `ps_availqty > 0.5 * (SELECT sum(l_quantity)
    ...)` correlated threshold becomes the per-(part, supplier) share
    vs the per-part total — two stacked aggregates where the second
    (pt) reduces the FIRST's output, never rescanning the fact.

    Adaptation (no partsupp.availqty): "dominance" is shipped-quantity
    share; the half threshold is the exact integer cross-multiply
    `sq * 2 > tq` on quantized hundredth-quantities.

    Scale: the name-prefix filter prunes the broadcast part side
    BEFORE the fact joins; (part, supp) agg is combinable; pt is
    parts-sized and broadcasts back; supplier broadcasts for names.
    Output is per-supplier counts of dominated parts."""
    pp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(DOMINANT_PREFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    q100 = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    ps = (
        li.join(F.broadcast(pp), li.l_partkey == pp.p_partkey)
        .select("l_partkey", "l_suppkey", q100.alias("q"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("sq"))
    )
    pt = ps.groupBy("l_partkey").agg(F.sum("sq").cast("long").alias("tq"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ps.join(
            F.broadcast(pt.withColumnRenamed("l_partkey", "t_partkey")),
            ps.l_partkey == F.col("t_partkey"),
        )
        .filter(F.col("sq") * F.lit(2) > F.col("tq"))
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("n_dominated"))
    )
