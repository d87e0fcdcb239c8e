"""Join operators (SURVEY.md §2.3).

Scale notes baked into each query:
  * dimension sides (region/nation/band tables/sample sheets) are
    broadcast — at 100 TB the fact side never shuffles for these.
  * the pair join (J1) shuffles both sides on the composite key; at
    scale the two inputs would be bucketed on (sample, lane, chunk)
    to co-locate without a shuffle.
  * the as-of join (J5) is deliberately NOT an O(n*m) join-then-filter:
    it is a single window pass (sort within user partition), which is
    the only formulation that survives 100x event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import literal_frame
from ..catalog import load_table
from ..functions.portable import money_sum, money_sum_sql, round_agg, round_sql
from ..operators.filename import parse_read_files, parsed_read_files_sql
from ..sources.fixtures import fixture_df, fixture_values_sql
from .registry import register


@register(
    "q_pair_join",
    oracle=f"""
    WITH {parsed_read_files_sql()}
    SELECT r1.sample, r1.lane, r1.chunk,
           r1.filename AS r1_file, r2.filename AS r2_file
    FROM (SELECT * FROM parsed WHERE read = 'R1') r1
    JOIN (SELECT * FROM parsed WHERE read = 'R2') r2
      ON r1.sample = r2.sample AND r1.lane = r2.lane AND r1.chunk = r2.chunk
    """,
)
def q_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1<->R2 pair join on (sample, lane, chunk) — the one real join in
    the reference (sorted positional zip, baseline_workflow.py:107-117,
    137-144), expressed as the equi-join it implicitly is."""
    parsed = parse_read_files(fixture_df(spark, "read_files"))
    r1 = parsed.filter(F.col("read") == "R1").select(
        "sample", "lane", "chunk", F.col("filename").alias("r1_file")
    )
    r2 = parsed.filter(F.col("read") == "R2").select(
        "sample", "lane", "chunk", F.col("filename").alias("r2_file")
    )
    return r1.join(r2, ["sample", "lane", "chunk"], "inner")


@register(
    "q_broadcast_lookup",
    oracle="""
    SELECT n_name, coalesce(r.r_name, 'Undetermined') AS region_name
    FROM nation n
    LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 3) r
      ON n.n_regionkey = r.r_regionkey
    """,
)
def q_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demultiplex lookup: broadcast join against a small 'sample sheet'
    with 'Undetermined' fallback — reference workflow.py:375-378,
    398-405. The lookup side is broadcast; the probe side never moves."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") < 3)
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "n_name", F.coalesce(F.col("r_name"), F.lit("Undetermined")).alias("region_name")
        )
    )


@register(
    "q_join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           {money_sum_sql('o.o_totalprice')} AS total_price
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join fact->dim then aggregate. Customer is the small
    side at any SF ratio — Catalyst broadcasts it under AQE."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the set-subtraction semantics of the
    reference's Undetermined/empty-output cleanup (workflow.py:360-378).
    The price threshold keeps the result non-empty at every SF (a bare
    anti on custkey is empty: all customers have orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_anti_join_cleanup",
    oracle=f"""
    WITH listing AS (SELECT * FROM {fixture_values_sql('file_listing')}),
    bad AS (
        SELECT name FROM listing
        WHERE lower(name) LIKE '%undetermined%'
           OR lower(name) LIKE '%unknown%'
           OR regexp_extract(name, '([^/]+)$', 1) LIKE '\\_%' ESCAPE '\\'
           OR (kind = 'file' AND name LIKE '%.gz' AND size < 30)
    )
    SELECT l.name, l.kind, l.size
    FROM listing l
    LEFT JOIN bad b ON l.name = b.name OR starts_with(l.name, b.name || '/')
    WHERE b.name IS NULL AND l.name LIKE 'hdfs://%'
    """,
)
def q_anti_join_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset cleanup as an anti-join: subtract Undetermined/unknown/
    underscore/empty entries (and their children) from the listing that
    flows downstream, guarded to hdfs:// paths — reference
    workflow.py:360-378 + the must-be-hdfs delete guard (369-370)."""
    listing = fixture_df(spark, "file_listing")
    base = F.regexp_extract(F.col("name"), r"([^/]+)$", 1)
    low = F.lower(F.col("name"))
    bad = listing.filter(
        low.contains("undetermined")
        | low.contains("unknown")
        | base.startswith("_")
        | ((F.col("kind") == "file") & F.col("name").endswith(".gz") & (F.col("size") < 30))
    ).select(F.col("name").alias("bad_name"))
    cond = (F.col("name") == F.col("bad_name")) | F.col("name").startswith(
        F.concat(F.col("bad_name"), F.lit("/"))
    )
    return (
        listing.join(F.broadcast(bad), cond, "left_anti")
        .filter(F.col("name").startswith("hdfs://"))
        .select("name", "kind", "size")
    )


@register(
    "q_join_range",
    oracle=f"""
    SELECT b.band, count(*) AS n, {round_sql('sum(l.l_quantity)')} AS qty
    FROM lineitem l
    JOIN (VALUES ('small', 0, 10), ('medium', 10, 25), ('large', 25, 60))
         AS b(band, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a broadcast band table. At scale the
    band side is always tiny -> broadcast nested loop stays O(n*bands)
    with no shuffle of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = literal_frame(spark,
        [("small", 0, 10), ("medium", 10, 25), ("large", 25, 60)],
        "band STRING, lo INT, hi INT",
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), round_agg(F.sum("l_quantity")).alias("qty"))
    )


@register(
    "q_join_asof",
    oracle=f"""
    WITH ordered AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
               {round_sql('value')} AS value,
               last_value(CASE WHEN event_type = 'purchase'
                               THEN CAST(floor(epoch(ts)) AS BIGINT) END IGNORE NULLS)
                   OVER w AS asof_purchase_ts,
               last_value(CASE WHEN event_type = 'purchase'
                               THEN {round_sql('value')} END IGNORE NULLS)
                   OVER w AS asof_purchase_val
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts_s, asof_purchase_ts, asof_purchase_val
    FROM ordered WHERE event_type = 'click'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click enriched with the latest purchase at or
    before it (same user). Implemented as one sorted window pass over
    the union — O(n log n) within partitions, no join blow-up; this is
    the formulation that scales (the join-then-max alternative is
    quadratic per hot user)."""
    e = load_table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts").cast("long")
    base = e.select(
        "event_id",
        "user_id",
        "event_type",
        ts_s.alias("ts_s"),
        round_agg(F.col("value")).alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_purchase = F.col("event_type") == "purchase"
    enriched = base.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_s",
        F.last(F.when(is_purchase, F.col("ts_s")), ignorenulls=True)
        .over(w)
        .alias("asof_purchase_ts"),
        F.last(F.when(is_purchase, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("asof_purchase_val"),
    )
    return enriched.filter(F.col("event_type") == "click").drop("event_type")


@register(
    "q_join_full_outer",
    oracle="""
    WITH cu AS (
        SELECT c_nationkey AS nk, count(*) AS n_cust
        FROM customer WHERE c_nationkey >= 5 GROUP BY 1
    ), su AS (
        SELECT s_nationkey AS nk, count(*) AS n_supp
        FROM supplier WHERE s_nationkey < 10 GROUP BY 1
    )
    SELECT coalesce(cu.nk, su.nk) AS nationkey,
           coalesce(cu.n_cust, 0) AS n_cust,
           coalesce(su.n_supp, 0) AS n_supp
    FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation: per-nation customer counts against
    per-nation supplier counts, keeping nations present on either side
    only. The two sides are deliberately key-disjoint at the edges
    (customers from nation >= 5, suppliers from nation < 10 — the
    fixture populates every nation on both dims at sf >= 0.01), so
    both null sides are genuinely exercised at every SF. Completes the
    join-type matrix (inner/left/semi/anti/range/as-of/full).

    Scale: both inputs are pre-aggregated to #nations rows BEFORE the
    full outer — the reconciliation pattern that keeps a full-outer
    join (which can never broadcast its nullable sides away) off the
    fact tables entirely."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") >= 5)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 10)
    cu = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count("*").alias("n_cust")
    )
    su = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count("*").alias("n_supp")
    )
    return cu.join(su, cu.nk_c == su.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


SALT_BUCKETS = 8  # replication factor for the skew-salted join demo


@register(
    "q_join_skew_salted",
    oracle=f"""
    SELECT c.c_mktsegment,
           {money_sum_sql('o.o_totalprice')} AS total_value,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEW-SALTED join: the replicate-and-salt technique for equi-joins
    whose key distribution concentrates on a few hot values (one
    mega-customer owning 30% of orders melts the single reducer that
    key hashes to). The fact side gets a deterministic salt
    (pmod(o_orderkey, {SALT_BUCKETS}) — derived from the row identity,
    never rand(), so retries and both engines agree), the dimension
    side is exploded {SALT_BUCKETS}x with every salt value, and the
    join key becomes (custkey, salt): each hot key now spreads over
    {SALT_BUCKETS} reducers. The oracle is the PLAIN join — salting
    must be invisible in the result, and the hash gate proves it.

    Complements q_skew_salted_agg (salted two-phase aggregation) with
    the JOIN half of the skew playbook. AQE's skewedJoin handles this
    automatically when statistics surface the skew at runtime; manual
    salting remains the tool when the skew is known ahead of time or
    the join is sort-merge. Cost: the dimension side is replicated
    {SALT_BUCKETS}x — only ever worth it for dimension-sized builds.

    Scale: fact shuffles once on the salted composite key; the
    replicated dimension shuffles {SALT_BUCKETS}x its (small) size;
    the agg is map-side combinable; money totals in exact integer
    cents."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.pmod(F.col("o_orderkey"), F.lit(SALT_BUCKETS)).alias("salt"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.explode(
            F.array(*[F.lit(i) for i in range(SALT_BUCKETS)])
        ).alias("salt"),
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            money_sum(F.col("o_totalprice")).alias("total_value"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


q_join_skew_salted.__doc__ = q_join_skew_salted.__doc__.format(
    SALT_BUCKETS=SALT_BUCKETS
)
