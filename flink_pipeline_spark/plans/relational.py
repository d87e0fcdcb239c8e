"""Relational operator queries (SURVEY.md §2.1-2.8, batch surface).

Each ``@register`` pairs the Spark DataFrame implementation with its
DuckDB oracle SQL. Conventions (functions/portable.py): double
aggregates rounded to 4; timestamps leave queries only as BIGINT epoch
seconds or DATE; every computed column aliased identically in both
engines.

Scale stance: everything here is built-in DataFrame API — filters and
projections push into the parquet scan, aggregations get map-side
partial agg, joins pick broadcast automatically for the dimension
tables (region/nation/supplier are tiny at any SF since TPC-H dims
scale sub-linearly), and AQE handles skew/coalescing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import literal_frame
from ..catalog import load_table
from ..functions.portable import epoch_s, money_sum, money_sum_sql, round_agg, round_sql
from ..sources.fixtures import fixture_df, fixture_values_sql
from .registry import register

# ---------------------------------------------------------------------------
# Flagship (M1): TPC-H-Q1-style pricing summary.
# Mirrors the reference's single-node baseline shape — scan -> filter ->
# derive -> group -> aggregate -> sort (reference baseline_workflow.py:169-205)
# on the lineitem fact table.
# ---------------------------------------------------------------------------


@register(
    "q_flagship",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {round_sql('sum(l_quantity)')} AS sum_qty,
           {money_sum_sql('l_extendedprice')} AS sum_base_price,
           {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {round_sql('avg(l_quantity)')} AS avg_qty,
           {round_sql('avg(l_extendedprice)')} AS avg_price,
           {round_sql('avg(l_discount)')} AS avg_disc,
           count(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_agg(F.sum("l_quantity")).alias("sum_qty"),
            # money TOTALS sum in exact integer cents (money_sum):
            # a double sum's order error grows ~sqrt(n) — scale-2
            # rounding was measured flipping at sf0.1 and would re-break
            # at higher SFs; integer cents removes the class entirely
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            round_agg(F.avg("l_quantity")).alias("avg_qty"),
            round_agg(F.avg("l_extendedprice")).alias("avg_price"),
            round_agg(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# §2.2 Filters (F-rows)
# ---------------------------------------------------------------------------


@register(
    "q_filter_prefix_suffix",
    oracle=f"""
    SELECT filename
    FROM {fixture_values_sql('read_files')}
    WHERE lower(filename) LIKE '%.fastq.gz'
      AND lower(filename) NOT LIKE 'undetermined%'
    """,
)
def q_filter_prefix_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ``*.fastq.gz``, drop ``undetermined*`` (case-insensitive) —
    reference baseline_workflow.py:97-99."""
    rf = fixture_df(spark, "read_files")
    low = F.lower(F.col("filename"))
    return rf.filter(low.endswith(".fastq.gz") & ~low.startswith("undetermined"))


@register(
    "q_filter_blacklist",
    oracle=f"""
    SELECT name
    FROM {fixture_values_sql('file_listing')}
    WHERE kind = 'directory'
      AND substr(regexp_extract(name, '([^/]+)$', 1), 1, 1) <> '_'
      AND lower(name) NOT LIKE '%unknown%'
      AND lower(name) NOT LIKE '%undetermined%'
    """,
)
def q_filter_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-name blacklist: skip names starting '_' or containing
    unknown/undetermined — reference workflow.py:398-405."""
    fl = fixture_df(spark, "file_listing")
    base = F.regexp_extract(F.col("name"), r"([^/]+)$", 1)
    low = F.lower(F.col("name"))
    return (
        fl.filter(
            (F.col("kind") == "directory")
            & (F.substring(base, 1, 1) != "_")
            & ~low.contains("unknown")
            & ~low.contains("undetermined")
        ).select("name")
    )


@register(
    "q_filter_small_files",
    oracle=f"""
    SELECT name, size
    FROM {fixture_values_sql('file_listing')}
    WHERE kind = 'file' AND name LIKE '%.gz' AND size < 30
    """,
)
def q_filter_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-chunk prune predicate (<30 B gz) — reference workflow.py:368."""
    fl = fixture_df(spark, "file_listing")
    return fl.filter(
        (F.col("kind") == "file") & F.col("name").endswith(".gz") & (F.col("size") < 30)
    ).select("name", "size")


@register(
    "q_filter_contains",
    oracle=f"""
    SELECT line FROM {fixture_values_sql('log_lines')}
    WHERE line LIKE '%Flink session%'
    """,
)
def q_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-membership filter — reference workflow.py:328."""
    return (
        fixture_df(spark, "log_lines")
        .filter(F.col("line").contains("Flink session"))
        .select("line")
    )


@register(
    "q_filter_rlike",
    oracle=f"""
    SELECT line FROM {fixture_values_sql('log_lines')}
    WHERE regexp_matches(line, '^application_[0-9]+_[0-9]+')
    """,
)
def q_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex sanity filter on app ids — reference workflow.py:329."""
    return (
        fixture_df(spark, "log_lines")
        .filter(F.col("line").rlike(r"^application_[0-9]+_[0-9]+"))
        .select("line")
    )


@register(
    "q_filter_range",
    oracle=f"""
    SELECT {money_sum_sql('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates (TPC-H-Q6 flavor): the validation-range analog of
    reference workflow.py:104-117. All four predicates push into the
    parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            # global money total: exact integer cents (q_flagship note)
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# §2.8 Scalar functions (S-rows)
# ---------------------------------------------------------------------------


@register(
    "q_split_extract",
    oracle=f"""
    SELECT filename,
           string_split(filename, '_')[1] AS sample,
           string_split(filename, '_')[2] AS snum,
           string_split(filename, '_')[3] AS lane,
           string_split(filename, '_')[4] AS read,
           regexp_extract(filename, '_([0-9]+)\\.fastq\\.gz$', 1) AS chunk
    FROM {fixture_values_sql('read_files')}
    WHERE lower(filename) LIKE '%.fastq.gz'
    """,
)
def q_split_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename-grammar schema recovery
    ``<sample>_S<k>_L<lane>_R<1|2>_<chunk>.fastq.gz`` — reference
    baseline_workflow.py:109-117."""
    rf = fixture_df(spark, "read_files").filter(
        F.lower(F.col("filename")).endswith(".fastq.gz")
    )
    parts = F.split(F.col("filename"), "_")
    return rf.select(
        "filename",
        parts.getItem(0).alias("sample"),
        parts.getItem(1).alias("snum"),
        parts.getItem(2).alias("lane"),
        parts.getItem(3).alias("read"),
        F.regexp_extract(F.col("filename"), r"_([0-9]+)\.fastq\.gz$", 1).alias("chunk"),
    )


@register(
    "q_case_fold",
    oracle="""
    SELECT n_name, lower(n_name) AS lo, upper(lower(n_name)) AS up
    FROM nation
    """,
)
def q_case_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper — reference baseline_workflow.py:98, workflow.py:182-185."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.lower("n_name").alias("lo"),
        F.upper(F.lower("n_name")).alias("up"),
    )


@register(
    "q_regexp_extract",
    oracle=f"""
    SELECT regexp_extract(line, '(application_[0-9]+_[0-9]+)', 1) AS app_id
    FROM {fixture_values_sql('log_lines')}
    WHERE regexp_matches(line, 'application_[0-9]+_[0-9]+')
    """,
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """App-id regex group extraction — reference workflow.py:161-170."""
    ll = fixture_df(spark, "log_lines")
    return ll.filter(F.col("line").rlike(r"application_[0-9]+_[0-9]+")).select(
        F.regexp_extract(F.col("line"), r"(application_[0-9]+_[0-9]+)", 1).alias("app_id")
    )


@register(
    "q_log_metrics",
    oracle=f"""
    SELECT regexp_extract(line, 'Seconds for ([a-z ]+):', 1) AS phase,
           CAST(regexp_extract(line, '([0-9]+\\.[0-9]+)', 1) AS DOUBLE) AS secs
    FROM {fixture_values_sql('log_lines')}
    WHERE line LIKE 'Seconds for %'
    """,
)
def q_log_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log scraping: typed metric extraction from semi-structured lines —
    reference experiment.py:42-61."""
    ll = fixture_df(spark, "log_lines")
    return ll.filter(F.col("line").startswith("Seconds for ")).select(
        F.regexp_extract(F.col("line"), r"Seconds for ([a-z ]+):", 1).alias("phase"),
        F.regexp_extract(F.col("line"), r"([0-9]+\.[0-9]+)", 1)
        .cast("double")
        .alias("secs"),
    )


@register(
    "q_trim",
    oracle="""
    SELECT trim(x) AS t, rtrim(x) AS r, ltrim(x) AS l,
           regexp_replace(x, '/+$', '') AS no_slash
    FROM (VALUES ('  hello  '), ('world   '), ('   spark'), ('path/to/dir///'), ('clean')) AS t(x)
    """,
)
def q_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strip/rstrip analogs — reference workflow.py:181-185, 251-252."""
    rows = [("  hello  ",), ("world   ",), ("   spark",), ("path/to/dir///",), ("clean",)]
    df = literal_frame(spark, rows, "x STRING")
    return df.select(
        F.trim("x").alias("t"),
        F.rtrim("x").alias("r"),
        F.ltrim("x").alias("l"),
        F.regexp_replace("x", "/+$", "").alias("no_slash"),
    )


@register(
    "q_concat_format",
    oracle="""
    SELECT concat(c_name, '_', c_mktsegment) AS tag,
           concat_ws('/', 'out', c_mktsegment, c_name) AS path,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key
    FROM customer
    """,
)
def q_concat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat / path-join / zero-pad formatting — reference
    workflow.py:492, experiment.py:64,156."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.concat(F.col("c_name"), F.lit("_"), F.col("c_mktsegment")).alias("tag"),
        F.concat_ws("/", F.lit("out"), F.col("c_mktsegment"), F.col("c_name")).alias(
            "path"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


@register(
    "q_basename",
    oracle=f"""
    SELECT name, regexp_extract(name, '([^/]+)$', 1) AS base,
           regexp_replace(name, '/[^/]+$', '') AS dir
    FROM {fixture_values_sql('file_listing')}
    """,
)
def q_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """basename/dirname — reference workflow.py:449, 492, 496."""
    fl = fixture_df(spark, "file_listing")
    return fl.select(
        "name",
        F.regexp_extract("name", r"([^/]+)$", 1).alias("base"),
        F.regexp_replace("name", r"/[^/]+$", "").alias("dir"),
    )


@register(
    "q_cast",
    oracle=f"""
    SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_back,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           {round_sql('CAST(o_orderkey AS DOUBLE) / 7')} AS key_frac
    FROM orders
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric/string casts — reference experiment.py:54,58, workflow.py:211.
    Note: double->int goes through floor() because bare CAST rounds in
    DuckDB but truncates in Spark."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_back"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        round_agg(F.col("o_orderkey").cast("double") / 7).alias("key_frac"),
    )


@register(
    "q_arith",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {round_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charge,
           CAST(l_quantity AS BIGINT) % 8 AS qty_mod,
           l_orderkey * 4 + l_linenumber AS derived_id
    FROM lineitem
    """,
)
def q_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic: scaling, modulo cadence, derived ids — reference
    workflow.py:253, 456, 546-548. Operands kept non-negative so %
    agrees across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round_agg(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity").cast("long") % 8).alias("qty_mod"),
        (F.col("l_orderkey") * 4 + F.col("l_linenumber")).alias("derived_id"),
    )


@register(
    "q_time_funcs",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_bucket
    FROM events
    """,
)
def q_time_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp functions — reference workflow.py:523-548 timing stamps.
    Timestamps leave as BIGINT epoch seconds (ns/us parity, FIXTURES.md)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        epoch_s("ts").alias("epoch_sec"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        epoch_s(F.date_trunc("hour", F.col("ts"))).alias("hour_bucket"),
    )


@register(
    "q_like_glob",
    oracle=f"""
    SELECT filename
    FROM {fixture_values_sql('read_files')}
    WHERE filename LIKE 'DNA16-%'
      AND filename LIKE '%R1%'
      AND filename LIKE '%.fastq.gz'
    """,
)
def q_like_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glob translated to LIKE — reference workflow.py:71 (fnmatch jar
    discovery), baseline_workflow.py:76."""
    rf = fixture_df(spark, "read_files")
    return rf.filter(
        F.col("filename").like("DNA16-%")
        & F.col("filename").like("%R1%")
        & F.col("filename").like("%.fastq.gz")
    )


@register(
    "q_isin",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    GROUP BY o_orderstatus
    """,
)
def q_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set membership — reference workflow.py:187-190 (state enum check)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_array_ops",
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           {round_sql('CAST(embedding[1] AS DOUBLE)')} AS first_val,
           {round_sql('list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))')} AS vec_sum
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column — the pair-of-lists data
    model analog (reference baseline_workflow.py:107,137-138)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round_agg(F.col("embedding").getItem(0).cast("double")).alias("first_val"),
        round_agg(
            F.expr(
                "aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
            )
        ).alias("vec_sum"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string — SURVEY.md S15."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "q_when_otherwise",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN 'returned'
                WHEN l_returnflag = 'A' THEN 'accepted'
                ELSE 'other' END AS flag_desc,
           coalesce(CASE WHEN l_discount > 0 THEN {round_sql('l_discount')} END, 0.0) AS disc_or_zero
    FROM lineitem
    """,
)
def q_when_otherwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null handling — the if/elif/else filename-grammar
    branch (reference baseline_workflow.py:111-116) and
    ``retcode or None`` (workflow.py:150-155)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_returnflag") == "A", "accepted")
        .otherwise("other")
        .alias("flag_desc"),
        F.coalesce(
            F.when(F.col("l_discount") > 0, round_agg(F.col("l_discount"))), F.lit(0.0)
        ).alias("disc_or_zero"),
    )


# Snapshot-diff simulation knobs: deterministic per-doc fates for the
# synthetic "next snapshot" (delete / modify / add), keyed on salted
# hash56 so both engines derive the identical v2.
_DIFF_DEL_MOD = 19
_DIFF_MOD_MOD = 13
_DIFF_ADD_MOD = 29
_DIFF_ADD_OFFSET = 20_000_000


def _snapshot_versions_cte() -> str:
    """Shared v1/v2 snapshot-simulation CTEs (q_snapshot_diff AND
    q_cdc_apply compose this text, so the two queries can never fork
    their simulated change set)."""
    from ..functions.portable import hash56_sql_duckdb

    h = lambda salt: hash56_sql_duckdb(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    return f"""v1 AS (
        SELECT doc_id, source, text FROM documents
    ), v2 AS (
        SELECT doc_id, source,
               CASE WHEN {h('mod')} % {_DIFF_MOD_MOD} = 0
                    THEN text || ' rev' ELSE text END AS text
        FROM documents
        WHERE {h('del')} % {_DIFF_DEL_MOD} <> 0
        UNION ALL
        SELECT doc_id + {_DIFF_ADD_OFFSET}, source, text || ' new'
        FROM documents
        WHERE {h('add')} % {_DIFF_ADD_MOD} = 0
    )"""


def _snapshot_diff_sql() -> str:
    return f"""
    WITH {_snapshot_versions_cte()}, joined AS (
        SELECT coalesce(a.source, b.source) AS source,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
    )
    SELECT source, status, CAST(count(*) AS BIGINT) AS n
    FROM joined GROUP BY source, status
    """



def _snapshot_versions(spark: SparkSession, sf_dir: str):
    """Spark-side twin of _snapshot_versions_cte(): (v1, v2) snapshot
    DataFrames from the same deterministic per-doc fates. Shared by
    q_snapshot_diff (classification) and q_cdc_apply (merge-apply)."""
    from ..functions.portable import hash56

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def h(salt: str):
        return hash56(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))

    v1 = d
    v2 = d.filter(h("del") % _DIFF_DEL_MOD != 0).select(
        "doc_id",
        "source",
        F.when(
            h("mod") % _DIFF_MOD_MOD == 0, F.concat("text", F.lit(" rev"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        d.filter(h("add") % _DIFF_ADD_MOD == 0).select(
            (F.col("doc_id") + _DIFF_ADD_OFFSET).alias("doc_id"),
            "source",
            F.concat("text", F.lit(" new")).alias("text"),
        )
    )
    return v1, v2


@register("q_snapshot_diff", oracle=_snapshot_diff_sql())
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot DIFF — the lakehouse change report (what Delta's
    change-data-feed gives you for free, computed here from data for
    the tables that don't have one): full-outer key join of two
    snapshot versions + content-digest compare, classifying every row
    added / removed / changed / unchanged, rolled up per source. The
    v2 snapshot is derived deterministically from v1 (delete where
    hash56('del:'||id) % 19 == 0, append-edit where % 13 == 0, insert
    a new doc where % 29 == 0), so the oracle replays the whole
    simulation — in production v2 is simply the next day's table and
    only the join+digest machinery remains.

    Scale: ONE full-outer shuffle join on the snapshot key (both sides
    hash-partitioned; this is the one unavoidable data movement of any
    diff) with the md5 digest computed in the scan projection — the
    compare never carries full text through the join when columns are
    pruned to (key, digest, source). Counts are map-side combined."""
    v1, v2 = _snapshot_versions(spark, sf_dir)
    a = v1.select(
        "doc_id",
        F.col("source").alias("src_a"),
        F.md5("text").alias("dg_a"),
    )
    b = v2.select(
        "doc_id",
        F.col("source").alias("src_b"),
        F.md5("text").alias("dg_b"),
    )
    joined = a.join(b, "doc_id", "full_outer").select(
        F.coalesce("src_a", "src_b").alias("source"),
        F.when(F.col("dg_a").isNull(), "added")
        .when(F.col("dg_b").isNull(), "removed")
        .when(F.col("dg_a") != F.col("dg_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return joined.groupBy("source", "status").agg(
        F.count("*").cast("long").alias("n")
    )


@register(
    "q_cdc_apply",
    oracle=f"""
    WITH {_snapshot_versions_cte()}
    SELECT doc_id, source, md5(text) AS digest FROM v2
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY / keyed MERGE (the closer q_snapshot_diff was
    missing): derive the insert/update/delete change set between the
    v1 and v2 snapshots exactly as the diff does, then APPLY it back
    to v1 with MERGE INTO semantics (operators/merge.py merge_into —
    one full-outer key-equi join, per-column post-image CASE, no
    windows) and emit the merged table's (key, source, digest). The
    oracle is simply the simulated v2 snapshot — so the gate proves
    merge(v1, diff(v1, v2)) == v2 row-for-row, the round-trip identity
    that makes a diff+apply pipeline trustworthy.

    Scale: two shuffles total — the diff's full-outer join on the key
    and the merge's full-outer join on the same key (in production the
    change set ARRIVES as CDC, leaving only the merge join, whose
    change side AQE broadcast-joins when a day's churn measures small
    against the base)."""
    from ..operators.merge import merge_into

    v1, _ = _snapshot_versions(spark, sf_dir)
    merged = merge_into(v1, cdc_changes(spark, sf_dir), ["doc_id"])
    return merged.select("doc_id", "source", F.md5("text").alias("digest"))


def cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, op, source, text): the insert/update/delete change set
    between the simulated v1 and v2 snapshots — q_cdc_apply's feed,
    shared with the streaming deployment form (streaming/merge.py) so
    the stream==batch equivalence tests exercise the identical feed."""
    v1, v2 = _snapshot_versions(spark, sf_dir)
    a = v1.select("doc_id", F.md5("text").alias("dg_a"))
    b = v2.select(
        "doc_id",
        F.col("source").alias("src_b"),
        F.col("text").alias("txt_b"),
        F.md5("text").alias("dg_b"),
    )
    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("dg_a").isNull(), "insert")
            .when(F.col("dg_b").isNull(), "delete")
            .when(F.col("dg_a") != F.col("dg_b"), "update")
            .alias("op"),
            F.col("src_b").alias("source"),
            F.col("txt_b").alias("text"),
        )
        .filter(F.col("op").isNotNull())
    )
