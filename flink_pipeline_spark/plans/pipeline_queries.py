"""Pipeline-façade queries (SURVEY.md SNK1/SNK2/U1): partitioned demux
write, append-CSV and ORC roundtrips, and the per-sample grouped transform —
side-effecting operators made oracle-checkable by returning their
read-back results.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import money_sum, money_sum_sql, round_agg, hash56_sql_duckdb, round_sql
from ..pipeline import P31, SAM_SCHEMA, fake_align
from ..sources.fixtures import fixture_df, fixture_values_sql
from .registry import register


def _tmpdir(prefix: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{uuid.uuid4().hex[:8]}")


@register(
    "q_partitioned_write",
    oracle=f"""
    SELECT sample, count(*) AS n_pairs
    FROM {fixture_values_sql('read_pairs')}
    WHERE lower(sample) <> 'undetermined'
      AND substr(sample, 1, 1) <> '_'
      AND length(seq1) >= 1 AND length(seq2) >= 1
    GROUP BY sample
    """,
)
def q_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demultiplexed partitioned sink (SNK1, reference workflow.py:252,
    398-405) with in-stream pruning (ST5): write partitionBy(sample),
    read back partition-pruned, return per-sample counts."""
    out = _tmpdir("demux")
    pairs = fixture_df(spark, "read_pairs").filter(
        (F.lower(F.col("sample")) != "undetermined")
        & ~F.col("sample").startswith("_")
        & (F.length("seq1") >= 1)
        & (F.length("seq2") >= 1)
    )
    pairs.write.partitionBy("sample").mode("errorifexists").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("sample").agg(F.count("*").alias("n_pairs"))


@register(
    "q_csv_roundtrip",
    oracle=f"""
    SELECT repeat_num, count(*) AS n,
           {round_sql('sum(total_secs)')} AS secs
    FROM {fixture_values_sql('attempts')}
    GROUP BY repeat_num
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-CSV sink with header (SNK2, reference experiment.py:259-281,
    332-336): write the attempts table as headered CSV, read it back
    with an explicit schema, aggregate."""
    out = _tmpdir("results_csv")
    a = fixture_df(spark, "attempts")
    a.write.option("header", True).mode("overwrite").csv(out)
    back = (
        spark.read.option("header", True)
        .schema(
            "repeat_num INT, attempt_num INT, retcode INT, log_file STRING, "
            "total_secs DOUBLE, bcl_secs DOUBLE, align_secs DOUBLE"
        )
        .csv(out)
    )
    return back.groupBy("repeat_num").agg(
        F.count("*").alias("n"),
        round_agg(F.sum("total_secs")).alias("secs"),
    )


def _sam_oracle() -> str:
    h1 = hash56_sql_duckdb("seq1")
    h2 = hash56_sql_duckdb("seq2")
    return f"""
    WITH rp AS (SELECT * FROM {fixture_values_sql('read_pairs')})
    SELECT read_id AS qname, 0 AS flag, sample AS rname,
           (({h1} % {P31}) % 100000) AS pos,
           CAST(60 - (length(seq1) % 10) AS INT) AS mapq,
           concat(length(seq1), 'M') AS cigar
    FROM rp
    UNION ALL
    SELECT read_id, 16, sample,
           (({h2} % {P31}) % 100000),
           CAST(60 - (length(seq2) % 10) AS INT),
           concat(length(seq2), 'M')
    FROM rp
    """


@register("q_grouped_transform", oracle=_sam_oracle())
def q_grouped_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-sample aligner as a grouped pandas transform (U1,
    reference workflow.py:483-503 / baseline_workflow.py:136-147):
    PRQ pairs -> SAM-shaped rows, 1 pair -> 2 mates. The fake aligner
    is arithmetically mirrored by the oracle SQL, so even the
    applyInPandas path is hash-checked."""
    pairs = fixture_df(spark, "read_pairs")
    return pairs.groupBy("sample").applyInPandas(fake_align, schema=SAM_SCHEMA)


def bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Write orders and lineitem as bucketed+sorted tables on their
    join key and return the bucket-aware readbacks. Bucketing is the
    100 TB layout decision this engine standardizes on for repeated
    fact-to-fact joins: both sides hash-clustered into the same bucket
    count at WRITE time, so every later join/agg on the key reuses the
    on-disk clustering instead of re-shuffling the corpus per query.
    sortBy pre-sorts each bucket file, so the remaining per-bucket
    sort merges sorted runs instead of sorting raw data. Table names
    carry a uuid: each invocation gets fresh external tables under
    /tmp (the in-memory catalog entry is session-scoped; the driver's
    bare session works the same way)."""
    tag = uuid.uuid4().hex[:8]
    out = _tmpdir(f"bucketed_{tag}")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ot, lt = f"b_orders_{tag}", f"b_lineitem_{tag}"
    (
        o.write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(out, "orders"))
        .mode("errorifexists")
        .saveAsTable(ot)
    )
    (
        l.write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(out, "lineitem"))
        .mode("errorifexists")
        .saveAsTable(lt)
    )
    return spark.table(ot), spark.table(lt)


@register(
    "q_bucketed_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-to-fact join over bucketed storage: orders and
    lineitem are written bucketBy(8, orderkey) + sortBy, then joined
    with a merge hint — the exchange is eliminated on BOTH sides
    (tests/test_plans.py asserts no Exchange under the SortMergeJoin)
    because the on-disk bucketing already satisfies the join's
    distribution requirement. A Sort node remains (a bucket may span
    several files, one per writer task, so Spark must merge them) but
    it sorts already-sorted runs per bucket, not a shuffled corpus.
    The only shuffle in the whole query is the final tiny per-priority
    rollup. The merge hint keeps
    the demonstration honest at sf0.01 (AQE would otherwise broadcast
    the small side and skip the bucketed path entirely)."""
    bo, bl = bucketed_tables(spark, sf_dir)
    j = bo.hint("merge").join(
        bl.hint("merge"), bo.o_orderkey == bl.l_orderkey
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        # money total in exact integer cents (money_sum): the 4th
        # decimal of this ~1e10 double sum was the first measured flip
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


@register(
    "q_orc_roundtrip",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           {round_sql('sum(value)')} AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-sink format breadth beyond parquet (the SNK family,
    SURVEY.md §2.1): write the events fact to ORC (Spark's second
    native columnar format — predicate pushdown, column pruning and
    vectorized read all apply), read it back, aggregate. The oracle
    computes the same aggregate from the parquet fixture, so the gate
    proves the ORC write+read is value-lossless (timestamps, doubles,
    strings survive the format roundtrip).

    Scale: format conversion is a map-only rewrite (no shuffle); the
    read-back aggregate has the same partial/merge plan as any scan."""
    out = _tmpdir("events_orc")
    e = load_table(spark, sf_dir, "events")
    e.write.mode("errorifexists").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        round_agg(F.sum("value")).alias("total_value"),
    )


# Z-order layout constants: 6 bits per dimension interleaved into a
# 12-bit key, corpus striped into Z_FILES files. 6 bits because the
# demonstration needs BOTH dimensions' masked values to fill their
# range (fixture l_suppkey only spans ~100 values); a production
# writer sizes the per-dimension bits to the column's value range the
# same way.
Z_BITS = 6
Z_FILES = 16
_Z_SPACE = 1 << (2 * Z_BITS)
_Z_MASK = (1 << Z_BITS) - 1
_ZKEY_DUCK = (
    f"CAST(list_sum(list_transform(range(0, {Z_BITS}), i -> "
    "(((pk >> i) & 1) << (2 * i)) + (((sk >> i) & 1) << (2 * i + 1))"
    ")) AS BIGINT)"
)
_ZKEY_SPARK = (
    f"aggregate(sequence(0, {Z_BITS} - 1), CAST(0 AS BIGINT), (acc, i) -> acc"
    " + shiftleft(CAST(shiftright(pk, i) & 1 AS BIGINT), 2 * i)"
    " + shiftleft(CAST(shiftright(sk, i) & 1 AS BIGINT), 2 * i + 1))"
)


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH keys AS (
        SELECT l_partkey % {_Z_MASK + 1} AS pk,
               l_suppkey % {_Z_MASK + 1} AS sk,
               l_orderkey
        FROM lineitem
    ), zk AS (
        SELECT pk, sk, {_ZKEY_DUCK} AS zkey, l_orderkey FROM keys
    ), assigned AS (
        SELECT 'zorder' AS layout,
               CAST((zkey * {Z_FILES}) // {_Z_SPACE} AS BIGINT) AS file_id,
               pk, sk
        FROM zk
        UNION ALL
        SELECT 'orderkey' AS layout,
               CAST(l_orderkey % {Z_FILES} AS BIGINT) AS file_id, pk, sk
        FROM zk
    ), boxes AS (
        SELECT layout, file_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(pk) AS BIGINT) AS part_min,
               CAST(max(pk) AS BIGINT) AS part_max,
               CAST(min(sk) AS BIGINT) AS supp_min,
               CAST(max(sk) AS BIGINT) AS supp_max
        FROM assigned GROUP BY layout, file_id
    )
    SELECT layout, file_id, n_rows, part_min, part_max, supp_min, supp_max,
           {round_sql(
               '(part_max - part_min + 1) * (supp_max - supp_min + 1)'
               f' / CAST({_Z_SPACE} AS DOUBLE)')} AS box_share
    FROM boxes
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton curve) multi-column clustering — the lakehouse
    layout optimization behind Delta/Iceberg `OPTIMIZE ZORDER BY`:
    interleave the bits of (l_partkey, l_suppkey) into one 24-bit key
    and stripe the fact table into {f} files by VALUE ranges of that
    key, so a predicate on EITHER column prunes most files via min/max
    footer stats. The query emits each file's (part, supp) bounding
    box for the Z-order layout AND the insertion-order (orderkey)
    striping side by side, plus box_share — the fraction of key space
    a file's box covers, i.e. the expected fraction of point lookups
    that CANNOT skip it: at sf0.01 the Z-order boxes cover ~6% of key
    space each while insertion-order boxes cover ~100% (no skipping at
    all). The measurement half of L7 — q_bucketed_join amortizes
    repeated JOINS at write time; this amortizes repeated FILTERS.

    Scale: the z-key is one codegen'd integer expression per row (no
    shuffle); file assignment is a value-range bin (embarrassingly
    parallel — at 100 TB the real writer would repartitionByRange on
    zkey, same math); the audit agg is one {f}x2-group partial agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % (_Z_MASK + 1)).alias("pk"),
        (F.col("l_suppkey") % (_Z_MASK + 1)).alias("sk"),
        "l_orderkey",
    )
    zk = li.select("pk", "sk", "l_orderkey", F.expr(_ZKEY_SPARK).alias("zkey"))
    assigned = zk.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"(zkey * {Z_FILES}) div {_Z_SPACE}")
                    .cast("long")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("orderkey").alias("layout"),
                    (F.col("l_orderkey") % Z_FILES).cast("long").alias("file_id"),
                ),
            )
        ).alias("a"),
        "pk",
        "sk",
    ).select("a.layout", "a.file_id", "pk", "sk")
    boxes = assigned.groupBy("layout", "file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("pk").cast("long").alias("part_min"),
        F.max("pk").cast("long").alias("part_max"),
        F.min("sk").cast("long").alias("supp_min"),
        F.max("sk").cast("long").alias("supp_max"),
    )
    share = (
        (F.col("part_max") - F.col("part_min") + 1)
        * (F.col("supp_max") - F.col("supp_min") + 1)
        / F.lit(float(_Z_SPACE))
    )
    return boxes.select(
        "layout",
        "file_id",
        "n_rows",
        "part_min",
        "part_max",
        "supp_min",
        "supp_max",
        round_agg(share).alias("box_share"),
    )


q_zorder_layout.__doc__ = q_zorder_layout.__doc__.format(f=Z_FILES)
