"""Pipeline-façade queries (SURVEY.md SNK1/SNK2/U1): partitioned demux
write, append-CSV roundtrip, and the per-sample grouped transform —
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

from ..functions.portable import round_agg, hash56_sql_duckdb, round_sql
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
