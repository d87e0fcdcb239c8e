"""Filename-grammar schema recovery.

The reference's only record schema is the FASTQ filename convention
``<sample>_S<k>_L<lane>_R<1|2>_<chunk>.fastq.gz`` parsed positionally
(reference baseline_workflow.py:109-117). Here it is a declarative
split/regex projection, emitted both as a Spark transform and as the
matching DuckDB CTE text so join/group queries built on it stay in
oracle lock-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.fixtures import fixture_values_sql

CHUNK_RE = r"_([0-9]+)\.fastq\.gz$"


def parse_read_files(df: DataFrame) -> DataFrame:
    """read_files(filename) -> (filename, sample, snum, lane, read, chunk),
    keeping only determined ``*.fastq.gz`` rows (filters F1/F2)."""
    low = F.lower(F.col("filename"))
    parts = F.split(F.col("filename"), "_")
    return (
        df.filter(low.endswith(".fastq.gz") & ~low.startswith("undetermined"))
        .select(
            "filename",
            parts.getItem(0).alias("sample"),
            parts.getItem(1).alias("snum"),
            parts.getItem(2).alias("lane"),
            parts.getItem(3).alias("read"),
            F.regexp_extract(F.col("filename"), CHUNK_RE, 1).alias("chunk"),
        )
    )


def parse_read_files_strict(df: DataFrame) -> DataFrame:
    """Like :func:`parse_read_files` but enforcing the grammar's
    else-raise: a read token outside {R1, R2} fails the query
    (reference baseline_workflow.py:111-116 raises on unexpected
    filename shape)."""
    parsed = parse_read_files(df)
    return parsed.withColumn(
        "read",
        F.when(F.col("read").isin("R1", "R2"), F.col("read")).otherwise(
            F.raise_error(
                F.concat(F.lit("unexpected read token in filename: "), F.col("filename"))
            )
        ),
    )


def parsed_read_files_sql(alias: str = "parsed") -> str:
    """DuckDB CTE body equivalent of :func:`parse_read_files`."""
    return f"""
    {alias} AS (
        SELECT filename,
               string_split(filename, '_')[1] AS sample,
               string_split(filename, '_')[2] AS snum,
               string_split(filename, '_')[3] AS lane,
               string_split(filename, '_')[4] AS read,
               regexp_extract(filename, '_([0-9]+)\\.fastq\\.gz$', 1) AS chunk
        FROM {fixture_values_sql('read_files')}
        WHERE lower(filename) LIKE '%.fastq.gz'
          AND lower(filename) NOT LIKE 'undetermined%'
    )"""
