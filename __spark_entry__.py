"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``flink_pipeline_spark.plans`` — the named-query
registry where every operator from SURVEY.md §2 lives next to its
DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_pipeline_spark.plans import oracle_sqls, query_fns


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return query_fns()["q_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (subset of ``queries()``:
    non-SQL-expressible ops get rows-only checks)."""
    return oracle_sqls()
