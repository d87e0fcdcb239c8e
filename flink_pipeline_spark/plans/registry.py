"""Named-query registry — the driver-contract surface.

Every operator from SURVEY.md §2 is registered here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL string the DuckDB oracle runs
on the same parquet tables. Keeping implementation and oracle adjacent
(one ``@register`` call) is what keeps column names and semantics in
lock-step — the driver's hash compare sorts columns by name, so any
drift is a correctness failure.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-ANSI SQL
    equivalent (None => rows-only check for non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def query_fns() -> dict[str, QueryFn]:
    _load_all()
    return dict(QUERIES)


def oracle_sqls() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (imports populate the dicts)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        analytics,
        joins,
        llm_ops,
        pipeline_queries,
        relational,
        sampling,
        scans,
        streaming_queries,
        udf_queries,
        windows_sorts,
    )

    _LOADED = True
