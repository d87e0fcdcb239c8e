"""The local mirror of the driver's correctness gate: every registered
query with an oracle must hash-match DuckDB on the same parquet; every
oracle-less query must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from flink_pipeline_spark.plans import oracle_sqls, query_fns

from .conftest import SF_DIR
from .parity import assert_parity

ALL = sorted(query_fns())
WITH_ORACLE = sorted(oracle_sqls())
ROWS_ONLY = sorted(set(ALL) - set(WITH_ORACLE))

# Oracles whose SQL pins a literal sf0.01 path (the driver always runs
# oracles at sf0.01; these can't parity-check at other SFs).
SF_PINNED = {"q_scan_file_metadata"}


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle, name):
    if name in SF_PINNED and not SF_DIR.rstrip("/").endswith("sf0.01"):
        pytest.skip(f"{name} oracle pins the sf0.01 path")
    df = query_fns()[name](spark, SF_DIR)
    assert_parity(df, oracle, oracle_sqls()[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    df = query_fns()[name](spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
