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


def test_every_query_has_an_oracle():
    # rows-only queries no longer exist; if one reappears it needs a
    # deliberate decision, not a silent weaker gate
    assert sorted(set(ALL) - set(WITH_ORACLE)) == []


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle, name):
    df = query_fns()[name](spark, SF_DIR)
    assert_parity(df, oracle, oracle_sqls(SF_DIR)[name], name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
