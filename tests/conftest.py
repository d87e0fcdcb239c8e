"""Shared test fixtures: one SparkSession per test session, plus the
DuckDB oracle harness mirroring the driver's correctness gate."""

from __future__ import annotations

import os

import duckdb
import pytest

from flink_pipeline_spark.session import EngineConf, get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        EngineConf(
            app_name="flink_pipeline_spark_tests",
            shuffle_partitions=8,
            driver_memory="8g",
            extra={"spark.sql.warehouse.dir": "/tmp/fps_test_warehouse"},
        )
    )
    yield s


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the fixture tables registered as views,
    exactly as the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
