"""Regression tests for the parity harness's raw-collection rejection.

Rounds 3-4 shipped a query (q_label_centroids) whose ArrayType output
passed local parity — `_canon` tuple-ized lists — but crashed the
driver's canonicalizer (`TypeError: unhashable type: 'list'`). Local
parity must now REJECT exactly what the driver cannot hash, so local
green predicts driver green.
"""

from __future__ import annotations

import pytest

from flink_pipeline_spark.operators.llm import label_centroids
from flink_pipeline_spark.catalog import load_table

from .conftest import SF_DIR
from .parity import RawCollectionCell, rows_from_duckdb, rows_from_spark


def test_spark_raw_array_cell_rejected(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id INT, arr ARRAY<DOUBLE>")
    with pytest.raises(RawCollectionCell):
        rows_from_spark(df)


def test_spark_raw_map_cell_rejected(spark):
    df = spark.createDataFrame([(1, {"k": 2})], "id INT, m MAP<STRING, INT>")
    with pytest.raises(RawCollectionCell):
        rows_from_spark(df)


def test_duckdb_raw_list_cell_rejected(oracle):
    with pytest.raises(RawCollectionCell):
        rows_from_duckdb(oracle, "SELECT [1, 2, 3] AS xs")


def test_old_label_centroids_shape_fails(spark):
    """The exact r3/r4 driver failure: the array-API centroid output
    must be caught locally (the registered query now uses the long
    format instead)."""
    arr = label_centroids(load_table(spark, SF_DIR, "embeddings"))
    with pytest.raises(RawCollectionCell):
        rows_from_spark(arr)


def test_scalar_cells_still_pass(spark):
    df = spark.createDataFrame([(1, "a", 2.5)], "id INT, s STRING, x DOUBLE")
    cols, rows = rows_from_spark(df)
    assert cols == ["id", "s", "x"]
    assert len(rows) == 1
