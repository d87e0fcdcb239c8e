"""Operator-level unit tests mirroring the reference's invariant guards
(SURVEY.md §5.2): filename-grammar strictness, pair-join integrity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_pipeline_spark.operators.filename import (
    parse_read_files,
    parse_read_files_strict,
)
from flink_pipeline_spark.sources.fixtures import fixture_df


def test_parse_read_files_shape(spark):
    parsed = parse_read_files(fixture_df(spark, "read_files"))
    rows = parsed.collect()
    # 16 fixture names - 2 undetermined - 2 non-fastq = 12
    assert len(rows) == 12
    for r in rows:
        assert r.read in ("R1", "R2")
        assert r.lane.startswith("L") and r.snum.startswith("S")
        assert r.chunk.isdigit()


def test_parse_strict_passes_clean_data(spark):
    parsed = parse_read_files_strict(fixture_df(spark, "read_files"))
    assert parsed.count() == 12


def test_parse_strict_raises_on_bad_read_token(spark):
    """The grammar's else-raise (reference baseline_workflow.py:116)."""
    bad = spark.createDataFrame(
        [("SAMPLEX_S1_L001_R9_001.fastq.gz",)], "filename STRING"
    )
    with pytest.raises(Exception, match="unexpected read token"):
        parse_read_files_strict(bad).collect()


def test_pair_join_is_total_on_clean_fixture(spark):
    """Every R1 chunk has exactly one R2 partner (the positional-zip
    precondition the reference assumes, baseline_workflow.py:137-144)."""
    parsed = parse_read_files(fixture_df(spark, "read_files"))
    r1 = parsed.filter(F.col("read") == "R1").select("sample", "lane", "chunk")
    r2 = parsed.filter(F.col("read") == "R2").select("sample", "lane", "chunk")
    assert r1.count() == r2.count() == 6
    assert r1.join(r2, ["sample", "lane", "chunk"], "inner").count() == 6
    assert r1.join(r2, ["sample", "lane", "chunk"], "left_anti").count() == 0
    assert r2.join(r1, ["sample", "lane", "chunk"], "left_anti").count() == 0
