"""Tests: stream-stream interval join (stream == batch) and the
experiment harness (retries, CSV header-once)."""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from flink_pipeline_spark.benchmark import Experiment, ExperimentConf
from flink_pipeline_spark.catalog import load_table
from flink_pipeline_spark.streaming.joins import interval_join

from .conftest import SF_DIR


def _events_split(spark):
    e = load_table(spark, SF_DIR, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    return clicks, purchases


def test_interval_join_batch_semantics(spark):
    clicks, purchases = _events_split(spark)
    out = interval_join(clicks, purchases).collect()
    assert out, "expected click-purchase pairs within 30 minutes"
    for r in out:
        assert r.l_ts_s - 1800 <= r.r_ts_s <= r.l_ts_s


def test_interval_join_stream_equals_batch(spark, tmp_path):
    clicks, purchases = _events_split(spark)
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.coalesce(2).write.parquet(cdir)
    purchases.coalesce(2).write.parquet(pdir)

    def stream(d):
        schema = spark.read.parquet(d).schema
        return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)

    batch = sorted(tuple(r) for r in interval_join(clicks, purchases).collect())
    sdf = interval_join(stream(cdir), stream(pdir), watermark="1 hour")
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    streamed = sorted(tuple(r) for r in spark.table("ssj_out").collect())
    assert streamed == batch


def test_experiment_retries_and_csv(tmp_path):
    csv_path = str(tmp_path / "results.csv")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] % 3 != 0:  # fails twice, succeeds on 3rd
            raise RuntimeError("transient")
        return {"bcl_secs": 1.0, "align_secs": 2.0}

    exp = Experiment(ExperimentConf(results_csv=csv_path, num_repeats=2, max_retries=3))
    assert exp.execute(flaky) is True

    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    # 2 repeats x 3 attempts each (fail, fail, success)
    assert len(rows) == 6
    assert [r["retcode"] for r in rows] == ["1", "1", "0", "1", "1", "0"]
    # header written exactly once
    with open(csv_path) as f:
        assert sum(1 for line in f if line.startswith("repeat_num")) == 1


def test_experiment_gives_up(tmp_path):
    csv_path = str(tmp_path / "results.csv")
    exp = Experiment(ExperimentConf(results_csv=csv_path, num_repeats=1, max_retries=2))

    def always_fails():
        raise RuntimeError("boom")

    assert exp.execute(always_fails) is False
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 and all(r["retcode"] == "1" for r in rows)
