"""Observed prune metrics (ST5) and stateful timeout eviction (ST2) —
the remaining streaming-control-plane behaviors."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_pipeline_spark.operators.observe import observed_prune
from flink_pipeline_spark.sources.fixtures import fixture_df


def test_observed_prune_counts(spark):
    pairs = fixture_df(spark, "read_pairs")
    keep = (
        (F.lower(F.col("sample")) != "undetermined")
        & (F.length("seq1") >= 1)
        & (F.length("seq2") >= 1)
    )
    cleaned, obs = observed_prune(pairs, keep)
    kept_rows = cleaned.count()  # action -> observation materializes
    m = obs.get
    assert m["rows_total"] == 8
    assert m["rows_kept"] == kept_rows == 6
    assert m["rows_dropped"] == 2  # Undetermined + empty payload


def test_state_timeout_evicts_idle_jobs(spark, tmp_path):
    """applyInPandasWithState with ProcessingTimeTimeout: a key that
    stops sending data gets its state evicted and reported — the
    reference's give-up-on-silent-job policy (experiment.py:345-357)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = str(tmp_path / "src")
    fixture_df(spark, "job_events").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = spark.readStream.schema(schema).parquet(src)

    out_schema = "job_id STRING, status STRING, n BIGINT"
    state_schema = "n BIGINT"

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame([{"job_id": key[0], "status": "evicted", "n": n}])
        else:
            n = state.get[0] if state.exists else 0
            for pdf in pdfs:
                n += len(pdf)
            state.update((n,))
            state.setTimeoutDuration(500)  # ms of processing-time silence
            yield pd.DataFrame([{"job_id": key[0], "status": "active", "n": n}])

    q = (
        sdf.groupBy("job_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.ProcessingTimeTimeout
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_timeout_out")
        .start()
    )
    # NOTE: with ProcessingTimeTimeout the engine keeps running no-data
    # micro-batches to fire timeouts, so processAllAvailable() can block
    # indefinitely — poll the sink with a deadline instead.
    import time

    fixture_jobs = {"DNA16-0084-R0001", "DNA16-0085-R0002", "DNA16-0086-R0003"}
    rows = []
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.table("state_timeout_out").collect()
            evicted = {r.job_id for r in rows if r.status == "evicted"}
            if evicted == fixture_jobs:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()

    active = {r.job_id for r in rows if r.status == "active"}
    evicted = {r.job_id for r in rows if r.status == "evicted"}
    assert active == fixture_jobs
    # every idle job eventually evicted with its accumulated count intact
    assert evicted == fixture_jobs, f"timeout eviction incomplete: {evicted}"
    n_by_job = {r.job_id: r.n for r in rows if r.status == "evicted"}
    assert n_by_job == {
        "DNA16-0084-R0001": 4,
        "DNA16-0085-R0002": 4,
        "DNA16-0086-R0003": 3,
    }
