"""Pipeline-façade tests (SURVEY.md §5.2 'pipeline end-to-end test'):
the baseline_workflow.py shape on read-pair fixtures — partition
layout, pruning, per-sample transform, stage gating, preconditions."""

from __future__ import annotations

import os

import pytest

from flink_pipeline_spark.pipeline import Pipeline, PipelineConf
from flink_pipeline_spark.sources.fixtures import fixture_df


@pytest.fixture()
def pairs(spark):
    return fixture_df(spark, "read_pairs")


def test_pipeline_end_to_end(spark, tmp_path, pairs):
    conf = PipelineConf(output_dir=str(tmp_path / "out"))
    res = Pipeline(spark, conf).run(pairs)

    # partition layout: one directory per determined sample (SNK1)
    prq = tmp_path / "out" / "prq"
    parts = sorted(p.name for p in prq.iterdir() if p.name.startswith("sample="))
    assert parts == [
        "sample=DNA16-0084-R0001",
        "sample=DNA16-0085-R0002",
        "sample=DNA16-0086-R0003",
    ], "Undetermined and empty-payload rows must be pruned in-stream"

    assert res.samples == [
        "DNA16-0084-R0001",
        "DNA16-0085-R0002",
        "DNA16-0086-R0003",
    ]
    # 6 valid pairs x 2 mates
    assert res.sam_rows == 12
    assert res.convert_secs > 0 and res.align_secs > 0
    assert res.total_secs >= max(res.convert_secs, res.align_secs)
    # SAM sink exists and is tab-separated
    sam_files = [f for f in os.listdir(tmp_path / "out" / "sam") if f.endswith(".csv")]
    assert sam_files


def test_pipeline_output_exists_precondition(spark, tmp_path, pairs):
    conf = PipelineConf(output_dir=str(tmp_path / "out"))
    Pipeline(spark, conf).run(pairs)
    with pytest.raises(FileExistsError, match="already exists"):
        Pipeline(spark, conf).run(pairs)


def test_pipeline_skip_convert_reuses_intermediate(spark, tmp_path, pairs):
    conf = PipelineConf(output_dir=str(tmp_path / "out"))
    Pipeline(spark, conf).run(pairs)
    prq_mtime = os.path.getmtime(tmp_path / "out" / "prq")
    res2 = Pipeline(
        spark, PipelineConf(output_dir=str(tmp_path / "out"), skip_convert=True)
    ).run(pairs)
    assert os.path.getmtime(tmp_path / "out" / "prq") == prq_mtime
    assert res2.sam_rows == 12


def test_pipeline_remove_intermediate(spark, tmp_path, pairs):
    conf = PipelineConf(output_dir=str(tmp_path / "out"), remove_intermediate=True)
    res = Pipeline(spark, conf).run(pairs)
    assert res.sam_rows == 12
    assert not (tmp_path / "out" / "prq").exists()
    assert (tmp_path / "out" / "sam").exists()
