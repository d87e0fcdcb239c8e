"""Observed pruning (SURVEY.md ST5): late/dirty-data policy with
dropped-row metrics via the Observation API.

The reference deletes bad data post-hoc and logs counts
(workflow.py:360-378); here the prune is an in-stream filter and the
metrics come from ``df.observe`` — collected as a side-output of the
SAME job, no second pass over the data (at 100 TB a separate count()
pass costs a full scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_prune(
    df: DataFrame, keep: Column, observation_name: str = "prune_metrics"
) -> tuple[DataFrame, Observation]:
    """Filter ``df`` to rows satisfying ``keep``, observing total/kept/
    dropped counts. Read ``obs.get`` AFTER an action on the returned
    frame."""
    obs = Observation(observation_name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(keep.cast("long")).alias("rows_kept"),
        F.sum((~keep).cast("long")).alias("rows_dropped"),
    )
    return observed.filter(keep), obs
