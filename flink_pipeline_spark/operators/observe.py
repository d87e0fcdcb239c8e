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
    # NULL-safe accounting: a NULL predicate row IS pruned by filter(),
    # so kept counts coalesce(keep, false) and dropped = total - kept
    # (the naive sum((~keep)::long) skips NULLs and undercounts).
    kept = F.coalesce(F.sum(F.coalesce(keep, F.lit(False)).cast("long")), F.lit(0))
    total = F.count(F.lit(1))
    observed = df.observe(
        obs,
        total.alias("rows_total"),
        kept.alias("rows_kept"),
        (total - kept).alias("rows_dropped"),
    )
    return observed.filter(keep), obs
