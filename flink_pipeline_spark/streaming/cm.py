"""Streaming Count-Min frequency monitor: the mergeability of the
Count-Min sketch (q_freq_cm), deployed — per micro-batch, the batch's
(d, bucket) cell counts are SUMMED into a persisted grid. The CM grid
is a plain per-cell counter, so cell-wise addition is EXACT merge
(sketch(A ++ B) = sketch(A) + sketch(B)); the streamed grid after N
batches is bit-identical to the batch sketch over the concatenated
corpus, which is what the stream==batch pytest pins against the
registered q_freq_cm grid on the same data.

The cell addressing comes from the SAME function the batch query uses
(plans/profiling.cm_cells / cm_bucket_array), so the two deployments
cannot fork.

Store layout and replay idempotence follow streaming/heavy.py: each
batch writes the full merged grid (<= CM_D x CM_W rows — tiny) into a
``batch_id=N`` partition with overwrite semantics, reads take the
latest partition strictly before the current batch, and partitions
older than N-1 are pruned after a successful write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.profiling import CM_D, CM_W  # noqa: F401  (one source of truth)
from .heavy import partition_ids, prune_partitions


class CMMonitor:
    """foreachBatch sink: maintain the Count-Min grid of the token
    stream across all batches seen so far."""

    def __init__(self, store_dir: str) -> None:
        self.store_dir = store_dir

    def _path(self) -> str:
        return os.path.join(self.store_dir, "grid")

    def _read_latest(self, spark, batch_id: int) -> DataFrame:
        """Latest grid partition strictly BEFORE ``batch_id``.
        Missing/empty store -> empty; a store whose surviving
        partitions are all >= ``batch_id`` raises — the requested
        history was pruned, and an empty grid would silently
        undercount (the streaming/heavy.py contract)."""
        bids = partition_ids(spark, self._path())
        prior = [b for b in bids if b < batch_id]
        if not prior:
            if bids:
                # batch-0 nuance: see streaming/heavy.py _read_latest
                hint = (
                    "store already populated at batch 0 — a new "
                    "stream must start from a fresh store dir"
                    if batch_id == 0
                    else f"no snapshot before batch {batch_id} "
                    "survives pruning"
                )
                raise ValueError(f"cm grid: {hint} (have {sorted(bids)})")
            return spark.createDataFrame([], "d INT, bucket BIGINT, cnt BIGINT")
        part = os.path.join(self._path(), f"batch_id={max(prior)}")
        return spark.read.schema("d INT, bucket BIGINT, cnt BIGINT").parquet(
            part
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        from ..plans.profiling import cm_cells

        spark = batch.sparkSession
        prior = self._read_latest(spark, batch_id)
        bg = (
            cm_cells(batch.select("text"))
            .groupBy("d", "bucket")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        merged = (
            prior.unionByName(bg)
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        part = os.path.join(self._path(), f"batch_id={batch_id}")
        merged.write.mode("overwrite").parquet(part)
        self._prune_before(spark, batch_id - 1)

    def _prune_before(self, spark, keep_from: int) -> None:
        prune_partitions(spark, self._path(), keep_from)

    def estimates(self, spark, after_batch_id: int, toks: DataFrame) -> DataFrame:
        """(tok, cm_estimate) for the probe tokens in ``toks`` (one
        string column ``tok``) as of AFTER ``after_batch_id`` — the
        min-over-rows point query, identical to the batch query's.
        A probe whose cells were never touched estimates 0 (CM's
        floor for a never-seen key)."""
        from ..plans.profiling import cm_bucket_array

        grid = self._read_latest(spark, after_batch_id + 1)
        pc = toks.select(
            "tok", F.posexplode(cm_bucket_array()).alias("d", "bucket")
        )
        return (
            pc.join(F.broadcast(grid), ["d", "bucket"], "left")
            .groupBy("tok")
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("long")
                .alias("cm_estimate")
            )
        )


def start_cm_stream(docs_stream: DataFrame, monitor: CMMonitor, **opts):
    """Wire a streaming documents frame through the monitor sink."""
    return (
        docs_stream.writeStream.foreachBatch(monitor)
        .outputMode("update")
        .options(**opts)
        .start()
    )
