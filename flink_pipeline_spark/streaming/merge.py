"""Streaming CDC apply — the deployment form of the batch
q_cdc_apply (plans/relational.py): a foreachBatch sink that MERGEs
each micro-batch of insert/update/delete change rows into a persisted
base table with operators/merge.merge_into — the eighth streaming
deployment form, completing the L9 temporal family the way the image
band store and mergeable-KMV monitors completed theirs.

Contract: change rows carry the key columns, an ``op`` in
{'insert','update','delete'}, the full post-image of every non-key
base column, and a monotone ``seq`` (the CDC log's LSN / offset).
Within a micro-batch the feed is COMPACTED to final images first —
last image per key wins, by (seq, op, payload) total order — which is
exactly merge_into's one-change-row-per-key contract; compaction is
correct under merge_into's upsert-tolerant semantics (delete-then-
insert compacts to the insert, insert-then-delete to the no-op
delete). Malformed ops fail loudly inside merge_into (ADVICE r9).

Store layout and replay idempotence follow streaming/heavy.py: each
batch writes the FULL merged snapshot into a ``batch_id=N`` partition
with overwrite semantics, reads take the latest partition strictly
BEFORE the current batch (a replayed batch re-derives a byte-identical
snapshot instead of double-applying), the initial base seeds the
sentinel ``batch_id=-1`` partition, and partitions older than N-1 are
pruned after a successful write. Reads of pruned history raise (the
r9-ADVICE contract, via heavy.partition_ids).

Scale: the merge itself is ONE full-outer key join per trigger — the
change side is a micro-batch (tiny; AQE broadcasts it), the base side
is key-partitioned once. The snapshot WRITE is the copy-on-write
trade this plain-parquet store makes explicit: each trigger persists
a full new base version (what Delta/Iceberg avoid with a transaction
log + file-level rewrite). Production at 100 TB partitions the base
by a key prefix and rewrites only partitions the batch touches — the
merge plan is unchanged; only the sink's overwrite scope narrows
(spark.sql.sources.partitionOverwriteMode=dynamic).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.merge import merge_into
from .heavy import partition_ids, prune_partitions


class CDCApplyMonitor:
    """foreachBatch sink: maintain a merged base table under a stream
    of keyed insert/update/delete changes."""

    def __init__(
        self,
        store_dir: str,
        keys: Sequence[str] = ("doc_id",),
        op_col: str = "op",
        seq_col: str = "seq",
    ) -> None:
        self.store_dir = store_dir
        self.keys = list(keys)
        self.op_col = op_col
        self.seq_col = seq_col

    def _path(self) -> str:
        return os.path.join(self.store_dir, "base")

    def init(self, base: DataFrame) -> None:
        """Seed the store with the pre-stream base snapshot (the v1
        table a CDC feed starts from). Must run once before the
        stream starts; batch ids from Structured Streaming start at 0,
        so the seed lives at the sentinel partition batch_id=-1."""
        part = os.path.join(self._path(), "batch_id=-1")
        base.write.mode("overwrite").parquet(part)

    def _read_latest(self, spark, batch_id: int) -> DataFrame:
        """Latest snapshot strictly BEFORE ``batch_id``. An uninit'd
        store raises (merging into nothing would silently drop the
        base contract); so does a read of pruned history."""
        bids = partition_ids(spark, self._path())
        prior = [b for b in bids if b < batch_id]
        if not prior:
            raise ValueError(
                f"cdc base: no snapshot before batch {batch_id} "
                f"(have {sorted(bids)}; call init(base) first)"
            )
        part = os.path.join(self._path(), f"batch_id={max(prior)}")
        return spark.read.parquet(part)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        base = self._read_latest(spark, batch_id)
        payload = [c for c in base.columns if c not in self.keys]
        # last image per key wins: rank by seq desc with a full
        # deterministic tiebreak so a replayed/re-partitioned batch
        # compacts identically even under duplicate seq values
        w = Window.partitionBy(*self.keys).orderBy(
            F.col(self.seq_col).desc(),
            F.col(self.op_col).desc(),
            *[F.col(c).desc_nulls_last() for c in payload],
        )
        compacted = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*self.keys, self.op_col, *payload)
        )
        merged = merge_into(base, compacted, self.keys, op_col=self.op_col)
        part = os.path.join(self._path(), f"batch_id={batch_id}")
        merged.write.mode("overwrite").parquet(part)
        self._prune_before(spark, batch_id - 1)

    def _prune_before(self, spark, keep_from: int) -> None:
        prune_partitions(spark, self._path(), keep_from)

    def table(self, spark, after_batch_id: int) -> DataFrame:
        """The merged base as of AFTER ``after_batch_id`` (lazy)."""
        return self._read_latest(spark, after_batch_id + 1)


def start_cdc_apply_stream(
    changes_stream: DataFrame, monitor: CDCApplyMonitor, **opts
):
    """Wire a streaming change feed through the merge sink."""
    return (
        changes_stream.writeStream.foreachBatch(monitor)
        .outputMode("update")
        .options(**opts)
        .start()
    )
