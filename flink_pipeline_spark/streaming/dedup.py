"""Streaming near-dup dedup: continuous ingestion against a
PERSISTENT LSH signature store (SURVEY.md ST11 extension; the r6
verdict's foreachBatch item).

Two streaming dedup regimes exist and they are different tools:

* ``dropDuplicatesWithinWatermark`` (streaming/windows.py, ST11) —
  executor-state dedup bounded by the WATERMARK: exact-key duplicates
  arriving within the lateness window. State lives in the state
  store and is evicted by time; it cannot remember last month.
* THIS module — dedup against the ENTIRE standing corpus: state is
  the append-only (digest, band-signature, shingle-set) store on
  disk, so executor memory per micro-batch stays O(batch + probed
  buckets) no matter how large the corpus grows — the bounded-state
  answer for unbounded retention. Each micro-batch replays the
  batch-incremental probe (operators/llm.neardup_probe — the SAME
  code path as q_dedup_incremental, not a re-implementation): digest
  anti-probe for exact copies, capped (band, sig) bucket probe +
  exact shingle-Jaccard verify for near-dups, then writes the KEPT
  documents' index rows.

Replay idempotence: every write (decisions and the three store
tables) lands in a ``batch_id=N`` partition directory with OVERWRITE
semantics, and every store read EXCLUDES the current batch's own
partition — so a batch re-run after a crash probes the store exactly
as it stood before the batch and re-derives byte-identical decisions
instead of matching its own half-written rows (the classic
foreachBatch at-least-once pitfall).

Per-batch cost: the signature store is left-semi-joined down to the
buckets the batch actually touches BEFORE the bucket aggregation
(full membership of a matched bucket is retained, so the occupancy
cap still sees true bucket sizes) — the shuffle/collect work is
O(probed buckets), not O(corpus). The store parquet scans themselves
are linear in corpus size per trigger; at real scale the store is
written bucketed/partitioned by its join keys so those scans prune —
the schema here is exactly that artifact.

foreachBatch is the right hook because the store is a cross-batch
table the engine's per-key state stores cannot hold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..operators.llm import (
    MAX_LSH_BUCKET,
    dedup_decisions,
    doc_shingles,
    lsh_band_signatures,
    neardup_probe,
)


class NearDupIngest:
    """foreachBatch sink: per micro-batch, classify every document as
    ``keep`` / ``drop_exact`` / ``drop_near`` against the standing
    store, emit decisions to ``out_dir``, and index the kept docs.

    Batch-internal duplicates are deliberately NOT detected (the
    incremental_dedup convention: a batch self-dedups with the batch
    operators first).
    """

    def __init__(
        self,
        store_dir: str,
        out_dir: str,
        n: int = 3,
        threshold: float = 0.8,
        max_bucket: int = MAX_LSH_BUCKET,
    ) -> None:
        self.store_dir = store_dir
        self.out_dir = out_dir
        self.n = n
        self.threshold = threshold
        self.max_bucket = max_bucket

    def _store(self, kind: str) -> str:
        return os.path.join(self.store_dir, kind)

    def _read_store(
        self, spark, kind: str, schema: str, batch_id: int
    ) -> DataFrame:
        """The store as it stood BEFORE ``batch_id``: partition
        discovery over the per-batch dirs, minus the current batch's
        own partition (crash-replay idempotence).

        Only a MISSING store path maps to the empty frame (the first
        trigger's legitimate state). Every other read failure —
        corrupt parquet, transient I/O, permissions — re-raises so a
        degraded store fails the batch; swallowing it would silently
        classify standing duplicates as 'keep', commit the wrong
        decisions, AND index the dups permanently (ADVICE r7)."""
        path = self._store(kind)
        try:
            df = spark.read.parquet(path)
        except AnalysisException as e:
            cond = (
                e.getCondition() if hasattr(e, "getCondition")
                else getattr(e, "getErrorClass", lambda: None)()
            )
            if cond == "PATH_NOT_FOUND" or "Path does not exist" in str(e):
                return spark.createDataFrame([], schema)
            raise
        return df.filter(F.col("batch_id") != batch_id).drop("batch_id")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        docs = batch.select("doc_id", "text").persist()

        digests = self._read_store(
            spark, "digests", "doc_id BIGINT, dg STRING", batch_id
        )
        sig_store = self._read_store(
            spark, "sigs", "doc_id BIGINT, band INT, sig STRING", batch_id
        )
        set_store = self._read_store(
            spark, "sets", "doc_id BIGINT, s ARRAY<STRING>", batch_id
        )

        bdig = docs.select("doc_id", F.md5("text").alias("dg"))
        drop_exact = bdig.join(
            digests.select("dg").distinct(), "dg", "left_semi"
        ).select("doc_id")

        # batch signatures feed BOTH the probe and the kept-index
        # write — persist so the minhash pass runs once per trigger
        bsets = doc_shingles(docs, self.n).persist()
        bsigs = lsh_band_signatures(docs, self.n, sets=bsets).persist()
        # bound the bucket aggregation to the buckets the batch probes
        # (left-semi on the key keeps FULL membership of matched
        # buckets — the occupancy cap still sees true sizes)
        probed_store = sig_store.join(
            bsigs.select("band", "sig").distinct(), ["band", "sig"], "left_semi"
        )
        sigs_all = bsigs.withColumn("is_new", F.lit(True)).unionByName(
            probed_store.withColumn("is_new", F.lit(False))
        )
        near = neardup_probe(
            F.col("is_new"),
            bsets.unionByName(set_store),
            sigs_all,
            self.threshold,
            self.max_bucket,
        )

        decisions = dedup_decisions(
            docs.select("doc_id"), drop_exact, near
        ).persist()

        def part(root: str) -> str:
            return os.path.join(root, f"batch_id={batch_id}")

        decisions.write.mode("overwrite").parquet(part(self.out_dir))

        kept = decisions.filter(F.col("action") == "keep").select("doc_id")
        bdig.join(kept, "doc_id", "left_semi").write.mode("overwrite").parquet(
            part(self._store("digests"))
        )
        bsigs.join(kept, "doc_id", "left_semi").write.mode("overwrite").parquet(
            part(self._store("sigs"))
        )
        bsets.join(kept, "doc_id", "left_semi").write.mode("overwrite").parquet(
            part(self._store("sets"))
        )
        decisions.unpersist()
        bsigs.unpersist()
        bsets.unpersist()
        docs.unpersist()


def start_neardup_stream(docs_stream: DataFrame, ingest: NearDupIngest, **opts):
    """Wire a streaming documents frame through the ingest sink."""
    return (
        docs_stream.writeStream.foreachBatch(ingest)
        .outputMode("update")
        .options(**opts)
        .start()
    )
