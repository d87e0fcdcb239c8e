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
  batch-incremental probe (operators/llm.incremental_dedup's
  asymmetric shape): digest anti-probe for exact copies, capped
  (band, sig) bucket probe + exact shingle-Jaccard verify for
  near-dups, then appends the KEPT documents' index rows.

foreachBatch is the right hook because the store is a cross-batch
table the engine's per-key state stores cannot hold: micro-batch
joins against disk-resident parquet, exactly how a production
pipeline maintains a dedup index (the store schema is the artifact
incremental_dedup's docstring says a pipeline persists between runs).
At 100 TB the three store tables become partitioned/bucketed tables;
the probe stays an equi-join of the batch against them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.llm import (
    MAX_LSH_BUCKET,
    doc_shingles,
    lsh_band_signatures,
    scored_pairs,
)

_JACC = "CAST(size(array_intersect(sa, sb)) AS DOUBLE) / size(array_union(sa, sb))"


class NearDupIngest:
    """foreachBatch sink: per micro-batch, classify every document as
    ``keep`` / ``drop_exact`` / ``drop_near`` against the standing
    store, emit decisions to ``out_dir``, and index the kept docs.

    Batch-internal duplicates are deliberately NOT detected (the
    incremental_dedup convention: a batch self-dedups with the batch
    operators first); the store is consulted as it stood BEFORE the
    batch, so replaying a batch after a crash re-derives the same
    decisions for it (append-only store + deterministic probe).
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

    def _read_store(self, spark, kind: str, schema: str) -> DataFrame:
        path = self._store(kind)
        try:
            return spark.read.schema(schema).parquet(path)
        except Exception:
            return spark.createDataFrame([], schema)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        docs = batch.select("doc_id", "text").persist()

        digests = self._read_store(spark, "digests", "doc_id BIGINT, dg STRING")
        sig_store = self._read_store(
            spark, "sigs", "doc_id BIGINT, band INT, sig STRING"
        )
        set_store = self._read_store(
            spark, "sets", "doc_id BIGINT, s ARRAY<STRING>"
        )

        bdig = docs.select("doc_id", F.md5("text").alias("dg"))
        drop_exact = bdig.join(
            digests.select("dg").distinct(), "dg", "left_semi"
        ).select("doc_id")

        bsets = doc_shingles(docs, self.n).persist()
        bsigs = lsh_band_signatures(docs, self.n, sets=bsets)
        # capped store buckets: a hot bucket is boilerplate, not signal
        buckets = (
            sig_store.groupBy("band", "sig")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") <= self.max_bucket)
        )
        cand = (
            bsigs.join(buckets, ["band", "sig"])
            .select(
                F.col("doc_id").alias("doc_a"), F.explode("ids").alias("doc_b")
            )
            .distinct()
        )
        both_sets = bsets.unionByName(set_store)
        near = (
            scored_pairs(cand, both_sets, _JACC, "jacc", self.threshold)
            .select(F.col("doc_a").alias("doc_id"))
            .distinct()
        )

        decisions = (
            docs.select("doc_id")
            .join(drop_exact.withColumn("ex", F.lit(1)), "doc_id", "left")
            .join(near.withColumn("nr", F.lit(1)), "doc_id", "left")
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "doc_id",
                F.when(F.col("ex").isNotNull(), F.lit("drop_exact"))
                .when(F.col("nr").isNotNull(), F.lit("drop_near"))
                .otherwise(F.lit("keep"))
                .alias("action"),
            )
            .persist()
        )
        decisions.write.mode("append").parquet(self.out_dir)

        kept = decisions.filter(F.col("action") == "keep").select("doc_id")
        bdig.join(kept, "doc_id", "left_semi").write.mode("append").parquet(
            self._store("digests")
        )
        bsigs.join(kept, "doc_id", "left_semi").write.mode("append").parquet(
            self._store("sigs")
        )
        bsets.join(kept, "doc_id", "left_semi").write.mode("append").parquet(
            self._store("sets")
        )
        decisions.unpersist()
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
