"""Streaming IMAGE near-dup dedup: continuous ingestion against a
persistent aHash band-key store — the image-modality twin of
streaming/dedup.py (text LSH store), and the streaming deployment
form of q_dedup_image_phash_incremental.

State is the append-only (digest, band-signature) store on disk:
executor memory per micro-batch stays O(batch + probed buckets)
regardless of how many images the corpus holds. Each micro-batch:

* computes batch digests (md5 of the payload bytes) and aHash band
  keys (operators/multimodal.ahash_bands — the SAME codec the batch
  queries use, not a re-implementation);
* ``drop_exact``: byte-identical payload already indexed (digest
  semi-join);
* ``drop_near``: best store match within MAX_HAMMING via the
  pigeonhole band equi-join + exact bit_count(xor) verify — the
  store side is first semi-joined down to the (blk, key) buckets the
  batch actually probes, so per-trigger shuffle work is O(probed
  buckets), not O(corpus);
* ``keep``: everything else; kept images' digests and band rows are
  appended to the store.

Batch-internal duplicates are deliberately NOT detected (the
incremental convention: a batch self-dedups with the batch pair query
first). Replay idempotence follows streaming/dedup.py exactly: every
write lands in a ``batch_id=N`` partition with overwrite semantics
and every store read excludes the current batch's own partition, so
a crashed batch re-derives byte-identical decisions.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.multimodal import ahash_bands

MAX_HAMMING = 3  # the q_dedup_image_phash lossless-blocking threshold


class ImageDedupIngest:
    """foreachBatch sink: classify every (file, content) image row as
    ``keep`` / ``drop_exact`` / ``drop_near`` against the standing
    store, emit decisions to ``out_dir``, and index kept images."""

    def __init__(
        self, store_dir: str, out_dir: str, max_hamming: int = MAX_HAMMING
    ) -> None:
        self.store_dir = store_dir
        self.out_dir = out_dir
        self.max_hamming = max_hamming

    def _store(self, kind: str) -> str:
        return os.path.join(self.store_dir, kind)

    def _read_store(
        self, spark, kind: str, schema: str, batch_id: int
    ) -> DataFrame:
        """The store as it stood BEFORE ``batch_id``. Only a missing
        path maps to empty — any other read failure re-raises (the
        streaming/dedup.py ADVICE-r7 contract: a degraded store must
        fail the batch, not silently classify dups as keep)."""
        try:
            df = spark.read.parquet(self._store(kind))
        except AnalysisException as e:
            cond = (
                e.getCondition()
                if hasattr(e, "getCondition")
                else getattr(e, "getErrorClass", lambda: None)()
            )
            if cond == "PATH_NOT_FOUND" or "Path does not exist" in str(e):
                return spark.createDataFrame([], schema)
            raise
        return df.filter(F.col("batch_id") != batch_id).drop("batch_id")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        imgs = batch.select("file", "content").persist()

        digests = self._read_store(
            spark, "digests", "file STRING, dg STRING", batch_id
        )
        band_store = self._read_store(
            spark, "bands", "file STRING, blk BIGINT, key BIGINT", batch_id
        )

        bdig = imgs.select("file", F.md5("content").alias("dg"))
        drop_exact = bdig.join(
            digests.select("dg").distinct(), "dg", "left_semi"
        ).select("file")

        bbands = ahash_bands(imgs).persist()
        # bound store work to the buckets the batch probes
        probed = band_store.join(
            bbands.select("blk", "key").distinct(), ["blk", "key"], "left_semi"
        )
        cand = (
            bbands.alias("p")
            .join(
                probed.alias("s"),
                (F.col("s.blk") == F.col("p.blk"))
                & (F.col("s.key") == F.col("p.key")),
            )
            .select(
                F.col("p.file").alias("file"),
                F.col("s.file").alias("store_file"),
            )
            .distinct()
        )
        pk = bbands.select("file", "blk", F.col("key").alias("pkey"))
        # the verify needs each candidate's FULL 4-band signature —
        # `probed` holds only the bucket-matching band rows (hamming
        # over that subset reads 0 by construction), so re-read the
        # store bounded to candidate files instead (still O(candidates))
        sk = band_store.join(
            cand.select(F.col("store_file").alias("file")).distinct(),
            "file",
            "left_semi",
        ).select(
            F.col("file").alias("store_file"), "blk", F.col("key").alias("skey")
        )
        ham = (
            cand.join(pk, "file")
            .join(sk, ["store_file", "blk"])
            .groupBy("file", "store_file")
            .agg(
                F.sum(F.expr("bit_count(pkey ^ skey)"))
                .cast("long")
                .alias("hamming")
            )
            .filter(F.col("hamming") <= self.max_hamming)
        )
        w = Window.partitionBy("file").orderBy("hamming", "store_file")
        near = (
            ham.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("file", F.col("store_file").alias("dup_of"), "hamming")
        )

        decisions = (
            imgs.select("file")
            .join(drop_exact.withColumn("ex", F.lit(1)), "file", "left")
            .join(near, "file", "left")
            .select(
                "file",
                F.when(F.col("ex").isNotNull(), "drop_exact")
                .when(F.col("dup_of").isNotNull(), "drop_near")
                .otherwise("keep")
                .alias("action"),
                F.when(F.col("ex").isNull(), F.col("dup_of")).alias("dup_of"),
                F.when(F.col("ex").isNull(), F.col("hamming")).alias(
                    "hamming"
                ),
            )
            .persist()
        )

        def part(root: str) -> str:
            return os.path.join(root, f"batch_id={batch_id}")

        decisions.write.mode("overwrite").parquet(part(self.out_dir))
        kept = decisions.filter(F.col("action") == "keep").select("file")
        bdig.join(kept, "file", "left_semi").write.mode("overwrite").parquet(
            part(self._store("digests"))
        )
        bbands.join(kept, "file", "left_semi").write.mode("overwrite").parquet(
            part(self._store("bands"))
        )
        decisions.unpersist()
        bbands.unpersist()
        imgs.unpersist()


def start_image_dedup_stream(
    imgs_stream: DataFrame, ingest: ImageDedupIngest, **opts
):
    """Wire a streaming (file, content) frame through the ingest sink."""
    return (
        imgs_stream.writeStream.foreachBatch(ingest)
        .outputMode("update")
        .options(**opts)
        .start()
    )
