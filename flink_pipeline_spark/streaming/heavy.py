"""Streaming heavy hitters: a Misra-Gries frequency summary maintained
across micro-batches in a persisted store — the unbounded-retention
answer for "which keys dominate the stream so far" when the key domain
(users, IPs, doc sources) is far too large to count exactly in state.

Algorithm (Misra-Gries k-summary, merged per batch): the summary holds
at most ``k`` (key, est) counters. Each micro-batch's EXACT counts
(bounded by the batch, not the stream) merge into the prior summary by
addition; if more than k keys remain, every counter decrements by the
(k+1)-th largest estimate and non-positive counters drop. The merge
preserves the MG guarantees stream-wide:

* underestimate: est(key) <= true(key) for every key, always;
* bounded error: true(key) - est(key) <= floor(N / (k+1)) where N is
  the total count seen so far (tracked in a 1-row meta table);
* completeness: any key with true frequency > N/(k+1) is IN the
  summary (its estimate cannot have reached zero).

So the monitor never misses a true heavy hitter and its counts are
certifiably close — the property tests pin all three against exact
batch counts (tests/test_streaming.py).

Store layout and replay idempotence follow streaming/dedup.py: each
batch writes the FULL new summary (<= k rows — tiny) and a 1-row meta
(n_total) into ``batch_id=N`` partitions with overwrite semantics, and
each read takes the LATEST partition strictly BEFORE the current batch
— a crashed batch re-derives byte-identical summaries instead of
compounding its own half-written state. Determinism: the (k+1)-th
largest estimate is selected with a full (est DESC, key) tiebreak, so
a replayed or re-partitioned batch always decrements by the same value.

Per-trigger cost: one exact groupBy on the batch (map-side combined),
a <= (k + batch-distinct)-row merge, one tiny write. Nothing
stream-history-sized is ever scanned or shuffled; the summary IS the
history. foreachBatch is the right hook because the summary is shared
cross-batch state, not per-key evolving state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def partition_ids(spark, path: str) -> list[int]:
    """List the ``batch_id=N`` partition ids under ``path`` via the
    Hadoop FS API (local and HDFS alike) — a driver-side listing, no
    Spark job. Missing root maps to []."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    out: list[int] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        try:
            out.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue
    return out


def prune_partitions(spark, path: str, keep_from: int) -> None:
    """Delete ``batch_id=B`` partitions under ``path`` with
    B < ``keep_from`` via the Hadoop FS API (local and HDFS alike).
    The one snapshot-prune rule every monitor shares (ADVICE r10:
    previously triplicated verbatim across heavy/merge/quantile/kmv,
    where a future fix to prune semantics could silently fork):
    pruning to ``batch_id - 1`` after a successful write keeps the
    latest snapshot plus one prior, which preserves crash-replay — a
    replayed batch N still reads latest-strictly-before-N."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid < keep_from:
            fs.delete(st.getPath(), True)


def publish_store(tmp: str, store: str) -> None:
    """Atomically publish a built store dir ``tmp`` at ``store`` — the
    one publish rule every persisted-index builder shares. Concurrent
    builders race benignly: one rename wins, the loser's rename fails
    (target exists) and its private build dir is discarded. A rename
    that fails for a NON-race reason (EXDEV, permissions) used to be
    silently treated as a lost race, returning a monitor over a
    nonexistent store that failed later with a confusing
    missing-partition error (ADVICE r12) — so after the
    rename/cleanup, the published dir must actually exist. The tmp
    dir is deleted ONLY when the rename lost a benign race (the
    winner's store exists afterward) — on a non-race failure (EXDEV,
    permissions) the expensive build is left in place and its path
    named in the error, so recovery is a manual move instead of a
    full rebuild (ADVICE r13)."""
    import shutil

    os.makedirs(os.path.dirname(store), exist_ok=True)
    try:
        os.rename(tmp, store)
    except OSError:
        if os.path.isdir(store):
            # lost a benign race: the winner published; discard ours
            shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.isdir(store):
        raise RuntimeError(
            f"store publish failed: {store} missing after rename from "
            f"{tmp} — not a lost race (the winner's dir would exist); "
            "check rename support (EXDEV?) and permissions on the "
            f"cache root. The built artifacts are intact at {tmp}."
        )


def split_ops(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(dels, arrivals) from a micro-batch frame that optionally
    carries an ``op`` column — the one batch-splitting rule the
    index-store monitors share. A frame without ``op`` is all
    arrivals. A frame WITH ``op`` must carry only 'insert'/'delete':
    a typo'd op value used to be silently dropped, losing data with
    no error (ADVICE r12), so the split validates the batch first
    (one tiny existence probe on the batch — bounded by the trigger,
    never the stream)."""
    spark = batch.sparkSession
    if "op" not in batch.columns:
        return (
            spark.createDataFrame([], "vec_id BIGINT"),
            batch.select("vec_id", "embedding"),
        )
    bad = batch.filter(
        ~F.col("op").isin("insert", "delete") | F.col("op").isNull()
    )
    if not bad.isEmpty():
        raise ValueError(
            "index store: batch contains rows whose op is neither "
            "'insert' nor 'delete' — refusing to silently drop data"
        )
    return (
        batch.filter(F.col("op") == "delete").select("vec_id"),
        batch.filter(F.col("op") == "insert").select("vec_id", "embedding"),
    )


class HeavyHitterMonitor:
    """foreachBatch sink: maintain a k-counter Misra-Gries summary of
    ``key_col`` frequencies across all batches seen so far."""

    def __init__(self, store_dir: str, k: int = 20, key_col: str = "user_id"):
        self.store_dir = store_dir
        self.k = k
        self.key_col = key_col

    def _path(self, kind: str) -> str:
        return os.path.join(self.store_dir, kind)

    def _read_latest(
        self, spark, kind: str, schema: str, batch_id: int
    ) -> DataFrame:
        """The newest partition strictly BEFORE ``batch_id`` (the
        summary is a snapshot, not an append-only log). A missing or
        empty store maps to empty; a store whose surviving partitions
        are ALL >= ``batch_id`` raises — pruning keeps only the latest
        and one prior snapshot, so the requested history no longer
        exists, and an empty frame would silently misreport it as
        "nothing seen yet" (ADVICE r9). Batch 0 nuance (ADVICE r10):
        a replayed batch 0 legitimately has no prior snapshot, and a
        non-empty store would trip the raise — safe because Structured
        Streaming never replays batch 0 after batch 1 commits (the
        checkpoint advances only on commit), so surviving partitions
        at batch 0 can only mean the store dir is being REUSED by a
        new stream, which gets its own distinct error. The partition
        is selected by a driver-side FS listing (no historical-
        partition scan) and read directly, so this method never races
        its own prune; EXTERNAL concurrent readers listing the store
        root must tolerate pruned partitions (set
        spark.sql.files.ignoreMissingFiles for monitor reads)."""
        bids = partition_ids(spark, self._path(kind))
        prior = [b for b in bids if b < batch_id]
        if not prior:
            if bids:
                hint = (
                    "store already populated at batch 0 — a new "
                    "stream must start from a fresh store dir"
                    if batch_id == 0
                    else f"no snapshot before batch {batch_id} "
                    "survives pruning"
                )
                raise ValueError(f"{kind}: {hint} (have {sorted(bids)})")
            return spark.createDataFrame([], schema)
        part = os.path.join(self._path(kind), f"batch_id={max(prior)}")
        return spark.read.schema(schema).parquet(part)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prior = self._read_latest(
            spark, "summary", "key STRING, est BIGINT", batch_id
        )
        meta = self._read_latest(spark, "meta", "n_total BIGINT", batch_id)

        bc = (
            batch.select(F.col(self.key_col).cast("string").alias("key"))
            .groupBy("key")
            .agg(F.count("*").cast("long").alias("bn"))
        )
        merged = (
            prior.join(bc, "key", "full_outer")
            .select(
                "key",
                (
                    F.coalesce("est", F.lit(0).cast("long"))
                    + F.coalesce("bn", F.lit(0).cast("long"))
                ).alias("est"),
            )
            .persist()
        )
        # the Misra-Gries reduction: subtract the (k+1)-th largest
        # estimate (0 when <= k keys survive the merge) from everyone,
        # drop the non-positive. Deterministic tiebreak on the key.
        w = Window.orderBy(F.col("est").desc(), "key")
        kth1 = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == self.k + 1)
            .select(F.col("est").alias("d"))
        )
        # 1-row-or-empty frame -> coalesce to 0 via a left anti trick:
        # cross join against the (possibly empty) frame loses rows, so
        # aggregate it to exactly one row first
        d1 = kth1.agg(
            F.coalesce(F.max("d"), F.lit(0).cast("long")).alias("d")
        )
        summary = (
            merged.crossJoin(F.broadcast(d1))
            .select("key", (F.col("est") - F.col("d")).alias("est"))
            .filter(F.col("est") > 0)
        )
        batch_n = batch.select(
            F.count("*").cast("long").alias("bn")
        )
        n_total = (
            meta.select(F.col("n_total"))
            .unionByName(batch_n.select(F.col("bn").alias("n_total")))
            .agg(F.sum("n_total").cast("long").alias("n_total"))
        )

        def part(kind: str) -> str:
            return os.path.join(self._path(kind), f"batch_id={batch_id}")

        summary.write.mode("overwrite").parquet(part("summary"))
        n_total.write.mode("overwrite").parquet(part("meta"))
        merged.unpersist()
        # prune snapshots older than the one prior partition after a
        # successful write: _read_latest re-lists ALL historical
        # partitions, so an unpruned store costs linearly more per
        # trigger (quadratic cumulative) for a summary that only ever
        # needs the latest snapshot (ADVICE r8). Keeping batch N-1
        # preserves crash-replay: a replayed batch N still reads
        # latest-strictly-before-N.
        self._prune_before(spark, "summary", batch_id - 1)
        self._prune_before(spark, "meta", batch_id - 1)

    def _prune_before(self, spark, kind: str, keep_from: int) -> None:
        prune_partitions(spark, self._path(kind), keep_from)

    def summary(self, spark, after_batch_id: int) -> DataFrame:
        """The summary as of AFTER ``after_batch_id`` (key, est)."""
        return self._read_latest(
            spark, "summary", "key STRING, est BIGINT", after_batch_id + 1
        )

    def n_total(self, spark, after_batch_id: int) -> DataFrame:
        """1-row (n_total) frame as of AFTER ``after_batch_id`` —
        returned lazily (callers collect; the package does not)."""
        return self._read_latest(
            spark, "meta", "n_total BIGINT", after_batch_id + 1
        )


def start_heavy_hitter_stream(
    events_stream: DataFrame, monitor: HeavyHitterMonitor, **opts
):
    """Wire a streaming events frame through the monitor sink."""
    return (
        events_stream.writeStream.foreachBatch(monitor)
        .outputMode("update")
        .options(**opts)
        .start()
    )
