"""Session cache hygiene.

The query library persists intermediate frames that the FINAL lazy
plan consumes (shingle sets, scored corpora) — those cannot be
released before the caller materializes the result, so they stay
cached, LRU-evictable, until session end. Fine for one-shot driver /
bench runs; in a long-lived 100 TB session repeated pipeline
invocations would accrete evictable blocks and thrash the storage
tier (r6 advice). Two tools close that hole:

* ``release_caches(spark)`` — drop every cached DataFrame and any
  stray persisted RDD in the session. Call between pipelines in a
  long-lived session. Total by design: the library's caches are all
  rebuildable one-scan intermediates, never irreplaceable state.
* ``eager_checkpoint(df)`` — for operators whose cached inputs feed
  only INTERMEDIATE results (incremental_dedup's signature index,
  substring_dedup_stats' duplicated-span table): reliably checkpoint
  the small derived frame NOW, so the corpus-sized caches can be
  unpersisted before the operator returns — zero persisted residue,
  verified by tests/test_llm_ops.py::test_cache_hygiene_*.

Reliable checkpoint (not localCheckpoint) is deliberate: local
checkpoint blocks live in the storage tier — exactly what hygiene is
trying to empty — while reliable checkpoint writes to the checkpoint
dir and leaves zero cached blocks. Checkpoint files are removed by
the ContextCleaner when ``spark.cleaner.referenceTracking
.cleanCheckpoints`` is set (session.py sets it); under a foreign
session without it they persist until JVM exit — disk residue in
/tmp, never memory residue.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Reliable-checkpoint ``df`` immediately and return the
    checkpointed frame.

    If the session has no checkpoint dir, one is auto-provisioned ONLY
    in local mode (the driver's bare local session): a driver-local
    tempdir is correct there. On a real cluster a reliable checkpoint
    must land on storage every executor can read — auto-picking a
    driver /tmp path would scatter partitions across executor-local
    disks and fail on read — so a cluster deployment must call
    ``sc.setCheckpointDir`` with a shared path (HDFS/S3) at session
    build; this raises loudly instead of guessing."""
    spark = df.sparkSession
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        if sc.master.startswith("local"):
            sc.setCheckpointDir(tempfile.mkdtemp(prefix="fps_ckpt_"))
        else:
            raise RuntimeError(
                "eager_checkpoint: no checkpoint dir set on a non-local "
                "master — call spark.sparkContext.setCheckpointDir with "
                "a SHARED filesystem path (HDFS/S3) at session build"
            )
    return df.checkpoint(eager=True)


def release_caches(spark: SparkSession) -> int:
    """Unpersist every cached DataFrame (Spark SQL cache manager) and
    any remaining persisted RDD. Returns the number of persisted RDDs
    that were still registered before the sweep."""
    jsc = spark.sparkContext._jsc
    n = jsc.getPersistentRDDs().size()
    spark.catalog.clearCache()
    # py4j maps java.util.Map to a dict-like view
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    return n


def materialize(df: DataFrame) -> DataFrame:
    """``persist()`` + force the cache to fill NOW (one count() job),
    returning ``df``.

    A lazily-persisted frame consumed by several branches of ONE
    action is computed CONCURRENTLY by every branch until the cache
    fills — Spark's cache has no "wait for the partition another task
    is already computing" gate, so an expensive shared subtree (the
    shingle pass, an IVF assignment, a verified pair graph) runs 2-5x
    before any block lands (measured r15: the minhash verify stage of
    q_dedup_recall fell 4.3 s -> 0.9 s once its shingle sets were
    materialized first). One count() pays the subtree exactly once and
    every consumer then reads the cache. Storage semantics are
    identical to persist(): blocks are LRU-evictable and released by
    release_caches()/clearCache."""
    df.persist()
    df.count()
    return df


def parallel_frames(*thunks):
    """Build independent DataFrames on concurrent driver threads and
    return them in argument order.

    Audit/lifecycle queries chain several INDEPENDENT eager
    materializations (graph builds, exact-truth lists, per-method
    sub-searches) whose internal ``localCheckpoint(eager=True)`` jobs
    otherwise run strictly serially during query construction — at
    sf0.1 that serialization, not compute, dominates their wall time
    (each chain leaves most cores idle). Spark's scheduler happily
    runs jobs from several driver threads at once, so submitting each
    chain from its own thread lets the next chain's tasks back-fill
    the tail of the current one (optimization guide §2.6). FIFO
    scheduling keeps per-job semantics identical; results are
    deterministic because each thunk builds its frame independently.

    Exceptions propagate to the caller: the LOWEST-INDEX failing
    thunk's error wins (results are awaited in argument order), and
    sibling thunks still run to completion — their Spark jobs are not
    cancelled — before the pool exits."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def literal_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A tiny literal DataFrame built from pure JVM expressions —
    drop-in for ``spark.createDataFrame(rows, schema)`` on small
    constant tables (audit grids, block-pair tables, band maps).

    ``createDataFrame`` over a local Python list parallelizes the
    rows into defaultParallelism pickled slices, so EVERY
    materialization of the frame (each broadcast build, each reuse
    after clearCache) spawns a full wave of Python-worker tasks just
    to deserialize a handful of constants — measured r14: ~0.15-0.5 s
    of blocked task time per materialization at local[32], in zero-
    input 32-task stages. ``range(1) + inline(array(struct(...)))``
    keeps the constants inside the JVM plan: no Python tasks, no
    pickling, byte-identical values."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if not rows:
        # F.array() of zero struct elements leaves the column untyped
        # and star-expansion fails with a cryptic analysis error
        # (ADVICE r14); the row path handles [] fine and is never hot.
        return spark.createDataFrame([], schema)
    st = StructType.fromDDL(schema)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    # range(len) + element_at, NOT range(1) + inline: the range row
    # count is the optimizer's cardinality estimate for the frame, and
    # an estimate of 1 row flips downstream join build-side choices
    # (measured r14: cosine_pairs' triangle join degraded 2.3x when
    # its block-pair table read as 1 row)
    arr = F.array(*structs)
    return (
        spark.range(len(rows))
        .select(
            F.element_at(arr, (F.col("id") + 1).cast("int")).alias("_r")
        )
        .select("_r.*")
    )
