"""ANN index DELETE lifecycle — tombstones, compaction, and the
post-delete serving audit (r11 verdict's top ask: the persisted index
had init/insert/search but a vector could never LEAVE it — no path
for a dedup pipeline that drops documents or a GDPR-style unindex).

Three registered rows complete the lifecycle:

* ``q_sim_nsw_delete`` — the batch form of the delete fold
  (operators/llm.nsw_delete: FreshDiskANN delete consolidation —
  drop dead lists, bridge-repair through the hole, re-prune touched
  survivors), searched by the standard audit query set; oracle
  replays build + compaction + beam CTE-by-CTE (the q_sim_nsw_insert
  convention).
* ``q_ann_delete_recall`` — does the COMPACTED graph still navigate?
  Recall/precision of post-delete search vs (a) a from-scratch
  rebuild on the survivors and (b) the exact survivor truth — the
  measured answer to "delete+compact == never-indexed", which no
  graph-level identity can promise (compaction repairs edges locally;
  a rebuild re-draws candidates globally).
* ``q_sim_hnsw_delete`` — the SERVING form: the persisted two-layer
  store (streaming/ann_index.py) with one delete batch folded in via
  the monitor's own foreachBatch path, searches served from the
  post-delete snapshot; oracle replays the full two-layer
  build + per-layer compaction + descent hand-off.

Reference contract: workflow.py's per-record transform slots
(ilveroluca/flink-pipeline workflow.py:60-118) cannot express a
stateful index mutation; this family is engine-level capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import literal_frame, parallel_frames
from ..catalog import load_table
from ..functions.portable import hash56, hash56_sql_duckdb, round_agg, round_sql
from ..operators.llm import (
    NORM2_SQL,
    SQDIST_Q_PRE_SQL,
    SQDIST_Q_SQL,
    nsw_delete,
    nsw_graph,
    nsw_search,
)
from .llm_ops import (
    EMBED_MULTI_MAX_CELL,
    EMBED_PAIR_NPROBE,
    HNSW_L1_MOD,
    IVF_SEED_CENTROIDS,
    NSW_BEAM,
    NSW_DEG,
    NSW_HOPS,
    PQ_QUERY_MAX,
    _DISTQ_DUCK,
    _NSW_DISTQM,
    _NSW_QS_ENTRY_SQL,
    _nsw_beam_sql,
    _nsw_graph_sql_for,
)
from .registry import register

# the deleted slice: a deterministic ~1/8 hash residue, disjoint from
# layer-1's residue 0 and the insert family's residue 5 so the three
# deterministic subsets never degenerate into the same vectors
NSW_DELETE_MOD = 8
NSW_DELETE_REM = 3


def _dels_sql() -> str:
    h = hash56_sql_duckdb("vec_id")
    return f"""dels AS (
        SELECT vec_id FROM embeddings
        WHERE {h} % {NSW_DELETE_MOD} = {NSW_DELETE_REM}
    )"""


def _nsw_delete_sql(adj: str, p: str, keep_dist: bool = False) -> str:
    """kept/bridge/dadj CTE text — the delete consolidation over a
    scored adjacency CTE ``adj`` and the ``dels`` tombstone CTE,
    mirroring operators/llm.nsw_delete line by line: surviving edges
    keep their stored distance; every (survivor u -> deleted d) edge
    is replaced by bridge candidates (u -> w) for d's surviving
    out-neighbors w, scored ONCE per undirected pair in canonical
    (least, greatest) order; the union re-prunes per-src to 2*deg.
    ONE text shared by the single-layer row and both layers of the
    served form, so the compaction rule cannot fork."""
    dcol = ", dist_q" if keep_dist else ""
    return f"""{p}kept AS (
        SELECT a.src, a.dst, a.dist_q FROM {adj} a
        WHERE a.src NOT IN (SELECT vec_id FROM dels)
          AND a.dst NOT IN (SELECT vec_id FROM dels)
    ), {p}bridge AS (
        SELECT t.u AS src, t.w AS dst,
               {_DISTQ_DUCK.format(a='sa.embedding', b='sb.embedding')}
                   AS dist_q
        FROM (SELECT DISTINCT l.src AS u, o.dst AS w
              FROM {adj} l JOIN {adj} o ON o.src = l.dst
              WHERE l.src NOT IN (SELECT vec_id FROM dels)
                AND l.dst IN (SELECT vec_id FROM dels)
                AND o.dst NOT IN (SELECT vec_id FROM dels)
                AND o.dst <> l.src) t
        JOIN embeddings sa ON sa.vec_id = least(t.u, t.w)
        JOIN embeddings sb ON sb.vec_id = greatest(t.u, t.w)
    ), {p}dadj AS MATERIALIZED (
        SELECT src, dst{dcol} FROM (
            SELECT src, dst, dist_q,
                   row_number() OVER (
                       PARTITION BY src ORDER BY dist_q, dst) AS rn
            FROM (SELECT DISTINCT src, dst, dist_q FROM (
                      SELECT src, dst, dist_q FROM {p}kept
                      UNION ALL
                      SELECT src, dst, dist_q FROM {p}bridge) z) m
        ) t WHERE rn <= {2 * NSW_DEG}
    )"""


# entry for post-delete searches: the minimum SURVIVING vec_id (the
# global min may be tombstoned — seeding there would beam from a node
# the compacted graph no longer contains)
_SENTRY_SQL = """sentry AS (
        SELECT min(vec_id) AS node FROM embeddings
        WHERE vec_id NOT IN (SELECT vec_id FROM dels)
    )"""

_SENTRY_B0 = f"""SELECT q.query_id, e.node, {_NSW_DISTQM} AS dist_q
        FROM qs q CROSS JOIN sentry e JOIN embeddings m ON m.vec_id = e.node"""


def _final_survivor_sql(b_last: str) -> str:
    """Final ranking with the tombstone mask: excluded ids are dropped
    BEFORE ranking (operators/llm.nsw_search's ``exclude`` contract),
    so ranks stay gapless over survivors. On a compacted adjacency
    the mask is a no-op enforcing the contract."""
    return f"""
    SELECT query_id, neighbor_id, rank, dist_q FROM (
        SELECT query_id, node AS neighbor_id, dist_q,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY dist_q, node) AS rank
        FROM {b_last}
        WHERE node <> query_id
          AND node NOT IN (SELECT vec_id FROM dels)
    ) t WHERE rank <= 3
    """


def _register_nsw_delete():
    """Build (scored) + delete-compaction + survivor-entry beam, every
    stage composing the shared text builders (the insert-row
    convention)."""
    oracle = (
        f"""
    WITH {_nsw_graph_sql_for("embeddings", "", keep_dist=True)}, {_dels_sql()},
    {_nsw_delete_sql("adj", "x")}, {_NSW_QS_ENTRY_SQL}, {_SENTRY_SQL}, """
        + _nsw_beam_sql("xdadj", "s", b0=_SENTRY_B0)
        + _final_survivor_sql(f"sb{NSW_HOPS}")
    )

    @register("q_sim_nsw_delete", oracle=oracle)
    def q_sim_nsw_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
        """NSW index DELETE + compaction (FreshDiskANN's delete
        consolidation, Singh et al. 2021 — the operation that
        completes the index lifecycle init/insert/search started): a
        deterministic ~1/{mod} hash slice of the corpus is unindexed
        from the built graph — deleted nodes' edge lists drop, every
        survivor that lost an edge to a deleted node adopts that
        node's surviving out-neighbors as repair candidates (the
        bridge through the hole that keeps the graph navigable), and
        touched lists re-prune to their 2*{deg} nearest — then the
        standard audit query set searches the COMPACTED graph from
        the minimum surviving entry. No rebuild anywhere; a deleted
        vector can never be returned (the final rank carries the
        tombstone mask, a no-op here by construction — the beam can
        only reach survivors — kept to make the contract literal).

        Scale: edges into the deleted set are <= 2*{deg} x |D|, so
        repair work is O(|D| * deg^2) — linear in the delete batch,
        independent of corpus size; membership tests are
        key-partitioned anti/semi joins (the delete set is
        corpus-derived, deliberately never broadcast); the re-prune
        is one per-src window. The serving twin — the same fold
        applied to the persisted store via foreachBatch, tombstones
        appended, stream==batch pinned — is streaming/ann_index.py;
        q_ann_delete_recall measures what compaction preserves vs a
        from-scratch rebuild."""
        emb = load_table(spark, sf_dir, "embeddings")
        is_del = (
            hash56(F.col("vec_id")) % NSW_DELETE_MOD == NSW_DELETE_REM
        )
        adj0 = nsw_graph(
            emb,
            emb.filter(F.col("vec_id") < IVF_SEED_CENTROIDS),
            deg=NSW_DEG,
            max_cell=EMBED_MULTI_MAX_CELL,
            nprobe=EMBED_PAIR_NPROBE,
            keep_dist=True,
        ).localCheckpoint(eager=True)
        dels = emb.filter(is_del).select("vec_id")
        dadj = nsw_delete(emb, adj0, dels, NSW_DEG).localCheckpoint(
            eager=True
        )
        surv = emb.filter(~is_del)
        return nsw_search(
            surv,
            emb.filter(F.col("vec_id") < PQ_QUERY_MAX),
            dadj.select("src", "dst"),
            k=3,
            beam=NSW_BEAM,
            hops=NSW_HOPS,
            exclude=dels,
        )

    q_sim_nsw_delete.__doc__ = q_sim_nsw_delete.__doc__.format(
        mod=NSW_DELETE_MOD, deg=NSW_DEG
    )
    return q_sim_nsw_delete


q_sim_nsw_delete = _register_nsw_delete()


def _register_delete_recall():
    """Three searches over one survivor truth: the compacted graph,
    a from-scratch rebuild on the survivors, and the exact
    brute-force top-3 — all composed from the shared builders."""
    truth_sql = f"""truth AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_DISTQ_DUCK.format(a='q.embedding',
                                                    b='e.embedding')},
                                e.vec_id) AS rank
            FROM embeddings q JOIN embeddings e
              ON e.vec_id <> q.vec_id
             AND e.vec_id NOT IN (SELECT vec_id FROM dels)
            WHERE q.vec_id < {PQ_QUERY_MAX}
        ) t WHERE rank <= 3
    )"""
    oracle = (
        f"""
    WITH {_nsw_graph_sql_for("embeddings", "", keep_dist=True)}, {_dels_sql()},
    {_nsw_delete_sql("adj", "x")}, sv AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id NOT IN (SELECT vec_id FROM dels)
    ), {_nsw_graph_sql_for("sv", "r")}, {_NSW_QS_ENTRY_SQL}, {_SENTRY_SQL},
    {truth_sql}, """
        + _nsw_beam_sql("xdadj", "c", b0=_SENTRY_B0)
        + ", "
        + _nsw_beam_sql("radj", "g", b0=_SENTRY_B0)
        + f""", cm AS (
        SELECT query_id, node AS neighbor_id FROM (
            SELECT query_id, node,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY dist_q, node) AS rank
            FROM cb{NSW_HOPS}
            WHERE node <> query_id
              AND node NOT IN (SELECT vec_id FROM dels)
        ) t WHERE rank <= 3
    ), rm AS (
        SELECT query_id, node AS neighbor_id FROM (
            SELECT query_id, node,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY dist_q, node) AS rank
            FROM gb{NSW_HOPS}
            WHERE node <> query_id
        ) t WHERE rank <= 3
    ), m AS (
        SELECT 'compacted' AS method, query_id, neighbor_id FROM cm
        UNION ALL
        SELECT 'rebuilt', query_id, neighbor_id FROM rm
        UNION ALL
        SELECT 'exact', query_id, neighbor_id FROM truth
    ), counts AS (
        SELECT m.method,
               CAST(count(*) AS BIGINT) AS n_method,
               CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM m LEFT JOIN truth t
          ON t.query_id = m.query_id AND t.neighbor_id = m.neighbor_id
        GROUP BY m.method
    ), grid AS (
        SELECT unnest(['exact', 'compacted', 'rebuilt']) AS method
    ), tt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
    SELECT g.method, tt.n_truth,
           CAST(coalesce(c.n_method, 0) AS BIGINT) AS n_method,
           CAST(coalesce(c.hits, 0) AS BIGINT) AS hits,
           {round_sql('coalesce(c.hits, 0)::DOUBLE / tt.n_truth')} AS recall,
           CASE WHEN coalesce(c.n_method, 0) = 0 THEN 0.0
                ELSE {round_sql('c.hits::DOUBLE / c.n_method')} END AS prec
    FROM grid g LEFT JOIN counts c ON c.method = g.method
    CROSS JOIN tt
    """
    )

    @register("q_ann_delete_recall", oracle=oracle)
    def q_ann_delete_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Post-delete navigability audit — the measured answer to
        "is delete+compact as good as never having indexed the
        deleted slice?", which no graph identity can promise (the
        compaction repairs edges LOCALLY through each hole; a rebuild
        re-draws candidates globally), so it is priced instead:

          'compacted' — beam search over the delete-compacted graph
                        (q_sim_nsw_delete's index);
          'rebuilt'   — the same beam over a from-scratch nsw_graph
                        built on the survivors only (what
                        never-indexed would serve);
          'exact'     — brute-force top-3 by quantized L2 among the
                        survivors, the recall=1 control row.

        compacted == rebuilt recall is the serving claim a production
        store makes when it tombstones instead of rebuilding; a gap
        here is the price of deferring compaction-quality work, and
        this row is where it would show.

        Scale: the truth stage is queries x survivor corpus
        (broadcast query side — the vetted linear audit class); both
        method stages are O(beam * deg * hops) per query; the hit
        join and rollup run on <= 3k rows; the denominator is a
        1-row broadcast (audit convention)."""
        emb = load_table(spark, sf_dir, "embeddings")
        is_del = (
            hash56(F.col("vec_id")) % NSW_DELETE_MOD == NSW_DELETE_REM
        )
        seeds = emb.filter(F.col("vec_id") < IVF_SEED_CENTROIDS)
        queries = emb.filter(F.col("vec_id") < PQ_QUERY_MAX)
        dels = emb.filter(is_del).select("vec_id")
        surv = emb.filter(~is_del)
        kw = dict(
            deg=NSW_DEG,
            max_cell=EMBED_MULTI_MAX_CELL,
            nprobe=EMBED_PAIR_NPROBE,
        )
        qd = queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("eq"),
            F.expr(NORM2_SQL.format(a="embedding")).alias("nq2"),
        )
        wt = Window.partitionBy("query_id").orderBy("dist_q", "neighbor_id")
        # three INDEPENDENT eager chains — the original build + its
        # delete-compaction, the survivor rebuild, and the exact truth
        # — overlap on driver threads (guide §2.6) instead of running
        # their checkpoint jobs back-to-back
        dadj, radj, truth = parallel_frames(
            lambda: nsw_delete(
                emb,
                nsw_graph(emb, seeds, keep_dist=True, **kw).localCheckpoint(
                    eager=True
                ),
                dels,
                NSW_DEG,
            ).localCheckpoint(eager=True),
            lambda: nsw_graph(surv, seeds, **kw).localCheckpoint(eager=True),
            lambda: (
                surv.withColumn(
                    "nb2", F.expr(NORM2_SQL.format(a="embedding"))
                )
                .join(
                    F.broadcast(qd), F.col("vec_id") != F.col("query_id")
                )
                .select(
                    "query_id",
                    F.col("vec_id").alias("neighbor_id"),
                    F.expr(
                        SQDIST_Q_PRE_SQL.format(
                            a="eq", b="embedding", na2="nq2", nb2="nb2"
                        )
                    ).alias("dist_q"),
                )
                .withColumn("rank", F.row_number().over(wt))
                .filter(F.col("rank") <= 3)
                .select("query_id", "neighbor_id")
                .localCheckpoint(eager=True)
            ),
        )
        skw = dict(k=3, beam=NSW_BEAM, hops=NSW_HOPS)
        comp = nsw_search(
            surv, queries, dadj.select("src", "dst"), exclude=dels, **skw
        ).select("query_id", "neighbor_id")
        reb = nsw_search(surv, queries, radj, **skw).select(
            "query_id", "neighbor_id"
        )
        m = (
            comp.withColumn("method", F.lit("compacted"))
            .unionByName(reb.withColumn("method", F.lit("rebuilt")))
            .unionByName(truth.withColumn("method", F.lit("exact")))
        )
        hit = truth.withColumn("is_hit", F.lit(1))
        counts = (
            m.join(hit, ["query_id", "neighbor_id"], "left")
            .groupBy("method")
            .agg(
                F.count("*").cast("long").alias("n_method"),
                F.sum(F.coalesce(F.col("is_hit"), F.lit(0)))
                .cast("long")
                .alias("hits"),
            )
        )
        grid = literal_frame(spark,
            [("exact",), ("compacted",), ("rebuilt",)], "method STRING"
        )
        tt = truth.agg(F.count("*").cast("long").alias("n_truth"))
        return (
            grid.join(counts, "method", "left")
            .crossJoin(F.broadcast(tt))
            .select(
                "method",
                "n_truth",
                F.coalesce(F.col("n_method"), F.lit(0))
                .cast("long")
                .alias("n_method"),
                F.coalesce(F.col("hits"), F.lit(0))
                .cast("long")
                .alias("hits"),
                round_agg(
                    F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                    / F.col("n_truth")
                ).alias("recall"),
                F.when(
                    F.coalesce(F.col("n_method"), F.lit(0)) == 0, F.lit(0.0)
                )
                .otherwise(
                    round_agg(
                        F.col("hits").cast("double") / F.col("n_method")
                    )
                )
                .alias("prec"),
            )
        )

    return q_ann_delete_recall


q_ann_delete_recall = _register_delete_recall()


def _hnsw_del_store_dir(sf_dir: str) -> str:
    """Store path for the POST-DELETE snapshot of sf_dir's persisted
    index: the base store's content key (corpus file identity + build
    constants + the operator/store MODULE sources — _hnsw_store_key
    already folds whole modules in, so the delete fold and the
    monitor's tombstone paths are covered) extended with the delete
    constants."""
    import hashlib
    import os

    from .llm_ops import _hnsw_store_dir

    base = _hnsw_store_dir(sf_dir)
    key = hashlib.md5(
        f"{base}\x00{NSW_DELETE_MOD}|{NSW_DELETE_REM}".encode()
    ).hexdigest()[:16]
    return os.path.join(os.path.dirname(base), f"del-{key}")


def hnsw_delete_store_for(spark: SparkSession, sf_dir: str):
    """The persisted post-delete HNSW index monitor for ``sf_dir``:
    ensure the BASE store (built once, shared with q_sim_hnsw_search),
    copy its sentinel snapshot, fold ONE delete batch (the hash-slice
    tombstones) through the monitor's own foreachBatch path as batch
    0, and publish atomically (the hnsw_store_for race convention:
    one rename wins, the loser discards)."""
    import os
    import shutil

    from ..streaming.heavy import publish_store
    from .llm_ops import _hnsw_monitor, hnsw_store_for

    store = _hnsw_del_store_dir(sf_dir)
    if not os.path.isdir(os.path.join(store, "adj", "batch_id=0")):
        base_mon = hnsw_store_for(spark, sf_dir)
        tmp = f"{store}.build.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        for kind in ("adj", "vecs"):
            shutil.copytree(
                os.path.join(base_mon.store_dir, kind, "batch_id=-1"),
                os.path.join(tmp, kind, "batch_id=-1"),
            )
        emb = load_table(spark, sf_dir, "embeddings")
        batch = emb.filter(
            hash56(F.col("vec_id")) % NSW_DELETE_MOD == NSW_DELETE_REM
        ).select("vec_id", "embedding", F.lit("delete").alias("op"))
        _hnsw_monitor(tmp)(batch, 0)
        publish_store(tmp, store)
    return _hnsw_monitor(store)


def _hnsw_delete_ctes(dels_sql: str) -> str:
    """The WITH-body of the two-layer post-delete unroll: both layer
    graphs (scored), the ``dels`` tombstone CTE (parameterized —
    q_sim_hnsw_delete passes the hash slice, the dedup→unindex row
    passes the dedup drop set), per-layer delete consolidation, the
    layer-1 beam from the minimum SURVIVING layer-1 member, the
    per-query hand-off, and the base-layer beam over the compacted
    base graph (final CTE ``bb{hops}``). Factored out of the full
    oracle (r13) so the unindex recall audit can compose the same
    beams with its own truth/rollup tail."""
    l1 = f"""l1v AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE {hash56_sql_duckdb('vec_id')} % {HNSW_L1_MOD} = 0
    )"""
    uentry = """uentry AS (
        SELECT min(vec_id) AS node FROM l1v
        WHERE vec_id NOT IN (SELECT vec_id FROM dels)
    )"""
    hand_off = f"""e0 AS (
        SELECT query_id, node FROM (
            SELECT query_id, node,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY dist_q, node) AS rn
            FROM ab{NSW_HOPS}
        ) t WHERE rn = 1
    )"""
    b0_l1 = f"""SELECT q.query_id, e.node, {_NSW_DISTQM} AS dist_q
        FROM qs q CROSS JOIN uentry e JOIN embeddings m ON m.vec_id = e.node"""
    b0_base = f"""SELECT q.query_id, e.node, {_NSW_DISTQM} AS dist_q
        FROM qs q JOIN e0 e ON e.query_id = q.query_id
        JOIN embeddings m ON m.vec_id = e.node"""
    return (
        f"""{l1}, {_nsw_graph_sql_for("l1v", "u", keep_dist=True)},
    {_nsw_graph_sql_for("embeddings", "z", keep_dist=True)}, {dels_sql},
    {_nsw_delete_sql("uadj", "du")}, {_nsw_delete_sql("zadj", "dz")},
    {_NSW_QS_ENTRY_SQL}, {uentry}, """
        + _nsw_beam_sql("dudadj", "a", b0=b0_l1)
        + f", {hand_off}, "
        + _nsw_beam_sql("dzdadj", "b", b0=b0_base)
    )


def _hnsw_delete_oracle_sql() -> str:
    """The full two-layer post-delete unroll: both layer graphs
    (scored), the shared tombstone slice, per-layer delete
    consolidation, the layer-1 beam from the minimum SURVIVING
    layer-1 member, the per-query hand-off, the base-layer beam over
    the compacted base graph, and the survivor-masked final ranking
    — every stage composed from the same text builders as
    q_sim_hnsw_topk/q_sim_nsw_delete."""
    return (
        "\n    WITH "
        + _hnsw_delete_ctes(_dels_sql())
        + _final_survivor_sql(f"bb{NSW_HOPS}")
    )


@register("q_sim_hnsw_delete", oracle=_hnsw_delete_oracle_sql())
def q_sim_hnsw_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-layer HNSW search SERVED FROM THE PERSISTED STORE AFTER A
    DELETE BATCH — the serving form of q_sim_nsw_delete and the row
    that makes the store's lifecycle complete (init -> insert ->
    DELETE -> search): the shared base store (q_sim_hnsw_search's,
    built once) is copied, the hash-slice tombstones fold through the
    monitor's own foreachBatch path as batch 0 — both layer
    adjacencies compact via operators/llm.nsw_delete, tombstones
    append to the store's log — and every subsequent run serves
    search-only from the post-delete snapshot, with the tombstone
    mask excluding deleted ids from the final beam (a no-op on the
    compacted graph, kept to make the never-serve-deleted contract
    literal). The post-delete store is cache-keyed on the base
    store's content key PLUS the delete constants and the delete
    fold's source text, so an edited compaction rule can never serve
    a stale snapshot.

    Correctness contract: the stored post-delete snapshot is the
    deterministic compaction of the deterministic build, so the
    served answer must equal the replayed one — the oracle unrolls
    both layer builds, both per-layer consolidations, the layer-1
    descent from the minimum SURVIVING layer-1 member, the hand-off,
    and the survivor-masked final rank. A stale or corrupted store
    surfaces as a driver hash mismatch.

    Scale: serving touches O(beam * 2*deg * hops) nodes per query
    independent of corpus size — unchanged by the delete (the
    SCALING probe pins serve-stays-flat post-delete); the one-time
    compaction is O(|D| * deg^2) repair work on key-partitioned
    joins, never a rebuild. Stream==batch and crash-replay are
    pytest-pinned (tests/test_round12_ops.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    mon = hnsw_delete_store_for(spark, sf_dir)
    return mon.search(
        spark, emb.filter(F.col("vec_id") < PQ_QUERY_MAX), after_batch_id=0
    )
