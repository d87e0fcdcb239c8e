"""Compressed-index SERVING — q_sim_ivfpq_rerank's two-stage shape
(ADC shortlist from PQ codes, exact full-vector re-rank) served from
a PERSISTED store instead of built per run (r11 verdict's #6 ask):
streaming/pq_index.py holds the frozen residual codebook, the
centroid set, and the append-only cell-tagged code log; the corpus
parquet remains the cold full-vector tier the re-rank randomly reads
at shortlist width — the DiskANN memory-bounded serving layout
expressed as two parquet tiers.

The served answer must equal the built-fresh answer (the store is
the deterministic build persisted), so q_sim_ivfpq_serve registers
q_sim_ivfpq_rerank's ORACLE TEXT VERBATIM — the q_sim_hnsw_search
contract applied to the compressed family: a stale or corrupted
store surfaces as a driver hash mismatch, never a silent wrong
answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .llm_ops import (
    IVF_SEED_CENTROIDS,
    PQ_QUERY_MAX,
    RERANK_SHORTLIST,
    corpus_file_identity,
    exact_rerank,
)
from .registry import ORACLES, register

# persisted-index cache root for the compressed serving query: one
# trained store per (corpus identity, build constants, build-operator
# source) key — the HNSW_INDEX_CACHE discipline
PQ_INDEX_CACHE = "/tmp/fps_pq_index"
PQ_SERVE_NPROBE = 2
PQ_SERVE_NCODES = 16


def _pq_store_key(identity: str) -> str:
    """Cache key covering everything that determines the built store:
    corpus identity, build/serve constants, and the SOURCE TEXT of
    the build/serve operators (the _hnsw_store_key discipline —
    editing the coding or scan rule invalidates the cache instead of
    serving stale codes). md5 keys a cache path; it is not part of
    any query's math."""
    import hashlib
    import inspect

    from ..operators import llm as _ollm
    from ..streaming import pq_index as _pq

    srcs = "".join(
        inspect.getsource(f)
        for f in (
            _ollm.ivfpq_artifacts,
            _ollm.ivfpq_scan,
            _ollm.pq_codes,
            _ollm.pq_code_batch,
            _ollm._subvectors,
            _pq.PQIndexMonitor.init,
            _pq.PQIndexMonitor.adc_topk,
        )
    )
    const = (
        f"{PQ_SERVE_NCODES}|{PQ_SERVE_NPROBE}|{RERANK_SHORTLIST}"
        f"|{IVF_SEED_CENTROIDS}"
    )
    return hashlib.md5(
        f"{identity}\x00{const}\x00{srcs}".encode()
    ).hexdigest()[:16]


def _pq_monitor(store_dir: str):
    from ..streaming.pq_index import PQIndexMonitor

    return PQIndexMonitor(
        store_dir, n_codes=PQ_SERVE_NCODES, nprobe=PQ_SERVE_NPROBE
    )


def pq_store_for(spark: SparkSession, sf_dir: str):
    """The persisted IVFADC store monitor for ``sf_dir``, training and
    atomically publishing on first use (the hnsw_store_for race
    convention: one rename wins, the loser discards)."""
    import os
    import shutil

    key = _pq_store_key(sf_dir + "\x00" + corpus_file_identity(sf_dir))
    store = os.path.join(PQ_INDEX_CACHE, key)
    if not os.path.isdir(os.path.join(store, "codes", "batch_id=-1")):
        emb = load_table(spark, sf_dir, "embeddings")
        tmp = f"{store}.build.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        _pq_monitor(tmp).init(
            emb, emb.filter(F.col("vec_id") < IVF_SEED_CENTROIDS)
        )
        os.makedirs(PQ_INDEX_CACHE, exist_ok=True)
        try:
            os.rename(tmp, store)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return _pq_monitor(store)


@register("q_sim_ivfpq_serve", oracle=ORACLES["q_sim_ivfpq_rerank"])
def q_sim_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage compressed retrieval SERVED FROM THE PERSISTED STORE
    — the serving form of q_sim_ivfpq_rerank: first use trains the
    residual codebook and codes the corpus once (streaming/
    pq_index.PQIndexMonitor.init — the identical deterministic
    build), publishing atomically under a cache key derived from the
    corpus identity, the build constants, AND the build/serve
    operators' source text; every subsequent run is SERVE-ONLY —
    probe the stored centroids, LUT against the stored codebook, ADC
    over the stored code log (operators/llm.ivfpq_scan, the same
    stage the batch query runs) to a top-{short} shortlist, then
    exact-rerank those ids against the full-vector corpus parquet
    (the shared exact_rerank — one rescoring rule). The bench entry
    therefore prices compressed serving (code-log scan + shortlist
    random reads) separated from the per-run quantizer training
    q_sim_ivfpq_rerank carries — and next to q_sim_hnsw_search it
    splits the serving cost of the two index families the store
    layer persists (graph vs compressed).

    Correctness contract: the store is the deterministic build's
    output persisted, so the served answer must equal the built-fresh
    one — this query registers q_sim_ivfpq_rerank's oracle text
    VERBATIM; a stale or corrupted store is a driver hash mismatch.

    Scale: the hot tier is m one-byte codes + a cell id per vector
    (~1/32 the float bytes — what a serving node holds in RAM at
    100 TB); the ADC scan is one hash join against a broadcast LUT
    with map-side-combined integer sums; the cold tier (full
    vectors) is randomly read at shortlist width only. Arriving
    vectors fold in append-only per micro-batch (coding is stateless
    given the frozen artifacts — the twelfth streaming deployment
    form, stream==batch + crash-replay pinned in
    tests/test_round12_ops.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    mon = pq_store_for(spark, sf_dir)
    short = mon.adc_topk(
        spark,
        emb.filter(F.col("vec_id") < PQ_QUERY_MAX),
        after_batch_id=-1,
        k=RERANK_SHORTLIST,
    ).select("query_id", "neighbor_id")
    return exact_rerank(emb, short, k=3)


q_sim_ivfpq_serve.__doc__ = q_sim_ivfpq_serve.__doc__.format(
    short=RERANK_SHORTLIST
)
