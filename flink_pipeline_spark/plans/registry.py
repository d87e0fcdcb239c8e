"""Named-query registry — the driver-contract surface.

Every operator from SURVEY.md §2 is registered here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL string the DuckDB oracle runs
on the same parquet tables. Keeping implementation and oracle adjacent
(one ``@register`` call) is what keeps column names and semantics in
lock-step — the driver's hash compare sorts columns by name, so any
drift is a correctness failure.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_REPO_ROOT = Path(__file__).resolve().parents[2]

# Oracle SQL may embed this placeholder where the scale-factor parquet
# directory belongs; it is resolved in ``oracle_sqls()``. The driver's
# correctness gate always runs oracles at sf0.01, so that is the
# default; the local parity mirror resolves it to whatever SF it runs.
SF_DIR_PLACEHOLDER = "{SF_DIR}"
DEFAULT_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _evidence_order(d: dict) -> dict:
    """Reorder so the driver's fixed verification window lands on the
    weakest evidence first: never-checked queries, then queries whose
    code changed since their last CORRECTNESS row (stale evidence),
    then everything else stalest-round-first so old rows refresh
    round-robin. See evidence.py for the fingerprint ledger."""
    from .evidence import verification_order

    order = verification_order(QUERIES, ORACLES)
    rank = {name: i for i, name in enumerate(order)}
    return dict(sorted(d.items(), key=lambda kv: rank.get(kv[0], len(rank))))


try:  # py4j is absent under Spark Connect — treat as no extra types
    from py4j.protocol import Py4JError as _Py4JError

    _PY4J_ERRORS: tuple[type[BaseException], ...] = (_Py4JError,)
except ImportError:  # pragma: no cover - py4j ships with pyspark
    _PY4J_ERRORS = ()

# the ONLY exception shapes _boundary_hygiene may swallow: a stopped
# SparkContext raises RuntimeError, a dead py4j bridge its transport
# errors; everything else is real session corruption
_HYGIENE_SWALLOW = (RuntimeError,) + _PY4J_ERRORS


_BOUNDARY_COUNT = 0


def _boundary_hygiene(spark: SparkSession) -> None:
    """Session hygiene at REGISTERED-QUERY entry — what keeps a driver
    that runs the full surface in ONE long-lived session from drowning
    in dead state: queries persist() frames for intra-query reuse, and
    Spark's CacheManager holds them by STRONG reference forever (the
    ContextCleaner never reclaims DataFrame persists), while
    localCheckpoint blocks wait on BOTH collectors (the py4j proxy
    must be GC'd Python-side before the JVM RDD becomes weakly
    reachable). Measured without this: a default-heap (1g) bare
    driver sweeping the full registry OOMs near query ~200 at the
    largest graph build. Every entry clears the previous query's
    cache entries (each registered query is self-contained by
    contract — composed sub-queries are called through their module
    attributes, NOT through this wrapped surface, so a parent's
    persists are never cleared mid-query); every 8th entry also
    nudges both garbage collectors for the checkpoint blocks.

    CONTRACT for embedding applications: entering the registry
    surface invalidates ALL session caches, including persists the
    application itself holds on the shared session — call queries
    through their module attributes if your caches must survive."""
    global _BOUNDARY_COUNT
    _BOUNDARY_COUNT += 1
    try:
        spark.catalog.clearCache()
    except _HYGIENE_SWALLOW:
        # ONLY the stopped/remote-context shapes (RuntimeError from a
        # stopped SparkContext; py4j transport errors from a dead JVM
        # bridge) — anything else is session corruption and must
        # surface, not be swallowed (ADVICE r12)
        pass
    if _BOUNDARY_COUNT % 8 == 0:
        # Python-side collection only: dropping dead py4j proxies is
        # what unblocks the ContextCleaner (the JVM collects on its
        # own under heap pressure). A synchronous System.gc() here
        # measurably polluted bench timings (multi-second full-GC
        # pauses landing inside timed windows) without being needed
        # once nsw_beam's lineage fix removed the task-binary blowup.
        import gc

        gc.collect()


def _boundary_wrap(fn: QueryFn) -> QueryFn:
    import functools

    @functools.wraps(fn)  # __wrapped__ lets evidence.py unwrap for
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:  # fingerprints
        _boundary_hygiene(spark)
        return fn(spark, sf_dir)

    return wrapped


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-ANSI SQL
    equivalent (None => rows-only check for non-SQL-expressible ops).
    The registry surface gets the hygiene-wrapped form; the module
    attribute stays the raw function so query composition bypasses the
    boundary (see _boundary_hygiene)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = _boundary_wrap(fn)
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def query_fns() -> dict[str, QueryFn]:
    _load_all()
    return _evidence_order(QUERIES)


def oracle_sqls(sf_dir: str = DEFAULT_ORACLE_SF_DIR) -> dict[str, str]:
    _load_all()
    return {
        k: v.replace(SF_DIR_PLACEHOLDER, sf_dir)
        for k, v in _evidence_order(ORACLES).items()
    }


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (imports populate the dicts)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        aggregates,
        analytics,
        analytics_shapes,
        ann_delete,
        ann_filtered,
        audio_dedup,
        clustered_audit,
        corpus_ops,
        image_dedup,
        index_refresh,
        joins,
        llm_ops,
        maxsim,
        pipeline_queries,
        pq_serve,
        profiling,
        radius,
        refresh_serve,
        relational,
        sampling,
        scans,
        streaming_queries,
        training,
        udf_queries,
        unindex,
        video_dedup,
        windows_sorts,
    )

    _LOADED = True
