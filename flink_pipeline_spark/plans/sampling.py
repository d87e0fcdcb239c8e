"""Deterministic sampling + distribution queries — training-data
pipeline staples (BASELINE.json north star) built on the portable
hash so samples are REPRODUCIBLE: the same rows are selected on any
cluster, any partitioning, any engine — which `df.sample`'s
per-partition RNG cannot promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.portable import round_agg, hash56_sql_duckdb, hash56_sql_spark, round_sql
from .registry import register


@register(
    "q_sample_systematic",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {hash56_sql_duckdb('doc_id')} % 10 = 0
    """,
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: keep rows whose key-hash lands in one
    of 10 buckets. Scale note: purely map-side (no shuffle), stable
    under repartitioning, and composable (the same predicate selects
    the same rows in a later run or another system)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.expr(f"{hash56_sql_spark('doc_id')} % 10 = 0")).select(
        "doc_id", "lang"
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY {hash56_sql_duckdb('doc_id')}, doc_id) AS rn
        FROM documents
    ) t WHERE rn <= 20
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 20 docs per language, chosen by hash
    order (deterministic, unbiased w.r.t. insertion order). The
    balanced-classes primitive for training-set construction."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.expr(hash56_sql_spark("doc_id")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "q_percentile",
    oracle=f"""
    SELECT l_returnflag,
           {round_sql('median(l_extendedprice)')} AS median_price,
           {round_sql('quantile_cont(l_extendedprice, 0.95)')} AS p95_price,
           {round_sql('max(l_extendedprice)')} AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p95) per group — both engines use
    linear interpolation over the sorted values, so results are
    bit-comparable after the portable round. (approx_percentile is the
    sketch-based 100 TB path; like HLL it is engine-specific, so the
    exact form carries the oracle check.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_agg(F.expr("percentile(l_extendedprice, 0.5)")).alias("median_price"),
        round_agg(F.expr("percentile(l_extendedprice, 0.95)")).alias("p95_price"),
        round_agg(F.max("l_extendedprice")).alias("max_price"),
    )


# percentile_approx default accuracy 10000 bounds rank error at 1e-4;
# on the ~uniform fixture that is a tiny value error, so a 2% value
# tolerance is a real-but-generous gate (mirrors APPROX_DISTINCT_RTOL).
APPROX_PCTL_RTOL = 0.02


@register(
    "q_approx_percentile",
    oracle=f"""
    SELECT l_returnflag,
           {round_sql('quantile_cont(l_extendedprice, 0.5)')} AS exact_p50,
           {round_sql('quantile_cont(l_extendedprice, 0.9)')} AS exact_p90,
           TRUE AS p50_ok,
           TRUE AS p90_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (GK sketch via percentile_approx) — the
    100 TB path for quantiles: bounded sketch memory per group instead
    of sorting every value. Like q_approx_distinct, the sketch output
    is engine-specific, so the query emits the exact interpolated
    percentiles plus booleans asserting the sketch landed within
    APPROX_PCTL_RTOL of exact; the oracle expects the booleans TRUE —
    a driver gate on the sketch's accuracy, not just its shape."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile_approx(l_extendedprice, 0.5)").alias("a50"),
        F.expr("percentile_approx(l_extendedprice, 0.9)").alias("a90"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("e90"),
    )

    def ok(approx, exact):
        return F.abs(F.col(approx) - F.col(exact)) <= F.lit(
            APPROX_PCTL_RTOL
        ) * F.abs(F.col(exact))

    return agg.select(
        "l_returnflag",
        round_agg(F.col("e50")).alias("exact_p50"),
        round_agg(F.col("e90")).alias("exact_p90"),
        ok("a50", "e50").alias("p50_ok"),
        ok("a90", "e90").alias("p90_ok"),
    )


@register(
    "q_text_edit_distance",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 5
    WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 20
    """,
)
def q_text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup check on 40-char prefixes over blocked
    pairs (same lang, nearby ids). Levenshtein is O(len^2) per pair —
    the prefix cap and blocking keep it feasible; at corpus scale this
    runs only on LSH candidates, never all pairs.

    Candidate generation is a pure EQUI-join on (lang, id-band):
    doc_id is binned at the band width (5) and the probe side
    replicates each row to bin-1/bin, which losslessly covers every
    0 < doc_b - doc_a <= 5 pair (doc_b's bin is doc_a's bin or the
    next one) — the same binning as q_dedup_ngram_jaccard. Join-key
    cardinality is #langs x #bins, not #langs: the lang-only equi key
    degenerates to a per-language near-cartesian sort-merge at scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.substring("text", 1, 40).alias("prefix")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.col("prefix").alias("pa"),
        F.floor(F.col("doc_id") / 5).alias("blk"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        F.col("prefix").alias("pb"),
        F.explode(
            F.array(F.floor(F.col("doc_id") / 5) - 1, F.floor(F.col("doc_id") / 5))
        ).alias("blk"),
    )
    return (
        a.join(b, ["lang", "blk"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("doc_b") - F.col("doc_a") <= 5)
        )
        .select("doc_a", "doc_b", F.levenshtein("pa", "pb").alias("dist"))
        .filter(F.col("dist") <= 20)
    )


# Efraimidis-Spirakis weighted reservoir sampling: per-row key
# u^(1/w) with u uniform — equivalently argmax of ln(u)/w — gives an
# exact weighted-without-replacement sample as a plain top-k. u is
# hash-derived, so the sample is reproducible on any partitioning.
WRS_K = 16
WRS_SALT = "samp:"
_TWO56 = float(1 << 56)


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               CAST(floor(
                   ln((CAST({hash56_sql_duckdb(
                       f"'{WRS_SALT}' || CAST(doc_id AS VARCHAR)")}
                       AS DOUBLE) + 1) / {_TWO56!r})
                   / n_chars * 100000000 + 0.5) AS BIGINT) AS key_q
        FROM documents
    )
    SELECT doc_id, n_chars, key_q, CAST(rank AS BIGINT) AS rank FROM (
        SELECT doc_id, n_chars, key_q,
               row_number() OVER (ORDER BY key_q DESC, doc_id) AS rank
        FROM keyed
    ) t WHERE rank <= {WRS_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED reservoir sample (Efraimidis & Spirakis 2006) —
    deterministic: each row draws u in (0, 1] from the salted portable
    hash and is ranked by u^(1/w) (computed as ln(u)/w, the numerically
    standard form), with w = n_chars, so longer documents are
    proportionally likelier to be sampled and the SAME {k} rows come
    back on any cluster, any partitioning, any engine — the weighted
    counterpart of q_sample_systematic's uniform rule. The ranking key
    is quantized to BIGINT 1e-8 grains before the top-k (round-before-
    rank; doc_id breaks grain ties) so the ln ulp hazard cannot flip
    the selection.

    Scale: one codegen'd hash+ln projection, then top-{k} via
    TakeOrderedAndProject (rank_after_topk) — no global window, no
    state; the one-pass distributed weighted sample a mixture stage
    uses to materialize its per-source quotas."""
    from ..operators.topk import rank_after_topk

    d = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(
            hash56_sql_spark(f"'{WRS_SALT}' || CAST(doc_id AS STRING)")
        ).cast("double")
        + 1
    ) / F.lit(_TWO56)
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.floor(F.log(u) / F.col("n_chars") * 100000000 + 0.5)
        .cast("long")
        .alias("key_q"),
    )
    return rank_after_topk(keyed, WRS_K, "key_q", "doc_id").select(
        "doc_id", "n_chars", "key_q", F.col("rank").cast("long").alias("rank")
    )


q_sample_weighted.__doc__ = q_sample_weighted.__doc__.format(k=WRS_K)
