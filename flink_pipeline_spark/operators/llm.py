"""LLM-data-pipeline operators (SURVEY.md §2.11): dedup family,
similarity search, text analysis — the Spark faces.

100 TB design notes (per operator):
  * MinHash-LSH (near-dedup): never all-pairs. Shingle -> k minhashes
    -> band signatures -> candidates = pairs sharing a band bucket
    (a shuffle on (band, sig), cost O(docs x bands)) -> exact-Jaccard
    verify only candidates. Hot buckets (boilerplate docs) are the skew
    risk: cap bucket size or salt in production.
  * SimHash: one pass, 64 bits of state per doc; pair detection blocks
    on hash prefix so the join is equi, not theta.
  * Embedding cosine: norms precomputed once; brute-force all-pairs is
    the sf-scale baseline, IVF (assign to nearest centroid, search own
    cell) is the scale path — the cross join shrinks by the cell count.
  * Everything is built-in expressions (JVM-codegen'd, no Python in the
    hot path); hashes are md5-prefix-based so the DuckDB oracle can
    replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    MINHASH_PARAMS,
    MINHASH_ROWS,
    P31,
    SIMHASH_BITS,
    shingle_hash_sql,
    shingles_sql,
)

# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, s: array<string>) — distinct word n-gram shingles."""
    return docs.select("doc_id", F.expr(shingles_sql("spark", "text", n)).alias("s"))


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, i, mh): k minhash values per doc under fixed affine
    transforms of the shingle hash."""
    spark = docs.sparkSession
    hp = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(MINHASH_PARAMS)], "i INT, a BIGINT, b BIGINT"
    )
    exploded = doc_shingles(docs, n).select(
        "doc_id", F.explode("s").alias("shingle")
    )
    hashed = exploded.select(
        "doc_id", F.expr(shingle_hash_sql("spark", "shingle")).alias("x")
    )
    return (
        hashed.join(F.broadcast(hp))
        .groupBy("doc_id", "i")
        .agg(F.min(F.expr(f"(a * x + b) % {P31}")).alias("mh"))
    )


def lsh_band_signatures(mh: DataFrame) -> DataFrame:
    """(doc_id, band, sig): concat the band's minhashes in row order."""
    return (
        mh.withColumn("band", F.expr(f"i div {MINHASH_ROWS}"))
        .groupBy("doc_id", "band")
        .agg(
            F.expr(
                "concat_ws('-', transform(array_sort(collect_list(struct(i, mh))), "
                "s -> CAST(s.mh AS STRING)))"
            ).alias("sig")
        )
    )


def lsh_candidate_pairs(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_a, doc_b): distinct unordered pairs sharing >= 1 band bucket."""
    sigs = lsh_band_signatures(minhash_signatures(docs, n))
    a = sigs.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def verified_near_dups(
    docs: DataFrame, candidates: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs:
    (doc_a, doc_b, jacc) with jacc >= threshold."""
    sets = doc_shingles(docs, n)
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    jacc = F.expr(
        "CAST(size(array_intersect(sa, sb)) AS DOUBLE) / size(array_union(sa, sb))"
    )
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.floor(jacc * 10000 + F.lit(0.5)) / 10000).alias("jacc"),
        )
        .filter(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): token-multiset simhash; bit b is the sign of
    the summed ±1 contributions of each token's hash bit b."""
    spark = docs.sparkSession
    bit_df = spark.createDataFrame([(b,) for b in range(bits)], "b INT")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    th = shingle_hash_sql("spark", "tok")
    contrib = toks.join(F.broadcast(bit_df)).select(
        "doc_id",
        "b",
        F.expr(f"CASE WHEN (({th} >> b) & 1) = 1 THEN 1 ELSE -1 END").alias("c"),
    )
    return (
        contrib.groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END) AS BIGINT)"
            ).alias("simhash")
        )
    )


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------

DOT_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (s, v) -> s + v)"
)


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute L2 norms once — at scale this halves the per-pair work
    and is the difference between O(pairs*d) and O(pairs*d + n*d)."""
    return emb.withColumn(
        "norm", F.expr(f"sqrt({DOT_SQL.format(a=vec_col, b=vec_col)})")
    )


def cosine_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """(vec_a, vec_b, cos): unordered pairs with cosine >= threshold.
    Brute-force pair enumeration (calibration scale); see ivf_assign for
    the cell-pruned variant."""
    e = with_norm(emb)
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("norm").alias("nb"),
    )
    cos = F.expr(DOT_SQL.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", (F.floor(cos * 10000 + F.lit(0.5)) / 10000).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )


def topk_neighbors(emb: DataFrame, queries: DataFrame, k: int = 3) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): brute-force top-k cosine.
    The query side is broadcast — the corpus never shuffles."""
    e = with_norm(emb)
    q = with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("eq"),
        F.col("norm").alias("nq"),
    )
    cos = F.expr(DOT_SQL.format(a="eq", b="embedding")) / (F.col("nq") * F.col("norm"))
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.floor(cos * 10000 + F.lit(0.5)) / 10000).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell): assign each vector to its max-cosine centroid —
    the IVF coarse quantizer. At scale, search then touches only the
    probe-cell's vectors instead of the whole corpus."""
    e = with_norm(emb)
    c = with_norm(centroids).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("ec"),
        F.col("norm").alias("nc"),
    )
    cos = F.expr(DOT_SQL.format(a="embedding", b="ec")) / (F.col("norm") * F.col("nc"))
    scored = e.join(F.broadcast(c)).select(
        "vec_id", "cell", cos.alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
        "vec_id", "cell"
    )
