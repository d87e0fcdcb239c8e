"""Corpus-level curation operators beyond the dedup/quality families
in llm_ops.py: soft deduplication (down-weight instead of drop),
link-graph importance (fixed-iteration PageRank), and the Zipf
rank-frequency diagnostic.

Why these three: real training-data pipelines increasingly keep
near-duplicates but shrink their sampling weight (soft dedup), rank
web documents by link-graph centrality before quality gating
(PageRank over the crawl graph), and sanity-check a corpus's token
distribution against the Zipf law before trusting token-count-based
mixing (a corpus whose rank-frequency slope is far from -1 is usually
boilerplate- or spam-heavy).

Portability: PageRank runs ENTIRELY in BIGINT fixed-point (rank mass
scaled by 10^12, per-edge contributions via integer division) so the
iterative float drift that normally makes distributed PageRank
non-reproducible cannot occur — both engines produce bit-identical
ranks. The Zipf fit quantizes each ln() to integer micro-units per
row before the regression sums (the q_text_surprisal convention), so
the only floats are one final division and a portable round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators.llm import (
    connected_components,
    doc_shingles,
    lsh_candidate_pairs,
    verified_near_dups,
)
from . import llm_ops  # noqa: F401  (populates ORACLES['q_dedup_clusters'])
from .registry import ORACLES, register

# ------------------------------------------------------ soft dedup


def _register_dedup_soft() -> None:
    """Closure-registered so the oracle composes the already-registered
    q_dedup_clusters oracle as a CTE (the q_dedup_cluster_stats
    convention): the weights can never drift from the clustering that
    justifies them."""
    oracle = f"""
    WITH clusters AS ({ORACLES["q_dedup_clusters"]}),
    sizes AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
        FROM clusters GROUP BY cluster_id
    ), member AS (
        SELECT c.doc_id, s.n
        FROM clusters c JOIN sizes s ON s.cluster_id = c.cluster_id
    )
    SELECT d.doc_id,
           coalesce(m.n, 1) AS n_copies,
           floor(1.0 / coalesce(m.n, 1) * 10000 + 0.5) / 10000 AS weight
    FROM documents d LEFT JOIN member m ON m.doc_id = d.doc_id
    """

    @register("q_dedup_soft", oracle=oracle)
    def q_dedup_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SOFT deduplication (SoftDedup; also the "count-and-reweight"
        mode of Lee et al.'s dedup study): instead of DROPPING
        near-duplicates, every document keeps a sampling weight of
        1/|its near-dup cluster|, so each duplicated content family
        contributes one document-equivalent of training mass and
        unique documents keep weight 1. Pipelines prefer this over
        hard dedup when duplicates carry quality signal (popular
        content is duplicated BECAUSE it is good) — the weight
        preserves the signal without the memorization risk.

        The clustering is the registered q_dedup_clusters operator
        (MinHash-LSH candidates -> exact-Jaccard verification ->
        connected components); this query adds a cluster-size census
        and a LEFT join back onto the corpus. 1/n divides one exact
        integer (IEEE-exact for the division itself) and portably
        rounds.

        Scale: everything downstream of the pair graph is
        cluster-count-sized; the weight join is a broadcast of the
        (tiny) member table against the corpus scan — no new shuffle
        beyond what the clustering already paid."""
        d = load_table(spark, sf_dir, "documents")
        sets = doc_shingles(d).persist()
        pairs = (
            verified_near_dups(
                d, lsh_candidate_pairs(d, sets=sets), threshold=0.8, sets=sets
            )
            .select("doc_a", "doc_b")
            .persist()
        )
        clusters = connected_components(pairs)
        sizes = clusters.groupBy("cluster_id").agg(
            F.count("*").cast("long").alias("n")
        )
        member = clusters.join(sizes, "cluster_id").select("doc_id", "n")
        return (
            d.select("doc_id")
            .join(F.broadcast(member), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n", F.lit(1).cast("long")).alias("n_copies"),
                (
                    F.floor(
                        F.lit(1.0)
                        / F.coalesce("n", F.lit(1).cast("long"))
                        * 10000
                        + F.lit(0.5)
                    )
                    / 10000
                ).alias("weight"),
            )
        )


_register_dedup_soft()


# -------------------------------------------------------- PageRank
PR_SCALE = 10**12  # rank mass in fixed-point trillionths
PR_ITERS = 3
PR_TOP = 20


def _pr_oracle() -> str:
    """Unrolled fixed-point PageRank in SQL: 3 damped iterations, all
    BIGINT (contributions use integer division), over the bipartite
    customer<->supplier trade graph."""
    prev = "r0"
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""inc{i} AS (
        SELECT e.dst AS id,
               CAST(sum((p.r * e.w) // e.ow) AS BIGINT) AS s
        FROM edges e JOIN {prev} p ON p.id = e.src
        GROUP BY e.dst
    ), r{i} AS (
        SELECT n.id,
               CAST((base.b * 15 + 85 * coalesce(i.s, 0)) // 100
                    AS BIGINT) AS r
        FROM nodes n CROSS JOIN base LEFT JOIN inc{i} i ON i.id = n.id
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH pair AS (
        SELECT o.o_custkey AS c, l.l_suppkey AS s,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, l.l_suppkey
    ), raw_edges AS (
        SELECT 'c' || CAST(c AS VARCHAR) AS src,
               's' || CAST(s AS VARCHAR) AS dst, w
        FROM pair
        UNION ALL
        SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR), w
        FROM pair
    ), outw AS (
        SELECT src, CAST(sum(w) AS BIGINT) AS ow
        FROM raw_edges GROUP BY src
    ), edges AS (
        SELECT e.src, e.dst, e.w, o.ow
        FROM raw_edges e JOIN outw o ON o.src = e.src
    ), nodes AS (
        SELECT DISTINCT src AS id FROM raw_edges
    ), base AS (
        SELECT CAST({PR_SCALE} // count(*) AS BIGINT) AS b FROM nodes
    ), r0 AS (
        SELECT id, base.b AS r FROM nodes CROSS JOIN base
    ), {", ".join(iters)}
    SELECT id, rank_q, score, rnk FROM (
        SELECT id, r AS rank_q,
               floor(r / {PR_SCALE}.0 * 10000000 + 0.5) / 10000000
                   AS score,
               row_number() OVER (ORDER BY r DESC, id) AS rnk
        FROM {prev}
    ) t WHERE rnk <= {PR_TOP}
    """


@register("q_graph_pagerank", oracle=_pr_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the bipartite customer<->supplier
    trade graph (edge weight = lineitem count between the pair) — the
    link-graph-importance operator web-crawl curation runs before
    quality gating (harmonic/PageRank centrality is a core CommonCrawl
    ranking signal). Three damped iterations (d = 0.85), weighted
    edges, uniform init.

    Reproducibility is the hard part of distributed PageRank: float
    rank vectors accumulate in shuffle-dependent order, so two runs
    differ in the last bits and a rank cutoff flips. This
    implementation keeps ALL rank mass in BIGINT fixed-point
    (10^12 units): per-edge contribution is integer division
    `(r * w) div out_w`, the damping update is
    `(base*15 + 85*incoming) div 100`, and both engines floor the
    same nonnegative integers — bit-identical ranks by construction,
    at the documented cost of <= 1 unit (10^-12) truncation per edge
    per iteration.

    Scale: the edge list shuffles once to build (it IS the Q5-style
    fact join, pre-aggregated to distinct pairs); each iteration is
    one shuffle keyed by dst — the textbook Pregel round. Iteration
    count is FIXED (3), so the lineage is bounded; a production run
    at higher iteration counts would localCheckpoint every few rounds
    exactly as operators/llm.connected_components does. The rank
    vector is nodes-sized, orders of magnitude smaller than the fact
    table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").cast("long").alias("w"))
    )
    cid = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    sid = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    raw = pair.select(cid.alias("src"), sid.alias("dst"), "w").unionAll(
        pair.select(sid.alias("src"), cid.alias("dst"), "w")
    )
    outw = raw.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
    edges = raw.join(outw, "src").persist()
    nodes = edges.select(F.col("src").alias("id")).distinct()
    base = nodes.agg(
        F.expr(f"CAST({PR_SCALE} div count(*) AS BIGINT)").alias("b")
    )
    rank = nodes.crossJoin(F.broadcast(base)).select(
        "id", F.col("b").alias("r")
    )
    for _ in range(PR_ITERS):
        inc = (
            edges.join(rank, edges.src == rank.id)
            .select(
                F.col("dst").alias("inc_id"),
                F.expr("(r * w) div ow").alias("contrib"),
            )
            .groupBy("inc_id")
            .agg(F.sum("contrib").cast("long").alias("s"))
        )
        rank = (
            nodes.crossJoin(F.broadcast(base))
            .join(inc, nodes.id == inc.inc_id, "left")
            .select(
                "id",
                F.expr(
                    "CAST((b * 15 + 85 * coalesce(s, CAST(0 AS BIGINT))) "
                    "div 100 AS BIGINT)"
                ).alias("r"),
            )
        )
    w = Window.orderBy(F.col("rank_q").desc(), "id")
    return (
        rank.select(
            "id",
            F.col("r").alias("rank_q"),
            (
                F.floor(
                    F.col("r") / F.lit(float(PR_SCALE)) * 10000000 + F.lit(0.5)
                )
                / 10000000
            ).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PR_TOP)
        .select("id", "rank_q", "score", "rnk")
    )


# ------------------------------------------------------ Zipf slope
ZIPF_TOP = 100  # regression over the top-K ranks


@register(
    "q_text_zipf",
    oracle=f"""
    WITH tf AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY tok
    ), ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rnk
        FROM tf
    ), pts AS (
        SELECT CAST(floor(ln(rnk) * 1000000 + 0.5) AS BIGINT) AS x_q,
               CAST(floor(ln(n) * 1000000 + 0.5) AS BIGINT) AS y_q
        FROM ranked WHERE rnk <= {ZIPF_TOP}
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x_q) AS BIGINT) AS sx,
               CAST(sum(y_q) AS BIGINT) AS sy,
               CAST(sum(x_q * y_q) AS BIGINT) AS sxy,
               CAST(sum(x_q * x_q) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT m AS n_ranks,
           floor(CAST(m * sxy - sx * sy AS DOUBLE)
                 / (m * sxx - sx * sx) * 10000 + 0.5) / 10000
               AS zipf_slope
    FROM s
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic: the least-squares slope of
    ln(frequency) against ln(rank) over the corpus's top-{ZIPF_TOP}
    token ranks. Natural text sits near -1 (Zipf's law); a much
    flatter slope flags template/boilerplate-heavy corpora and a much
    steeper one flags tiny-vocabulary spam — a one-number corpus
    health check quality teams run before trusting token statistics.

    Portability: each ln() quantizes to BIGINT micro-units PER ROW
    (the q_text_surprisal convention; the ln-ulp caveat of
    functions/portable.py applies), the regression moments are exact
    integer sums, and the slope is one double division portably
    rounded — no order-dependent float accumulation.

    Scale: one explode -> vocab-sized count agg (map-side combined),
    a global top-K rank over the VOCAB (not the corpus), and a 1-row
    regression reduce. The corpus is touched exactly once."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "tok")
    pts = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ZIPF_TOP)
        .select(
            F.floor(F.log(F.col("rnk").cast("double")) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("x_q"),
            F.floor(F.log(F.col("n").cast("double")) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("y_q"),
        )
    )
    s = pts.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x_q").cast("long").alias("sx"),
        F.sum("y_q").cast("long").alias("sy"),
        F.sum(F.col("x_q") * F.col("y_q")).cast("long").alias("sxy"),
        F.sum(F.col("x_q") * F.col("x_q")).cast("long").alias("sxx"),
    )
    slope = (
        F.floor(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return s.select(F.col("m").alias("n_ranks"), slope.alias("zipf_slope"))


q_text_zipf.__doc__ = q_text_zipf.__doc__.format(ZIPF_TOP=ZIPF_TOP)
