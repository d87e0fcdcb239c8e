"""Scaling probe for the text-dedup family: measure wall time at
1x/2x/4x/8x the sf0.1 documents corpus and report the per-query
scaling exponent (log-log slope).

The 100 TB design claims in operators/llm.py are plan-shape claims
(capped buckets, equi-joins, no cartesian); this probe adds MEASURED
evidence that total work grows ~linearly in corpus size on the
operators where it should.

Corpus construction: m copies of sf0.1 documents with every token
prefixed by a per-copy tag (c<k>_) and doc_id offset per copy. The tag
makes copy vocabularies DISJOINT, so each copy carries exactly the
original's near-dup structure and no cross-copy pairs exist — pair
density per document stays constant as m grows, which is what makes
the wall-time-vs-m slope interpretable (naive replication would
multiply the dup-graph density by m and square the pair work).

Run:  python scripts/scale_probe.py [--repeats 3] [--out SCALING.md]
Writes one JSON line per (query, m) to stdout and a markdown summary.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

QUERIES = [
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash_pairs",
    "q_dedup_containment",
    "q_text_tfidf",
]
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe"


def build_corpus(spark: SparkSession, m: int) -> str:
    out = os.path.join(WORK, f"m{m}")
    marker = os.path.join(out, "_SUCCESS_PROBE_V7")  # v7: + nation/region
    if os.path.exists(marker):
        return out
    d = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    copies = []
    for k in range(m):
        tag = f"c{k}_"
        copies.append(
            d.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "), lambda t: F.concat(F.lit(tag), t)
                    ),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    allc = copies[0]
    for c in copies[1:]:
        allc = allc.unionByName(c)
    allc.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    # events replica for the window/session family: user_ids offset per
    # copy (disjoint users -> per-copy session/funnel structure exactly
    # preserved, counts scale linearly); timestamps unchanged. The
    # replica is written by Spark as TIMESTAMP(US) and round-trips
    # cleanly regardless of load_table's legacy-nanos read path.
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    ecopies = [
        ev.select(
            (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(m)
    ]
    alle = ecopies[0]
    for c in ecopies[1:]:
        alle = alle.unionByName(c)
    alle.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    # orders replica for the profiling family: order/cust keys offset
    # per copy so exact countDistinct grows linearly with the corpus
    # (the hard part of q_column_profile); other columns unchanged.
    od = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    ocopies = [
        od.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 1_000_000_000)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 100_000_000))
        for k in range(m)
    ]
    allo = ocopies[0]
    for c in ocopies[1:]:
        allo = allo.unionByName(c)
    allo.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    # embeddings replica for the PQ/ANN family: vec_id offset per copy,
    # vectors unchanged — queries/codebook key off vec_id<K so they stay
    # pinned to copy 0 and the corpus-side work (coding, ADC join, agg)
    # is what grows with m.
    em = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    mcopies = [
        em.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10_000_000))
        for k in range(m)
    ]
    allm = mcopies[0]
    for c in mcopies[1:]:
        allm = allm.unionByName(c)
    allm.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    # lineitem replica for the join-shape family (Q21): order keys
    # offset in lockstep with the orders replica so every copy carries
    # the original's late/multi-supplier structure; supplier keys
    # UNCHANGED (the dimension stays fixed-size, as it would at 100 TB),
    # so per-supplier waiting counts grow ~m while the supplier set
    # does not.
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    lcopies = [
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 1_000_000_000)
        )
        for k in range(m)
    ]
    alll = lcopies[0]
    for c in lcopies[1:]:
        alll = alll.unionByName(c)
    alll.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    sup = spark.read.parquet(os.path.join(BASE, "supplier.parquet"))
    sup.write.mode("overwrite").parquet(os.path.join(out, "supplier.parquet"))
    # customer replica in LOCKSTEP with the orders replica's o_custkey
    # offset, so every copy carries the original per-customer order
    # profile (q_cust_order_dist's c_count distribution is invariant in
    # m — output stays grid-sized while both join sides grow).
    cu = spark.read.parquet(os.path.join(BASE, "customer.parquet"))
    ccopies = [
        cu.withColumn("c_custkey", F.col("c_custkey") + F.lit(k * 100_000_000))
        for k in range(m)
    ]
    allc = ccopies[0]
    for c in ccopies[1:]:
        allc = allc.unionByName(c)
    allc.write.mode("overwrite").parquet(os.path.join(out, "customer.parquet"))
    # part stays FIXED-SIZE (like supplier): lineitem replicas keep
    # l_partkey unchanged, so per-part lineitem groups grow ~m with the
    # original quantity structure — the Q17 per-part average is
    # m-invariant while the fact-side work scales.
    pt = spark.read.parquet(os.path.join(BASE, "part.parquet"))
    pt.write.mode("overwrite").parquet(os.path.join(out, "part.parquet"))
    # nation/region stay FIXED-SIZE dimension chains (Q5/Q7/Q8 shapes):
    # replicated customers keep their original c_nationkey, so each
    # nation's customer population grows ~m with structure preserved.
    for dim in ("nation", "region"):
        spark.read.parquet(os.path.join(BASE, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{dim}.parquet"))
    open(marker, "w").close()
    return out


def probe_ivf_skew(multipliers: list[int], repeats: int) -> str:
    """Adversarial IVF probe: ONE centroid puts the whole corpus into a
    single cell — the degenerate quantizer the max_cell sub-split
    guards against. Replicates sf0.1 embeddings m times (vec_id
    offset) and times cosine_pairs_ivf capped at max_cell=512.

    Expected shape: capped pair work is n/max_cell sub-cells x
    max_cell^2/2 compares = O(n * max_cell) — LINEAR in corpus size
    even though every vector shares one cell; uncapped the same join
    is O(n^2). The smallest multiplier also runs uncapped once to show
    the quadratic baseline the cap removes."""
    from flink_pipeline_spark.operators.llm import cosine_pairs_ivf

    lines = [
        "",
        "## IVF degenerate-quantizer probe (single cell, max_cell=512)",
        "",
        "| m | vectors | capped sec | capped pairs | uncapped sec |",
        "|---|---|---|---|---|",
    ]
    for m in multipliers:
        spark = None
        try:
            spark = (
                SparkSession.builder.master(
                    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
                )
                .config(
                    "spark.sql.shuffle.partitions",
                    os.environ.get("SPARK_GRAFT_CPUS", "32"),
                )
                .config("spark.driver.memory", "16g")
                .appName("scale_probe_ivf")
                .getOrCreate()
            )
            base = spark.read.parquet(
                os.path.join(BASE, "embeddings.parquet")
            ).select("vec_id", "embedding")
            emb = base
            for k in range(1, m):
                emb = emb.unionByName(
                    base.select(
                        (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                        "embedding",
                    )
                )
            emb = emb.persist()
            n = emb.count()
            centroid = base.filter(F.col("vec_id") < 1)
            best, pairs = math.inf, -1
            for _ in range(repeats):
                spark.catalog.clearCache()
                emb.persist().count()
                t0 = time.monotonic()
                pairs = cosine_pairs_ivf(emb, centroid, 0.99, max_cell=512).count()
                best = min(best, time.monotonic() - t0)
            unc = ""
            if m == multipliers[0]:
                t0 = time.monotonic()
                cosine_pairs_ivf(emb, centroid, 0.99, max_cell=1 << 40).count()
                unc = f"{time.monotonic() - t0:.1f}"
            lines.append(f"| {m} | {n} | {best:.1f} | {pairs} | {unc} |")
            print(
                json.dumps(
                    {"probe": "ivf_skew", "m": m, "vectors": n,
                     "capped_sec": round(best, 3), "pairs": pairs,
                     "uncapped_sec": unc or None}
                ),
                flush=True,
            )
        finally:
            if spark is not None:
                spark.stop()
    lines += [
        "",
        "Capped wall time should grow ~linearly in m (work = n x max_cell)",
        "while the uncapped baseline is O(n^2) in the degenerate cell.",
        "Pairs=0 is expected: the only cos>=0.99 pairs are cross-replica",
        "copies of the same vector, whose vec_ids sit ~base-corpus apart",
        "in the sub-split ordering — the cap's documented recall trade,",
        "exercised here at its worst case on purpose (the probe measures",
        "bounded compare work, not recall).",
    ]
    return "\n".join(lines) + "\n"


def probe_cc_chain(sizes: list[int]) -> str:
    """Path-graph probe for connected_components: a chain A-B-C-... has
    diameter = length, the one shape corpus replication can never
    produce (replication preserves per-copy clique-ish clusters).
    Pure min-label propagation needs one shuffle per link; the hybrid
    must hand off to large-star/small-star and finish in O(log n)
    rounds with exact min-of-component labels."""
    from flink_pipeline_spark.operators.llm import connected_components

    lines = [
        "",
        "## Connected-components chain probe (path graph, diameter = n)",
        "",
        "| n links | wall sec | phase1 iters | star rounds | labels ok |",
        "|---|---|---|---|---|",
    ]
    for n in sizes:
        spark = None
        try:
            spark = (
                SparkSession.builder.master(
                    f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
                )
                .config(
                    "spark.sql.shuffle.partitions",
                    os.environ.get("SPARK_GRAFT_CPUS", "32"),
                )
                .config("spark.driver.memory", "16g")
                .appName("scale_probe_cc")
                .getOrCreate()
            )
            pairs = spark.range(n).select(
                F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
            )
            stats: dict = {}
            t0 = time.monotonic()
            out = connected_components(pairs, _stats=stats)
            bad = out.filter(F.col("cluster_id") != 0).count()
            total = out.count()
            wall = time.monotonic() - t0
            ok = bad == 0 and total == n + 1
            lines.append(
                f"| {n} | {wall:.1f} | {stats.get('phase1_iters')} "
                f"| {stats.get('twophase_rounds')} | {ok} |"
            )
            print(
                json.dumps(
                    {"probe": "cc_chain", "n": n, "wall_sec": round(wall, 2),
                     "phase1_iters": stats.get("phase1_iters"),
                     "star_rounds": stats.get("twophase_rounds"), "ok": ok}
                ),
                flush=True,
            )
        finally:
            if spark is not None:
                spark.stop()
    lines += [
        "",
        "Star rounds should grow ~log2(n); wall time is rounds x fixed",
        "job overhead at these sizes (the data itself is tiny).",
    ]
    return "\n".join(lines) + "\n"


def main() -> None:
    global QUERIES
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--ivf-skew",
        action="store_true",
        help="run the degenerate-quantizer IVF cell-cap probe instead "
        "of the registered-query sweep",
    )
    ap.add_argument(
        "--cc-chain",
        action="store_true",
        help="run the path-graph connected-components probe (sizes "
        "from --multipliers, e.g. --multipliers 1000,10000,100000)",
    )
    ap.add_argument(
        "--multipliers",
        default="1,2,4,8",
        help="comma-separated corpus multipliers (small ones are "
        "overhead-dominated; use e.g. 4,16,48 for timing slopes)",
    )
    ap.add_argument(
        "--queries",
        default=",".join(QUERIES),
        help="comma-separated registered query names to probe",
    )
    args = ap.parse_args()
    multipliers = [int(x) for x in args.multipliers.split(",")]
    QUERIES = args.queries.split(",")

    if args.ivf_skew:
        md = probe_ivf_skew(multipliers, args.repeats)
        if args.out:
            with open(args.out, "a") as f:
                f.write(md)
        print(md)
        return

    if args.cc_chain:
        md = probe_cc_chain(multipliers)
        if args.out:
            with open(args.out, "a") as f:
                f.write(md)
        print(md)
        return

    def fresh_session() -> SparkSession:
        return (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .config(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            )
            .config("spark.driver.memory", "16g")
            .appName("scale_probe")
            .getOrCreate()
        )

    from flink_pipeline_spark.plans import query_fns

    fns = query_fns()
    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    rows: dict[str, dict[int, int]] = {q: {} for q in QUERIES}
    for m in multipliers:
        # ONE JVM per multiplier: a long-lived session accumulates heap
        # state that poisoned earlier runs (q_dedup_minhash@48x read
        # 115 s in a session that had run 14 prior heavy queries vs
        # 18 s fresh). Restart to measure the operator, not the heap.
        spark = fresh_session()
        sf_dir = build_corpus(spark, m)
        for q in QUERIES:
            best = math.inf
            n = -1
            for _ in range(args.repeats):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                n = fns[q](spark, sf_dir).count()
                best = min(best, time.monotonic() - t0)
            results[q][m] = round(best, 3)
            rows[q][m] = n
            print(json.dumps({"query": q, "m": m, "best_sec": results[q][m], "rows": n}), flush=True)
        spark.stop()

    lines = [
        "# Dedup-family scaling probe (corpus multiplier vs wall time)",
        "",
        f"Base corpus: {BASE} documents x {multipliers} with per-copy disjoint",
        "vocabularies (constant pair density — see scripts/scale_probe.py).",
        f"Best of {args.repeats} repeats, cache cleared between runs, local mode.",
        "",
        "| query | " + " | ".join(f"{m}x sec" for m in multipliers)
        + " | rows@lo | rows@hi | scaling exponent (last octave) |",
        "|---|" + "---|" * (len(multipliers) + 3),
    ]
    lo, hi = multipliers[0], multipliers[-1]
    prev = multipliers[-2]
    for q in QUERIES:
        r = results[q]
        expo = (
            math.log(r[hi] / r[prev]) / math.log(hi / prev)
            if r[prev] > 0
            else float("nan")
        )
        cells = " | ".join(str(r[m]) for m in multipliers)
        lines.append(
            f"| {q} | {cells} | {rows[q][lo]} | {rows[q][hi]} | {expo:.2f} |"
        )
    lines += [
        "",
        "Slope ~1.0 = linear scaling (doubling the corpus doubles the time);",
        "the dedup family's capped-bucket blocking is what keeps the pair",
        "stage off the ~2.0 quadratic slope naive all-pairs would show.",
    ]
    md = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
    print(md)


if __name__ == "__main__":
    main()
