"""Scaling probe for the round-15 top-5 bench heavies (VERDICT r14
item 9): demonstrate that the heavy audit queries PARALLELIZE at a
larger corpus, rather than assuming it from sf0.1 — where 133/152
queries are stage-latency-bound and 8 cores match 32.

Corpus: documents replicated with per-copy disjoint vocabularies
(scale_probe.build_corpus — per-copy near-dup structure exactly
preserved, no cross-copy pairs) and embeddings replicated with a
PER-COPY CYCLIC DIMENSION ROTATION (vec_id offset + roll the 64-dim
vector by 7*k): an orthogonal transform, so every within-copy inner
product — and therefore the whole within-copy pair/graph structure —
is preserved EXACTLY, while cross-copy cosines behave like fresh
random pairs instead of the cos=1 duplicates naive replication would
plant (which would grow the output quadratically and measure a
different workload).

For each (query, multiplier, cores): fresh JVM, one untimed warm-up
run, then best-of-``--repeats`` wall. The 32c/8c ratio is the
parallelism evidence; at sf0.1 the same ratio is ~1.0 for most of the
suite (BENCH_r14_c8).

Run: python scripts/scale_probe_heavy.py [--multipliers 4] [--repeats 2]
Appends a markdown block to SCALING.md (--out).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe"

HEAVIES = [
    "q_dedup_embed_recall",
    "q_dedup_recall",
    "q_ann_delete_recall",
    "q_ann_filtered_recall",
    "q_sim_radius_recall",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

name, sf_dir, cores, repeats = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.driver.memory", "24g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .appName("probe_heavy")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from flink_pipeline_spark.plans import query_fns
fn = query_fns()[name]
best = None
for i in range(repeats + 1):  # repeat 0 = untimed JVM warm-up
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    el = time.monotonic() - t0
    spark.catalog.clearCache()
    if i > 0:
        best = el if best is None else min(best, el)
print(json.dumps({"name": name, "cores": int(cores), "secs": round(best, 2)}))
spark.stop()
"""


def build_embeddings_rotated(m: int) -> None:
    """Add the rotated embeddings replica to scale_probe's m-corpus."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    out = os.path.join(WORK, f"m{m}")
    marker = os.path.join(out, "_SUCCESS_EMB_ROT_V1")
    if os.path.exists(marker):
        return
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", "16g")
        .appName("probe_build")
        .getOrCreate()
    )
    em = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    dim = len(em.select("embedding").first()[0])
    copies = []
    for k in range(m):
        shift = (7 * k) % dim
        rolled = F.expr(
            f"concat(slice(embedding, {shift + 1}, {dim - shift}),"
            f" slice(embedding, 1, {shift}))"
        )
        copies.append(
            em.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                (rolled if k else F.col("embedding")).alias("embedding"),
                "label",
            )
        )
    allm = copies[0]
    for c in copies[1:]:
        allm = allm.unionByName(c)
    allm.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    open(marker, "w").close()
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multipliers", type=int, nargs="+", default=[4])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cores", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--queries", nargs="+", default=HEAVIES)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scale_probe import build_corpus  # noqa: E402  (sibling module)
    from pyspark.sql import SparkSession

    rows = []
    for m in args.multipliers:
        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.driver.memory", "16g")
            .appName("probe_build")
            .getOrCreate()
        )
        sf_dir = build_corpus(spark, m)
        spark.stop()
        build_embeddings_rotated(m)
        for q in args.queries:
            per_cores = {}
            for c in args.cores:
                r = subprocess.run(
                    [sys.executable, "-c", _CHILD, q, sf_dir, str(c),
                     str(args.repeats)],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
                if not line:
                    print(f"CHILD FAILED {q} c{c}:", r.stderr[-800:], flush=True)
                    continue
                rec = json.loads(line[-1])
                per_cores[c] = rec["secs"]
                print(json.dumps({"m": m, **rec}), flush=True)
            if len(per_cores) == 2:
                lo, hi = min(per_cores), max(per_cores)
                rows.append(
                    (m, q, per_cores[lo], per_cores[hi],
                     round(per_cores[lo] / per_cores[hi], 2))
                )
    md = [
        "",
        "## r15 heavy-query parallelism probe (fresh JVM per cell, "
        "warm best-of-N)",
        "",
        "| m | query | 8c s | 32c s | 8c/32c ratio |",
        "|---|---|---|---|---|",
    ] + [f"| {m} | {q} | {a} | {b} | {r} |" for m, q, a, b, r in rows]
    print("\n".join(md))
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
