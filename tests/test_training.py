"""Semantic tests for the training-data-pipeline queries (oracle parity
is covered separately by test_oracle_parity; these check the SEMANTICS
against brute-force recomputation)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flink_pipeline_spark.catalog import load_table
from flink_pipeline_spark.plans.training import (
    PACK_BUDGET,
    q_decontaminate,
    q_pack_sequences,
    q_source_mix,
    q_text_repetition,
    q_train_split,
)

from .conftest import SF_DIR


def test_train_split_partitions_everything(spark):
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    out = {r.split: r for r in q_train_split(spark, SF_DIR).collect()}
    assert set(out) == {"train", "val", "test"}
    assert sum(r.n_docs for r in out.values()) == total
    # 80/10/10 by hash: loose bounds, the fixture is small
    assert out["train"].n_docs / total > 0.6
    assert out["val"].n_docs / total < 0.25


def test_train_split_deterministic(spark):
    a = sorted(map(tuple, q_train_split(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q_train_split(spark, SF_DIR).collect()))
    assert a == b


def test_decontaminate_counts_consistent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    corpus_by_lang = {
        r.lang: r.n
        for r in docs.filter(F.col("source") != "src0")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out = q_decontaminate(spark, SF_DIR).collect()
    assert {r.lang for r in out} == set(corpus_by_lang)
    for r in out:
        assert r.n_contaminated + r.n_clean == corpus_by_lang[r.lang]
        assert r.n_docs == corpus_by_lang[r.lang]


def test_decontaminate_bloom_superset_of_exact(spark):
    """Bloom guarantee: no false negatives (every exact hit is
    flagged), and the FP column is exactly the flagged/exact gap."""
    from flink_pipeline_spark.plans.training import q_decontaminate_bloom

    out = q_decontaminate_bloom(spark, SF_DIR).collect()
    assert out, "expected per-lang rows"
    for r in out:
        assert r.n_flagged >= r.n_exact, r
        assert r.n_false_pos == r.n_flagged - r.n_exact, r
        assert 0 <= r.n_flagged <= r.n_docs
    # the whole point of the audit: the filter is lossy in exactly
    # one direction; at 10 bits/key some FP docs should exist but
    # far fewer than the clean population
    total_fp = sum(r.n_false_pos for r in out)
    total_clean = sum(r.n_docs - r.n_exact for r in out)
    assert total_fp < 0.1 * total_clean


def test_source_cap_invariants(spark):
    """Cap accounting + the local-prune phase changes nothing: the
    two-phase plan must equal a direct single-window recomputation."""
    from flink_pipeline_spark.plans.training import SOURCE_CAP, q_source_cap

    out = {r.source: r for r in q_source_cap(spark, SF_DIR).collect()}
    assert out
    for r in out.values():
        assert r.n_kept <= SOURCE_CAP
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_kept == min(SOURCE_CAP, r.n_docs)
    # direct recomputation without the local prune
    from pyspark.sql.window import Window

    from flink_pipeline_spark.functions.portable import hash56

    d = load_table(spark, SF_DIR, "documents")
    w = Window.partitionBy("source").orderBy(hash56(F.col("doc_id")), "doc_id")
    direct = {
        r.source: (r.n_kept, r.kept_tokens)
        for r in d.select(
            "source",
            F.size(F.split("text", " ")).alias("tok"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= SOURCE_CAP)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("tok").alias("kept_tokens"))
        .collect()
    }
    assert {s: (r.n_kept, r.kept_tokens) for s, r in out.items()} == direct


def test_pack_sequences_matches_bruteforce(spark):
    """Exact recomputation of one shard's packing in plain Python."""
    docs = load_table(spark, SF_DIR, "documents")
    lang, source = docs.select("lang", "source").first()
    rows = (
        docs.filter((F.col("lang") == lang) & (F.col("source") == source))
        .select("doc_id", F.size(F.split("text", " ")).alias("tok"))
        .collect()
    )
    expected: dict[int, list[int]] = {}
    cum = 0
    for r in sorted(rows, key=lambda r: r.doc_id):
        expected.setdefault(cum // PACK_BUDGET, []).append(r.tok)
        cum += r.tok
    got = {
        r.chunk_id: (r.n_docs, r.chunk_tokens)
        for r in q_pack_sequences(spark, SF_DIR)
        .filter((F.col("lang") == lang) & (F.col("source") == source))
        .collect()
    }
    assert got == {c: (len(v), sum(v)) for c, v in expected.items()}


def test_repetition_matches_counter(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20).collect()
    out = {r.doc_id: r for r in q_text_repetition(spark, SF_DIR).collect()}
    for d in docs:
        c = Counter(d.text.split(" "))
        r = out[d.doc_id]
        assert r.n_tokens == sum(c.values())
        assert r.top_n == max(c.values())


def test_source_mix_shares_sum_to_one(spark):
    out = q_source_mix(spark, SF_DIR).collect()
    assert abs(sum(r.token_share for r in out) - 1.0) < 1e-3
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in out) == docs.count()


def test_token_budget_select_is_greedy_prefix(spark):
    # the selection must equal the naive quality-ordered greedy prefix
    from flink_pipeline_spark.plans.training import (
        TOKEN_BUDGET,
        q_token_budget_select,
    )
    from flink_pipeline_spark.plans.llm_ops import q_text_quality

    quality = {
        r.doc_id: (r.quality, r.n_tokens)
        for r in q_text_quality(spark, SF_DIR).collect()
    }
    order = sorted(quality, key=lambda d: (-quality[d][0], d))
    cum, expect = 0, set()
    for d in order:
        cum += quality[d][1]
        if cum > TOKEN_BUDGET:
            break
        expect.add(d)
    got = {r.doc_id for r in q_token_budget_select(spark, SF_DIR).collect()}
    assert got == expect
    picked_tokens = sum(quality[d][1] for d in got)
    assert picked_tokens <= TOKEN_BUDGET


def test_length_buckets_batches_are_bounded_and_complete(spark):
    from flink_pipeline_spark.plans.training import (
        BATCH_SIZE,
        BUCKET_WIDTH,
        q_length_buckets,
    )

    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    rows = q_length_buckets(spark, SF_DIR).collect()
    assert sum(r.n_seqs for r in rows) == total
    for r in rows:
        assert 1 <= r.n_seqs <= BATCH_SIZE
        # max_len stays inside its bucket's length range
        assert r.bucket * BUCKET_WIDTH < r.max_len <= (r.bucket + 1) * BUCKET_WIDTH
        assert r.pad_tokens >= 0
        assert 0.0 <= r.pad_frac < 1.0


def test_source_overlap_matches_bruteforce(spark):
    from flink_pipeline_spark.plans.training import (
        HEAD_FP_TOKENS,
        q_source_overlap,
    )

    docs = load_table(spark, SF_DIR, "documents").collect()
    by_fp: dict[str, set] = {}
    for r in docs:
        fp = " ".join(r.text.split(" ")[:HEAD_FP_TOKENS])
        by_fp.setdefault(fp, set()).add(r.source)
    expect: Counter = Counter()
    for srcs in by_fp.values():
        for a in srcs:
            for b in srcs:
                if a < b:
                    expect[(a, b)] += 1
    got = {
        (r.src_a, r.src_b): r.shared_fps
        for r in q_source_overlap(spark, SF_DIR).collect()
    }
    assert got == dict(expect)


def test_mixture_temperature_upweights_small_sources(spark):
    from flink_pipeline_spark.plans.training import q_mixture_temperature

    rows = q_mixture_temperature(spark, SF_DIR).collect()
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-3
    by_tokens = sorted(rows, key=lambda r: r.tokens)
    # alpha=0.5 flattens the mixture: smallest source boosted above 1,
    # largest damped below 1, and boost decreases with size
    assert by_tokens[0].boost > 1.0 > by_tokens[-1].boost
    boosts = [r.boost for r in by_tokens]
    assert boosts == sorted(boosts, reverse=True)


def test_dsir_weights_match_bruteforce(spark):
    import math

    from flink_pipeline_spark.plans import query_fns

    docs = load_table(spark, SF_DIR, "documents").collect()
    prop: Counter = Counter()
    targ: Counter = Counter()
    for r in docs:
        ts = r.text.split(" ")
        prop.update(ts)
        if r.source == "src0":
            targ.update(ts)
    t_prop, t_targ, vocab = sum(prop.values()), sum(targ.values()), len(prop)
    lw_q = {
        t: math.floor(
            (
                math.log((targ.get(t, 0) + 1) / (t_targ + vocab))
                - math.log(n / t_prop)
            )
            * 10000
            + 0.5
        )
        for t, n in prop.items()
    }
    got = {
        r.doc_id: r
        for r in query_fns()["q_dsir_weights"](spark, SF_DIR).collect()
    }
    corpus_docs = [r for r in docs if r.source != "src0"]
    assert set(got) == {r.doc_id for r in corpus_docs}
    for r in corpus_docs[:50]:
        ts = r.text.split(" ")
        s = sum(lw_q[t] for t in ts)
        g = got[r.doc_id]
        assert g.n_tokens == len(ts)
        assert g.logweight_q == s
        assert g.avg_logweight == math.floor(s / len(ts) + 0.5) / 10000
