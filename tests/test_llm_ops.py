"""Behavioral tests for the LLM-data operators beyond oracle parity:
known near-dup recovery, simhash locality, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_pipeline_spark.catalog import load_table
from flink_pipeline_spark.operators.llm import (
    knn_classify,
    label_centroids,
    lsh_candidate_pairs,
    simhash,
    simhash_pairs,
    topk_neighbors,
    topk_neighbors_ivf,
    verified_near_dups,
)
from flink_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    to_multimodal,
)

from .conftest import SF_DIR


def test_minhash_finds_planted_near_dups(spark):
    """The fixture plants shingle-Jaccard ~0.98 pairs; banded LSH with
    4 bands x 3 rows must surface them and verification must score
    them high."""
    docs = load_table(spark, SF_DIR, "documents")
    found = verified_near_dups(docs, lsh_candidate_pairs(docs), threshold=0.8)
    rows = {(r.doc_a, r.doc_b): r.jacc for r in found.collect()}
    assert len(rows) >= 5, f"expected planted near-dups, got {rows}"
    assert all(j >= 0.8 for j in rows.values())


def test_simhash_locality(spark):
    """Locality, stated as what simhash actually promises: verified
    near-dup pairs land FAR closer in hamming space than random pairs
    (individual pairs can land a few bits out — the per-pair distance
    is probabilistic), and the default-width signature stays in range.
    Thresholds scale with the signature width (distances grow
    proportionally with bits)."""
    from flink_pipeline_spark.functions.text import SIMHASH_BITS

    docs = load_table(spark, SF_DIR, "documents")
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert all(0 <= v < 2**SIMHASH_BITS for v in sh.values())
    near = verified_near_dups(docs, lsh_candidate_pairs(docs), threshold=0.9).collect()
    assert near

    def ham(a: int, b: int) -> int:
        return bin(sh[a] ^ sh[b]).count("1")

    near_h = sorted(ham(r.doc_a, r.doc_b) for r in near)
    ids = sorted(sh)
    rand_h = [ham(ids[i], ids[-1 - i]) for i in range(len(ids) // 2)]
    median_near = near_h[len(near_h) // 2]
    mean_near = sum(near_h) / len(near_h)
    mean_rand = sum(rand_h) / len(rand_h)
    assert median_near <= SIMHASH_BITS // 4, near_h
    assert mean_near < mean_rand / 2, (mean_near, mean_rand)


def test_simhash_pairs_exact_recall(spark):
    """Pigeonhole blocking with max_bucket=None is exact: the pair
    query must return EVERY pair within the hamming threshold (verified
    brute-force from the signatures), with the correct distance. The
    default capped mode may only drop pairs, never invent or misscore
    them."""
    docs = load_table(spark, SF_DIR, "documents")
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sh)
    expected = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    exact = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(docs, max_hamming=3, max_bucket=None).collect()
    }
    assert exact == expected
    capped = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    assert set(capped) <= set(exact)
    assert all(exact[p] == h for p, h in capped.items())


def test_topk_self_excluded_and_ranked(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = topk_neighbors(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, 6))
        cs = [r[1] for r in rows]
        assert cs == sorted(cs, reverse=True), f"cos not monotone for {q}"


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """With nprobe = #centroids every cell is probed, so the IVF search
    must return exactly the brute-force top-k; with nprobe=1 results
    are a subset drawn only from each query's best cell."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cents = emb.filter(F.col("vec_id") < 8)
    brute = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in topk_neighbors(emb, queries, k=3).collect()
    }
    full = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in topk_neighbors_ivf(emb, queries, cents, k=3, nprobe=8).collect()
    }
    assert full == brute
    narrow = topk_neighbors_ivf(emb, queries, cents, k=3, nprobe=1).collect()
    assert narrow  # planted fixture always has same-cell neighbors
    for r in narrow:
        assert r.neighbor_id != r.query_id
        # anything the narrow probe found at rank r scores <= the
        # brute-force neighbor at that rank (ANN can only lose recall)
        assert r.cos <= brute[(r.query_id, r.rank)][1]


def test_ivf_pairs_cell_cap_bounds_degenerate_quantizer(spark):
    """A single-centroid quantizer puts the whole corpus in one cell —
    the degenerate case the max_cell guard exists for. With the cap off
    (max_cell >= n) the single cell is all-pairs; with it on, every
    vector's pair fan-out is bounded by max_cell-1 and emitted pairs
    are a subset of the uncapped set (sub-split only removes)."""
    from flink_pipeline_spark.operators.llm import cosine_pairs_ivf

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 100)
    one_centroid = emb.filter(F.col("vec_id") < 1)
    uncapped = {
        (r.vec_a, r.vec_b)
        for r in cosine_pairs_ivf(emb, one_centroid, 0.1, max_cell=1000).collect()
    }
    capped_rows = cosine_pairs_ivf(emb, one_centroid, 0.1, max_cell=16).collect()
    capped = {(r.vec_a, r.vec_b) for r in capped_rows}
    assert capped and capped < uncapped  # cap active: strictly fewer pairs
    fanout: dict[int, int] = {}
    for a, b in capped:
        fanout[a] = fanout.get(a, 0) + 1
        fanout[b] = fanout.get(b, 0) + 1
    assert max(fanout.values()) <= 15  # max_cell-1: no key exceeds its sub-cell


def test_ivf_pairs_multiprobe_recovers_boundary_pairs(spark):
    """nprobe=2 pair generation is a recall superset of the single
    assignment at the same cap (every top-1 cell is within the top-2
    set), emits no duplicate rows (the DISTINCT is exact on the
    rounded cosine), and stays a subset of exact all-pairs."""
    from flink_pipeline_spark.operators.llm import cosine_pairs, cosine_pairs_ivf

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 200)
    cents = emb.filter(F.col("vec_id") < 8)
    single = {
        (r.vec_a, r.vec_b)
        for r in cosine_pairs_ivf(emb, cents, 0.3, max_cell=10_000).collect()
    }
    multi_rows = cosine_pairs_ivf(
        emb, cents, 0.3, max_cell=10_000, nprobe=2
    ).collect()
    multi = {(r.vec_a, r.vec_b) for r in multi_rows}
    assert len(multi_rows) == len(multi)  # no duplicate pair rows
    assert single <= multi
    exact = {(r.vec_a, r.vec_b) for r in cosine_pairs(emb, 0.3).collect()}
    assert multi <= exact


def test_multimodal_schema_and_fake_decode(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    mm = to_multimodal(docs)
    assert [f.name for f in mm.schema.fields] == ["doc_id", "payload", "meta"]
    assert mm.schema["payload"].dataType.typeName() == "binary"
    meta_names = [f.name for f in mm.schema["meta"].dataType.fields]
    assert meta_names == ["byte_len", "content_hash", "mime"]

    feats = decode_features(mm, impl="fake")
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert r.features[0] == float(r.byte_len)
    # deterministic: re-run yields identical features
    again = {r.doc_id: r.features for r in decode_features(mm, impl="fake").collect()}
    assert all(again[r.doc_id] == r.features for r in rows)


def test_multimodal_real_decode_pcm16(spark):
    """impl='real' is the PCM16 struct-unpack codec: deterministic,
    sample-domain (first feature = sample count = byte_len // 2), and
    distinct from the bytes-level fake."""
    mm = to_multimodal(load_table(spark, SF_DIR, "documents").limit(5))
    rows = decode_features(mm, impl="real").collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert r.features[0] == float(r.byte_len // 2)
    again = {r.doc_id: r.features for r in decode_features(mm, impl="real").collect()}
    assert all(again[r.doc_id] == r.features for r in rows)
    fake = {r.doc_id: r.features for r in decode_features(mm, impl="fake").collect()}
    assert any(fake[r.doc_id] != r.features for r in rows)
    with pytest.raises(ValueError, match="impl must be"):
        decode_features(mm, impl="nope")


def test_decode_pcm16_matches_numpy(spark):
    """The per-file codec's stats agree with a direct struct-unpack of
    the committed fixture bytes."""
    import math
    from pathlib import Path

    import numpy as np

    from flink_pipeline_spark.operators.multimodal import decode_pcm16
    from flink_pipeline_spark.plans.scans import BLOB_DIR

    df = spark.read.format("binaryFile").load(BLOB_DIR + "/*.bin")
    files = df.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"), "content"
    )
    got = {r.file: r for r in decode_pcm16(files).collect()}
    for p in sorted(Path(BLOB_DIR).glob("*.bin")):
        b = p.read_bytes()
        v = np.frombuffer(b[: len(b) // 2 * 2], dtype="<u2").astype("int64")
        r = got[p.name]
        assert r.n_samples == v.size
        assert r.peak == int(v.max())
        assert r.energy == int((v * v).sum())
        mean = float(int(v.sum())) / v.size
        assert r.mean_ampl == math.floor(mean * 10_000 + 0.5) / 10_000


def test_connected_components_chain_and_islands(spark):
    """The hybrid CC must converge on a path graph (worst-case diameter
    for its size) and keep disjoint components separate."""
    from flink_pipeline_spark.operators.llm import connected_components

    # chain 1-2-3-4-5 (diameter 4 forces multiple iterations),
    # triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a BIGINT, doc_b BIGINT",
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_logarithmic(spark):
    """A 1,000-link path graph — the crawl-mirror-chain shape whose
    diameter equals its length, where pure min-label propagation would
    need ~1,000 shuffles. The hybrid must hand off to the large-star/
    small-star phase and converge in O(log n) star rounds, yielding
    exact min-of-component labels."""
    from flink_pipeline_spark.operators.llm import connected_components

    n = 1001  # nodes 0..1000 in one path component
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a BIGINT, doc_b BIGINT"
    ).repartition(8)
    stats: dict = {}
    got = connected_components(pairs, _stats=stats)
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == n
    assert stats["phase1_iters"] == 4  # hit the switch, didn't converge
    # 2 * log2(1000) ~ 20 is the paper bound; in practice far fewer
    assert 1 <= stats["twophase_rounds"] <= 12, stats


def test_connected_components_random_graphs_match_union_find(spark):
    """Seeded random graphs, phase 2 forced (switch_after=1): the
    hybrid's labels must equal a plain union-find's min-of-component
    on every graph — mixed cliques, chains, stars and singleton-free
    noise edges."""
    import random

    from flink_pipeline_spark.operators.llm import connected_components

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 120
        edges = {
            tuple(sorted(rng.sample(range(n), 2))) for _ in range(150)
        }
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        expect = {v: find(v) for v in touched}
        pairs = spark.createDataFrame(
            sorted(edges), "doc_a BIGINT, doc_b BIGINT"
        )
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(pairs, switch_after=1).collect()
        }
        assert got == expect, f"seed {seed}"


def test_connected_components_nonconvergence_raises(spark):
    """max_iter bounds BOTH phases: with one min-label iteration and a
    single star round allowed, a 6-chain (still a 5-link path after
    contraction) cannot finish, and the guard must raise rather than
    return wrong clusters."""
    from flink_pipeline_spark.operators.llm import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "doc_a BIGINT, doc_b BIGINT"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_knn_classify_vote_bounds_and_centroid_shape(spark):
    """Votes are bounded by k, predictions come from the label domain,
    and centroids have the embedding's dimensionality with one row per
    label."""
    emb = load_table(spark, SF_DIR, "embeddings")
    labels = {r.label for r in emb.select("label").distinct().collect()}
    out = knn_classify(emb, emb.filter(F.col("vec_id") < 10), k=5).collect()
    assert len(out) == 10
    for r in out:
        assert 1 <= r.n_votes <= 5
        assert r.predicted_label in labels
    cents = label_centroids(emb).collect()
    assert {r.label for r in cents} == labels
    dim = len(emb.select("embedding").first().embedding)
    for r in cents:
        assert len(r.centroid) == dim
        assert r.n_vectors > 0


def test_containment_catches_embedded_doc(spark):
    """A small doc fully embedded in a big one must score containment
    1.0 while its Jaccard stays far below any dedup threshold — the
    case this operator family member exists for."""
    from flink_pipeline_spark.operators.llm import containment_pairs

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, big), (2, small), (3, "totally unrelated words here now")],
        "doc_id BIGINT, text STRING",
    )
    rows = containment_pairs(docs, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1, 2)]
    assert rows[0].containment == 1.0
    # the same pair fails union-normalized Jaccard at any sane cutoff
    from flink_pipeline_spark.operators.llm import doc_shingles

    sets = {r.doc_id: set(r.s) for r in doc_shingles(docs).collect()}
    jacc = len(sets[1] & sets[2]) / len(sets[1] | sets[2])
    assert jacc < 0.1


def test_containment_df_cap_prunes_hot_shingles(spark):
    """With max_df below the number of sharers, a shingle shared by
    every doc generates no bucket — the rare-shingle cap is the
    sub-quadratic guarantee."""
    from flink_pipeline_spark.operators.llm import containment_pairs

    common = " ".join(f"c{i}" for i in range(6))
    docs = spark.createDataFrame(
        [(i, common) for i in range(1, 6)], "doc_id BIGINT, text STRING"
    )
    assert containment_pairs(docs, max_df=4).count() == 0
    assert containment_pairs(docs, max_df=5).count() == 10


def test_substring_dedup_removes_shared_span_everywhere(spark):
    """ExactSubstr semantics: a 10-token span shared by two docs is
    removed from BOTH (zero copies kept), unshared text survives, and
    an untouched doc reports zero drops with the hash of its own text."""
    from flink_pipeline_spark.operators.llm import substring_dedup_stats

    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"{shared} delta epsilon"),
            (3, "entirely unrelated text here"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in substring_dedup_stats(docs, n=10).collect()}
    assert out[1].n_tokens == 13 and out[1].n_dropped == 10
    assert out[2].n_tokens == 12 and out[2].n_dropped == 10
    assert out[3].n_tokens == 4 and out[3].n_dropped == 0
    import hashlib

    md5_8 = lambda s: hashlib.md5(s.encode()).hexdigest()[:8]  # noqa: E731
    assert out[1].kept_hash == md5_8("alpha beta gamma")
    assert out[2].kept_hash == md5_8("delta epsilon")
    assert out[3].kept_hash == md5_8("entirely unrelated text here")


def test_substring_dedup_overlapping_spans_drop_union(spark):
    """Two docs sharing an 11-token run: both 10-gram starts are
    duplicated, and the dropped positions are the UNION of the two
    overlapping spans (11 tokens), not 20."""
    from flink_pipeline_spark.operators.llm import substring_dedup_stats

    run = " ".join(f"r{i}" for i in range(11))
    docs = spark.createDataFrame(
        [(1, f"{run} tail"), (2, f"head {run}")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in substring_dedup_stats(docs, n=10).collect()}
    assert out[1].n_dropped == 11 and out[1].n_tokens == 12
    assert out[2].n_dropped == 11 and out[2].n_tokens == 12


def test_substring_dedup_intra_doc_repeat(spark):
    """Lee et al. remove ANY substring with >= 2 corpus occurrences —
    including a span repeated twice WITHIN one document (r6 fix: the
    frequency key is total occurrences, not distinct docs)."""
    import hashlib

    from flink_pipeline_spark.operators.llm import substring_dedup_stats

    span = " ".join(f"x{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{span} mid {span}"), (2, "unrelated filler words only")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in substring_dedup_stats(docs, n=10).collect()}
    assert out[1].n_tokens == 21 and out[1].n_dropped == 20
    assert out[1].kept_hash == hashlib.md5(b"mid").hexdigest()[:8]
    assert out[2].n_dropped == 0


def test_incremental_dedup_actions(spark):
    """Batch docs (doc_id % 10 = 0) vs corpus: exact copy -> drop_exact,
    near copy -> drop_near, unique -> keep; corpus-internal and
    batch-internal duplicates are untouched."""
    from flink_pipeline_spark.operators.llm import incremental_dedup

    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    docs = spark.createDataFrame(
        [
            (1, base),                      # corpus original
            (2, "other corpus text " * 5),  # corpus noise
            (10, base),                     # batch: exact copy of 1
            (20, near),                     # batch: near copy of 1
            (30, "completely unique batch doc " * 3),  # batch: keep
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r.doc_id: r.action
        for r in incremental_dedup(docs, "doc_id % 10 = 0").collect()
    }
    assert out == {10: "drop_exact", 20: "drop_near", 30: "keep"}


def test_text_chunks_boundaries(spark):
    """Chunking edges: a doc exactly at width is one chunk; one token
    over spills a second (truncated) chunk starting at the stride; a
    doc far under width is a single short chunk; width+stride tokens
    give two full-width overlapping chunks."""
    from pyspark.sql import functions as F

    from flink_pipeline_spark.plans.llm_ops import (
        CHUNK_STRIDE as s,
        CHUNK_WIDTH as w,
        chunk_list_sql,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(w))),        # exactly width
            (2, " ".join(f"t{i}" for i in range(w + 1))),    # one over
            (3, "short doc"),                                # far under
            (4, " ".join(f"t{i}" for i in range(w + s))),    # two full starts
        ],
        "doc_id LONG, text STRING",
    )
    # the PRODUCTION chunk expression, against hand-built boundary docs
    out = (
        docs.select(
            "doc_id", F.posexplode(F.expr(chunk_list_sql())).alias("cid", "chunk")
        )
        .select("doc_id", "cid", F.size(F.split("chunk", " ")).alias("n"))
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.n)
    assert by_doc[1] == [w]
    assert by_doc[2] == [w, w + 1 - s]      # second chunk truncated
    assert by_doc[3] == [2]
    assert by_doc[4] == [w, w]              # stride start still fills width


def test_multimodal_frames_non_ascii_parity(spark):
    """The latent byte-vs-char break the ASCII sanitization closes:
    with multi-byte characters in the text, the sanitized Spark
    operator output must still match both a hashlib ground truth AND
    the DuckDB oracle replay on the same rows."""
    import hashlib

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_pipeline_spark.operators.multimodal import sample_frames, to_multimodal
    from flink_pipeline_spark.plans import registry

    registry._load_all()
    raw = "café " + "x" * 70 + " \U0001f389 end"  # é and emoji
    docs = spark.createDataFrame(
        [(1, raw)], "doc_id LONG, text STRING"
    ).withColumn("text", F.regexp_replace("text", r"[^\x20-\x7E]", "?"))
    got = {
        (r.doc_id, r.frame_idx): (r.frame_len, r.frame_hash)
        for r in sample_frames(to_multimodal(docs)).collect()
    }
    sanitized = "".join(c if " " <= c <= "~" else "?" for c in raw).encode()
    expected = {}
    nframes = (len(sanitized) + 63) // 64
    for k in range(0, nframes, 4):
        fr = sanitized[k * 64 : (k + 1) * 64]
        expected[(1, k)] = (len(fr), hashlib.md5(fr).hexdigest()[:8])
    assert got == expected
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [1], "text": [raw]}))
    oracle_rows = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(registry.ORACLES["q_multimodal_frames"]).fetchall()
    }
    assert oracle_rows == expected


def test_pq_topk_semantics(spark):
    """PQ/ADC invariants: codes are valid codebook ids, every query gets
    exactly k ranked neighbors, and ADC distance of a vector to ITS OWN
    exact reconstruction through the codebook is the sum of its per-
    subspace quantization errors (checked for a codebook seed vector,
    whose codes must be its own id with zero distance)."""
    from flink_pipeline_spark.operators.llm import pq_codebook_from, pq_codes, pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_codebook_from(emb, n_codes=16)
    codes = pq_codes(emb, cb).collect()
    assert all(0 <= r.code < 16 for r in codes)
    n_vecs = emb.count()
    assert len(codes) == n_vecs * 8
    # a codebook seed vector quantizes to itself in every subspace
    seed_codes = {(r.sub, r.code) for r in codes if r.vec_id == 7}
    assert seed_codes == {(s, 7) for s in range(8)}

    out = pq_topk(emb, emb.filter(F.col("vec_id") < 4), cb, k=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2, 3}
    for q, rs in per_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3]
        assert all(r.neighbor_id != q for r in rs)
        ordered = sorted(rs, key=lambda r: (r.adist_q, r.neighbor_id))
        assert [r.rank for r in ordered] == [1, 2, 3]


def test_ann_recall_bounds_and_exact_selfcheck(spark):
    from flink_pipeline_spark.plans import query_fns

    q_ann_recall = query_fns()["q_ann_recall"]
    rows = {r.method: r for r in q_ann_recall(spark, SF_DIR).collect()}
    assert set(rows) == {
        "ivf",
        "pq",
        "sq",
        "ivfpq",
        "ivf2",
        "pq_trained",
        "rerank",
        "gexp",
        "bin",
        "nsw",
        "nsw2",
        "hnsw",
    }
    # exact re-rank can only fix misrankings inside the ADC shortlist,
    # never lose them: its recall dominates the ivfpq row's
    assert rows["rerank"].recall >= rows["ivfpq"].recall
    # graph expansion rescoring a SUPERSET of the shortlist can never
    # lose recall vs the plain rerank (equality = the hop found
    # nothing, the isotropic-fixture null the docstring documents)
    assert rows["gexp"].recall >= rows["rerank"].recall
    for r in rows.values():
        assert 0.0 <= r.recall <= 1.0
        assert r.hits <= 3 * r.n_queries
        # all methods audit the SAME issued-query set (the denominator
        # comes from the ground-truth frame, not the method's output)
        assert r.n_queries == 4


def test_text_surprisal_matches_bruteforce(spark):
    import math
    from collections import Counter

    from flink_pipeline_spark.plans import query_fns

    docs = load_table(spark, SF_DIR, "documents").collect()
    tf: Counter = Counter()
    for r in docs:
        tf.update(r.text.split(" "))
    total = sum(tf.values())
    lp_q = {t: math.floor(math.log(total / n) * 10000 + 0.5) for t, n in tf.items()}
    got = {r.doc_id: r for r in query_fns()["q_text_surprisal"](spark, SF_DIR).collect()}
    assert set(got) == {r.doc_id for r in docs}
    for r in docs[:50]:
        toks = r.text.split(" ")
        s = sum(lp_q[t] for t in toks)
        g = got[r.doc_id]
        assert g.n_tokens == len(toks)
        assert g.surprisal_q == s
        assert g.avg_surprisal == math.floor(s / len(toks) + 0.5) / 10000


def test_bpe_merge_pairs_matches_bruteforce(spark):
    """Full brute-force recomputation of the weighted pair counts."""
    from collections import Counter

    from flink_pipeline_spark.plans import query_fns
    from flink_pipeline_spark.plans.llm_ops import BPE_TOP_PAIRS

    docs = load_table(spark, SF_DIR, "documents").collect()
    wf: Counter = Counter()
    for r in docs:
        wf.update(w for w in r.text.split(" ") if len(w) >= 2)
    pc: Counter = Counter()
    for w, n in wf.items():
        for i in range(len(w) - 1):
            pc[w[i : i + 2]] += n
    expected = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]
    got = sorted(
        query_fns()["q_bpe_merge_pairs"](spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.pair, r.cnt) for r in got] == expected
    assert [r.rank for r in got] == list(range(1, BPE_TOP_PAIRS + 1))


def test_bpe_round2_matches_bruteforce(spark):
    """Recompute the full two-round BPE trajectory in plain Python:
    round-1 argmax merge, greedy left-to-right application, round-2
    weighted symbol-pair counts."""
    from collections import Counter

    from flink_pipeline_spark.plans import query_fns
    from flink_pipeline_spark.plans.llm_ops import BPE_TOP_PAIRS

    docs = load_table(spark, SF_DIR, "documents").collect()
    wf: Counter = Counter()
    for r in docs:
        wf.update(w for w in r.text.split(" ") if len(w) >= 2)
    pc1: Counter = Counter()
    for w, n in wf.items():
        for i in range(len(w) - 1):
            pc1[w[i : i + 2]] += n
    merge1 = min(pc1.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    a, b = merge1[0], merge1[1]
    pc2: Counter = Counter()
    for w, n in wf.items():
        syms, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                syms.append(merge1)
                i += 2
            else:
                syms.append(w[i])
                i += 1
        for j in range(len(syms) - 1):
            pc2[(syms[j], syms[j + 1])] += n
    expected = sorted(
        pc2.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x1f" + kv[0][1])
    )[:BPE_TOP_PAIRS]
    got = sorted(
        query_fns()["q_bpe_round2_pairs"](spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert [((r.lsym, r.rsym), r.cnt) for r in got] == expected


def test_dedup_cluster_stats_consistent_with_clusters(spark):
    from collections import Counter

    from flink_pipeline_spark.plans import query_fns

    fns = query_fns()
    members = fns["q_dedup_clusters"](spark, SF_DIR).collect()
    sizes = Counter()
    for r in members:
        sizes[r.cluster_id] += 1
    hist = Counter(sizes.values())
    got = {r.n_members: r for r in fns["q_dedup_cluster_stats"](spark, SF_DIR).collect()}
    assert {k: v.n_clusters for k, v in got.items()} == dict(hist)
    for n, r in got.items():
        assert r.n_redundant == (n - 1) * r.n_clusters
    # census covers every clustered doc
    assert sum(n * r.n_clusters for n, r in got.items()) == len(members)


def test_pq_rejects_mismatched_dims(spark):
    """The dim guard in _subvectors: a vector whose length is not
    m * d_sub must raise, not silently quantize empty subvectors."""
    from flink_pipeline_spark.operators.llm import pq_codebook_from, pq_codes

    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_codebook_from(emb, n_codes=16)
    bad = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with pytest.raises(Exception, match="dim"):
        pq_codes(bad, cb).collect()


def test_pq_refine_reduces_quantization_error(spark):
    """PQ-Lloyd sanity: the refined codebook keeps the (sub, code) grid
    well-formed (8-dim code vectors, codes within the seed id range)
    and does not worsen TOTAL quantization error — for squared-L2
    k-means each Lloyd pass is monotone non-increasing up to the
    portable floor-rounding of the means, so the corpus-wide sum of
    per-subvector min distances under the trained codebook must not
    exceed the seeded codebook's (small slack for the 1e-6 mean
    quantization)."""
    from flink_pipeline_spark.operators.llm import (
        SQDIST_Q_SQL,
        _subvectors,
        pq_codebook_from,
        pq_codebook_refine,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cb0 = pq_codebook_from(emb, n_codes=16)
    cb1 = pq_codebook_refine(emb, cb0, iters=1)

    rows = cb1.collect()
    assert all(len(r.cv) == 8 for r in rows)
    assert all(0 <= r.code < 16 for r in rows)
    # every subspace keeps at least one code (total collapse would mean
    # the assignment or the mean reassembly lost rows)
    assert {r.sub for r in rows} == set(range(8))

    sv = _subvectors(emb, 8, 8, "vec_id", "embedding")

    def total_err(cb):
        dist = SQDIST_Q_SQL.format(a="sv", b="cv")
        return (
            sv.join(F.broadcast(cb), "sub")
            .select("vec_id", "sub", F.expr(dist).alias("dist_q"))
            .groupBy("vec_id", "sub")
            .agg(F.min("dist_q").alias("d"))
            .agg(F.sum("d"))
            .collect()[0][0]
        )

    e0, e1 = total_err(cb0), total_err(cb1)
    assert e1 <= e0 + emb.count() * 8  # <= 1 quantum slack per subvector


def test_semantic_dedup_keeper_rule(spark):
    """SemDeDup verdicts: every vector appears exactly once, every
    group keeps exactly one member, and the keeper is the member with
    the LOWEST centroid cosine (diversity-preserving rule)."""
    from flink_pipeline_spark.plans import query_fns

    rows = query_fns()["q_dedup_semantic"](spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    multi = 0
    for g, ms in by_group.items():
        keeps = [r for r in ms if r.action == "keep"]
        assert len(keeps) == 1, f"group {g} keeps {len(keeps)}"
        best = min(ms, key=lambda r: (r.cos_centroid, r.vec_id))
        assert keeps[0].vec_id == best.vec_id
        if len(ms) > 1:
            multi += 1
    assert multi >= 1  # the fixture plants embedding near-dups


def test_kmeans_refine_improves_quantization(spark):
    """Lloyd sanity: every vector stays covered, dims are complete, and
    two refinement iterations do not worsen the mean assignment cosine
    vs the raw seed quantizer (Lloyd is monotone up to the portable
    rounding of means)."""
    from flink_pipeline_spark.operators.llm import (
        ivf_assign,
        kmeans_refine,
        with_norm,
        DOT_SQL,
    )
    from flink_pipeline_spark.plans import query_fns

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    rows = query_fns()["q_sim_kmeans"](spark, SF_DIR).collect()
    per_cell = {}
    for r in rows:
        per_cell.setdefault(r.cell, set()).add(r.dim)
        assert -1.0 <= r.v <= 1.0
    assert all(dims == set(range(64)) for dims in per_cell.values())
    members = {r.cell: r.n_members for r in rows}
    assert sum(members.values()) == n

    def mean_cos(cents):
        e = with_norm(emb)
        c = with_norm(cents, "embedding").select(
            F.col("vec_id").alias("cell"),
            F.col("embedding").alias("ec"),
            F.col("norm").alias("nc"),
        )
        cos = F.expr(DOT_SQL.format(a="embedding", b="ec")) / (
            F.col("norm") * F.col("nc")
        )
        assigned = ivf_assign(emb, cents)
        return (
            assigned.join(e, "vec_id")
            .join(F.broadcast(c), "cell")
            .agg(F.avg(cos))
            .collect()[0][0]
        )

    from flink_pipeline_spark.plans.llm_ops import IVF_SEED_CENTROIDS

    seeds = emb.filter(F.col("vec_id") < IVF_SEED_CENTROIDS)
    refined = kmeans_refine(emb, seeds, iters=2).select(
        F.col("cell").alias("vec_id"), F.col("cvec").alias("embedding")
    )
    # loose tolerance: the arithmetic mean is not the exact cosine
    # optimum for non-normalized vectors and the argmax runs on the
    # 1e-4-rounded cosine, so strict monotonicity is not guaranteed —
    # a refinement that is not clearly WORSE is the invariant
    assert mean_cos(refined) >= mean_cos(seeds) - 1e-3


def test_bm25_matches_bruteforce(spark):
    import math
    from collections import Counter

    from flink_pipeline_spark.plans import query_fns
    from flink_pipeline_spark.plans.llm_ops import BM25_B, BM25_K1, BM25_TERMS

    docs = load_table(spark, SF_DIR, "documents").collect()
    n_docs = float(len(docs))
    dls = {r.doc_id: len(r.text.split(" ")) for r in docs}
    avgdl = sum(dls.values()) / n_docs
    tfs = {r.doc_id: Counter(t for t in r.text.split(" ") if t in BM25_TERMS)
           for r in docs}
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    scores = {}
    for d in docs:
        s = 0
        for t, tf in tfs[d.doc_id].items():
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1)
            norm = tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[d.doc_id] / avgdl)
            s += math.floor(idf * tf * (BM25_K1 + 1) / norm * 10000 + 0.5)
        if s:
            scores[d.doc_id] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(
        query_fns()["q_text_bm25"](spark, SF_DIR).collect(), key=lambda r: r.rank
    )
    assert [(r.doc_id, r.score_q) for r in got] == expect


def test_decode_ppm_matches_formula(spark):
    """The PPM codec's output must equal the direct per-coordinate
    formula the fixture generator used (scripts/make_image_fixtures.py)
    — an independent recomputation, not a snapshot."""
    import math

    from flink_pipeline_spark.operators.multimodal import decode_ppm
    from pyspark.sql import functions as F

    w, h = 8, 6
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y) % 256))
    files = spark.createDataFrame([("a.ppm", bytes(header + px))], "file string, content binary")
    row = decode_ppm(files).collect()[0]
    assert (row.width, row.height, row.n_pixels) == (w, h, w * h)
    chans = [list(px)[c::3] for c in range(3)]
    for c, name in enumerate(("mean_r", "mean_g", "mean_b")):
        want = math.floor(sum(chans[c]) / len(chans[c]) * 10000 + 0.5) / 10000
        assert getattr(row, name) == want
    assert row.peak == max(px)
    assert row.pixel_fp == sum((i + 1) * v for i, v in enumerate(px)) % 2147483647


def test_decode_ppm_fails_loudly(spark):
    """Non-P6 magic and truncated pixel planes must raise, not emit
    plausible stats."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from flink_pipeline_spark.operators.multimodal import decode_ppm

    bad_magic = spark.createDataFrame(
        [("x.ppm", b"P5\n2 2\n255\n" + bytes(4))], "file string, content binary"
    )
    with pytest.raises(Exception, match="P6|PYTHON"):
        decode_ppm(bad_magic).collect()

    truncated = spark.createDataFrame(
        [("y.ppm", b"P6\n2 2\n255\n" + bytes(7))], "file string, content binary"
    )
    with pytest.raises(Exception, match="pixel plane|PYTHON"):
        decode_ppm(truncated).collect()


def _persisted_ids(spark):
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {e.getKey() for e in m.entrySet().toArray()}


def test_cache_hygiene_substring_dedup(spark):
    """substring_dedup_stats must leave ZERO new persisted RDDs once
    its result materializes (r6 advice: lazily-persisted intermediates
    accrete in a long-lived session)."""
    from flink_pipeline_spark.catalog import load_table
    from flink_pipeline_spark.operators.llm import substring_dedup_stats

    before = _persisted_ids(spark)
    out = substring_dedup_stats(load_table(spark, SF_DIR, "documents"), n=10)
    assert out.count() > 0
    assert _persisted_ids(spark) - before == set()


def test_cache_hygiene_incremental_dedup(spark):
    from flink_pipeline_spark.catalog import load_table
    from flink_pipeline_spark.operators.llm import incremental_dedup

    before = _persisted_ids(spark)
    out = incremental_dedup(load_table(spark, SF_DIR, "documents"), "doc_id % 10 = 0")
    assert out.count() > 0
    assert _persisted_ids(spark) - before == set()


def test_release_caches_sweeps_lazy_persists(spark):
    """Queries that legitimately keep lazily-consumed caches (e.g. the
    minhash shingle sets) are released in one sweep by
    release_caches() — the long-lived-session contract."""
    from flink_pipeline_spark.caching import release_caches
    from flink_pipeline_spark.plans.llm_ops import q_dedup_minhash

    q_dedup_minhash(spark, SF_DIR).count()
    assert len(_persisted_ids(spark)) > 0
    release_caches(spark)
    assert _persisted_ids(spark) == set()


def test_paragraph_dedup_keep_first(spark):
    """A paragraph repeated across docs (and within one) keeps ONLY
    the canonical min-(doc_id, pos) copy; unique paragraphs survive
    untouched; accounting and kept-text fingerprint reflect exactly
    the removed blocks."""
    import hashlib

    from flink_pipeline_spark.operators.llm import paragraph_dedup_stats

    boiler = "b1 b2 b3"   # 3-token block, p=3 => one paragraph
    docs = spark.createDataFrame(
        [
            # doc 1: boiler at pos 0 (the canonical copy) + unique tail
            (1, f"{boiler} u1 u2 u3"),
            # doc 2: unique head + boiler at pos 1 (dropped)
            (2, f"v1 v2 v3 {boiler}"),
            # doc 3: boiler TWICE (pos 0 dropped too: doc 1 holds the
            # canonical copy; within-doc repeat at pos 1 also dropped)
            (3, f"{boiler} {boiler}"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r for r in paragraph_dedup_stats(docs, p=3).collect()
    }
    assert rows[1]["paras_dropped"] == 0 and rows[1]["tokens_dropped"] == 0
    assert rows[2]["paras_dropped"] == 1 and rows[2]["tokens_dropped"] == 3
    assert rows[3]["paras_dropped"] == 2 and rows[3]["tokens_dropped"] == 6
    assert rows[1]["n_paras"] == 2 and rows[1]["n_tokens"] == 6
    # kept text: doc2 keeps only its unique head; doc3 keeps nothing
    assert rows[2]["kept_hash"] == hashlib.md5(b"v1 v2 v3").hexdigest()[:8]
    assert rows[3]["kept_hash"] == hashlib.md5(b"").hexdigest()[:8]


def test_decode_wav_matches_formula(spark):
    """The WAV codec's output must equal the direct per-index sample
    formula the fixture generator used (scripts/make_audio_fixtures.py)
    — an independent recomputation, not a snapshot."""
    import math
    import struct

    from flink_pipeline_spark.operators.multimodal import decode_wav

    i, rate, ch, nf = 1, 16000, 2, 320
    n = nf * ch
    samples = [((k * 37 + i * 11) % 4096) - 2048 for k in range(n)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    files = spark.createDataFrame(
        [("a.wav", hdr + data)], "file string, content binary"
    )
    row = decode_wav(files).collect()[0]
    assert (row.channels, row.sample_rate, row.n_frames) == (ch, rate, nf)
    assert row.peak_abs == max(abs(s) for s in samples)
    assert row.mean_ampl == math.floor(sum(samples) / n * 10000 + 0.5) / 10000
    rms = math.sqrt(sum(s * s for s in samples) / n)
    assert row.rms == math.floor(rms * 10000 + 0.5) / 10000
    assert row.sample_fp == sum(
        (k + 1) * (s + 32768) for k, s in enumerate(samples)
    ) % 2147483647


def test_decode_wav_fails_loudly(spark):
    """Bad magic, non-PCM format, and a data-size/payload disagreement
    must raise, not emit plausible stats."""
    import struct

    import pytest

    from flink_pipeline_spark.operators.multimodal import decode_wav

    def wav(fmt=1, bits=16, data=b"\x00\x00", size=None, magic=b"RIFF"):
        d = data
        return (
            magic + struct.pack("<I", 36 + len(d)) + b"WAVE" + b"fmt "
            + struct.pack("<IHHIIHH", 16, fmt, 1, 8000, 16000, 2, bits)
            + b"data" + struct.pack("<I", len(d) if size is None else size)
            + d
        )

    bad_magic = spark.createDataFrame(
        [("x.wav", wav(magic=b"RIFX"))], "file string, content binary"
    )
    with pytest.raises(Exception, match="RIFF|PYTHON"):
        decode_wav(bad_magic).collect()

    bad_fmt = spark.createDataFrame(
        [("y.wav", wav(fmt=3))], "file string, content binary"
    )
    with pytest.raises(Exception, match="PCM16|PYTHON"):
        decode_wav(bad_fmt).collect()

    bad_size = spark.createDataFrame(
        [("z.wav", wav(size=10))], "file string, content binary"
    )
    with pytest.raises(Exception, match="disagrees|PYTHON"):
        decode_wav(bad_size).collect()
