"""Retrieval / corpus-curation operators added round 2: SemDeDup,
coreset sampling, BM25, RAG chunking, Bloom membership. Catalog entries
cover engine parity; these tests pin semantic invariants."""

import pytest
from pyspark.sql import functions as F

from debezium_server_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
)
from debezium_server_spark.operators.similarity import (
    assign_cells,
    coreset_sample,
    semdedup,
)
from debezium_server_spark.operators.text import bm25_rank, rag_chunks


def _vecs(spark, n=64, dim=8):
    # deterministic spread-out vectors with a few exact duplicates
    rows = []
    for i in range(n):
        # nonlinear in i so distinct ids give genuinely non-parallel
        # vectors (max non-clone cosine ≈ 0.994, clones = 1.0)
        base = [float((i * i * 7 + i * d * 13 + d * d * 5) % 97 - 48) for d in range(dim)]
        rows.append((i, base))
    # ids 60..63 duplicate ids 0..3 exactly (cosine 1.0)
    for j in range(4):
        rows[60 + j] = (60 + j, rows[j][1])
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assign_cells_every_vector_exactly_once(spark):
    df = _vecs(spark)
    a = assign_cells(df, n_cells=8).collect()
    assert len(a) == 64
    assert {r["vid"] for r in a} == set(range(64))
    assert all(0 <= r["cell"] < 8 for r in a)
    # centroid vectors are distance 0 from themselves
    own = {r["vid"]: r for r in a}
    for c in range(8):
        assert own[c]["cell"] == c and own[c]["d2"] == 0.0


def test_semdedup_drops_exact_duplicates_keeps_lowest_id(spark):
    df = _vecs(spark)
    dropped = {r["vec_id"]: r for r in semdedup(df, threshold=0.999, n_cells=8).collect()}
    # each clone must be dropped in favor of its lower-id original
    for j in range(4):
        assert 60 + j in dropped
        assert dropped[60 + j]["dup_of"] == j
        assert dropped[60 + j]["sim"] == pytest.approx(1.0, abs=1e-3)
    # originals are never dropped (no lower-id near-dup exists)
    assert all(k >= 60 for k in dropped)


def test_semdedup_threshold_monotone(spark):
    df = _vecs(spark)
    hi = semdedup(df, threshold=0.99, n_cells=8).count()
    lo = semdedup(df, threshold=0.5, n_cells=8).count()
    assert lo >= hi


def test_coreset_sample_shape_and_centroids_first(spark):
    df = _vecs(spark)
    rows = coreset_sample(df, per_cell=3, n_cells=8).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for c, members in by_cell.items():
        assert len(members) <= 3
        ranked = sorted(members, key=lambda r: r["cell_rank"])
        # rank 1 is the centroid itself (d2 = 0)
        assert ranked[0]["vec_id"] == c and ranked[0]["d2"] == 0.0
        # d2 non-decreasing in rank
        d2s = [r["d2"] for r in ranked]
        assert d2s == sorted(d2s)


def _docs(spark):
    rows = [
        (0, "spark table scan " + "filler " * 20),
        (1, "table table table window"),  # high tf, short doc → top score
        (2, "window stream"),
        (3, "nothing relevant here at all"),
        (4, "stream " * 10 + "pad " * 40),  # high tf but long doc
    ]
    return spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )


def test_bm25_ranks_matching_docs_only(spark):
    out = bm25_rank(_docs(spark), terms=("table", "window", "stream")).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # no query term → no score
    assert set(ids) == {0, 1, 2, 4}
    # ranks are 1..n dense and ordered by score desc
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, len(out) + 1))
    scores = [r["bm25_u"] for r in ranked]
    assert scores == sorted(scores, reverse=True)
    # length normalization: doc 1 (3×"table" in 4 tokens) outranks doc 4
    # (10×"stream" in 50 tokens)
    assert ranked[0]["doc_id"] == 1


def test_rag_chunks_cover_document_with_overlap(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(40))), (1, "a b c")],
        "doc_id long, text string",
    )
    rows = rag_chunks(docs, chunk_tokens=16, stride=12).collect()
    d0 = sorted((r for r in rows if r["doc_id"] == 0), key=lambda r: r["chunk_id"])
    # 40 tokens → 1 + ceil(24/12) = 3 chunks, starts 0/12/24
    assert [r["start_token"] for r in d0] == [0, 12, 24]
    assert [r["n_chunk_tokens"] for r in d0] == [16, 16, 16]
    assert d0[0]["chunk_text"].split(" ")[0] == "t0"
    assert d0[2]["chunk_text"].split(" ")[-1] == "t39"  # reaches doc end
    # consecutive chunks overlap by chunk_tokens - stride = 4 tokens
    tail = d0[0]["chunk_text"].split(" ")[-4:]
    head = d0[1]["chunk_text"].split(" ")[:4]
    assert tail == head
    # short doc → single whole-doc chunk
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert len(d1) == 1 and d1[0]["chunk_text"] == "a b c"


def test_bloom_no_false_negatives(spark):
    dim = spark.range(100).select((F.col("id") * 3).alias("k"))
    bloom = bloom_build(dim, "k", m_bits=2048, k_hashes=3)
    probe = spark.range(300).select(F.col("id").alias("k"))
    hits = {r["k"]: r["bloom_hit"] for r in bloom_probe(probe, bloom, "k", 2048, 3).collect()}
    for i in range(0, 300, 3):
        assert hits[i], f"member {i} missed — bloom false negative"


def test_bloom_semi_join_equals_exact_semi_join(spark):
    fact = spark.range(500).select((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
    dim = spark.range(20).select((F.col("id") * 5).alias("dk"))
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_semi_join(fact, dim, "k", "dk", m_bits=1024).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in fact.join(
            dim.select(F.col("dk").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == want


def test_bloom_filter_is_compact(spark):
    dim = spark.range(1000).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k", m_bits=4096, k_hashes=3).collect()
    assert len(words) <= 4096 // 64  # packed words, not per-key rows


def test_incremental_dedup_drops_near_dupes_of_indexed_corpus(spark):
    from debezium_server_spark.operators.dedup import incremental_dedup, minhash_bands

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "a completely different document about spark and data engines")],
        "doc_id long, text string",
    )
    increment = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 0
         (3, "something entirely novel never seen before in any corpus")],
        "doc_id long, text string",
    )
    index = minhash_bands(corpus)
    kept = [r["doc_id"] for r in incremental_dedup(increment, index).collect()]
    assert kept == [3]


def test_rrf_fuse_integer_contract(spark):
    from debezium_server_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long")
    vec = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse(
        {"lex": lex, "vec": vec}, top_n=10).collect()}
    T = 10 ** 12
    # doc 11: lex rank 2 -> T//62, vec rank 1 -> T//61
    assert out[11]["rrf_u"] == T // 62 + T // 61
    assert out[10]["rrf_u"] == T // 61 and out[10]["vec_rank"] is None
    assert out[13]["rrf_u"] == T // 62 and out[13]["lex_rank"] is None
    # fused order: 11 (both lists) first, then 10 (lex#1), 13 (vec#2), 12
    ranks = {r["doc_id"]: r["rank"] for r in out.values()}
    assert ranks == {11: 1, 10: 2, 13: 3, 12: 4}


def test_cosine_topk_exclude_same_label(spark):
    from debezium_server_spark.operators.similarity import cosine_topk

    # query 0 (label A) is nearly identical to 1 (label A) and 2 (label B);
    # hard negatives must skip 1 despite its higher similarity
    rows = [
        (0, [1.0, 0.0, 0.0], "A"),
        (1, [0.99, 0.14, 0.0], "A"),
        (2, [0.9, 0.43, 0.0], "B"),
        (3, [0.0, 1.0, 0.0], "B"),
        (4, [0.0, 0.0, 1.0], "A"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    out = cosine_topk(
        df, df.filter("vec_id = 0"), k=2, exclude_same="label").collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(2, 1), (3, 2)]


def test_assign_cells_adaptive_count(spark):
    # 64 vectors, target 8 rows/cell -> least(greatest(2, 64 div 8),
    # 4096) = 8 cells; with no target the pinned n_cells=2 stands.
    df = _vecs(spark)
    adaptive = assign_cells(df, n_cells=2, target_cell_rows=8).collect()
    assert len(adaptive) == 64
    assert {r["cell"] for r in adaptive} == set(range(8))
    pinned = assign_cells(df, n_cells=2).collect()
    assert {r["cell"] for r in pinned} == {0, 1}
    # the floor: tiny corpora never drop below the pinned minimum
    small = assign_cells(df.limit(10), n_cells=4,
                         target_cell_rows=1000).collect()
    assert {r["cell"] for r in small} <= {0, 1, 2, 3}
