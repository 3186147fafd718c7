"""Product quantization (operators/similarity.py): train/encode/ADC/rerank."""

import pytest
from pyspark.sql import functions as F

from debezium_server_spark.operators.similarity import (
    cosine_topk,
    l2_normalize,
    pq_adc_topk,
    pq_encode,
    pq_topk_rerank,
    pq_train,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return l2_normalize(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ).localCheckpoint()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=8, k=16, iterations=2)


def test_codebook_shape(books):
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # 64 dims / 8 subspaces


def test_encode_shape_and_range(emb, books):
    codes = pq_encode(emb, books)
    assert codes.columns == ["vec_id", "codes"]
    stats = codes.select(
        F.count("*").alias("n"),
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("sz"),
    ).collect()[0]
    assert stats.n == emb.count()
    assert stats.sz == 8 and 0 <= stats.lo and stats.hi <= 15


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r.embedding for r in l2_normalize(df).collect()}
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector passes through


def test_rerank_recall_vs_exact(spark, emb, books):
    """Two-stage (ADC pool → exact re-rank) must recover most exact
    top-10 neighbors; raw ADC alone is much weaker on near-random data."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=10).collect()
    two_stage = pq_topk_rerank(emb, queries, books, k=10, pool=100).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in two_stage:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    assert recall > 0.7, f"recall {recall:.2%}"


def test_adc_excludes_self_and_ranks_dense(emb, books):
    queries = emb.filter(F.col("vec_id") < 3)
    out = pq_adc_topk(pq_encode(emb, books), queries, books, k=5).collect()
    per_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5]
