"""Property-based checks for the retrieval/curation operators: Bloom
membership vs a Python set, RAG chunk coverage/reassembly, BM25 vs a
naive Python scorer, Z-order vs a reference bit interleave (hypothesis
drives inputs; Spark computes once per example via the cached session)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_server_spark.operators.bloom import bloom_build, bloom_probe
from debezium_server_spark.operators.layout import zorder_value
from debezium_server_spark.operators.text import bm25_rank, rag_chunks

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_SETTINGS
@given(
    members=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    probes=st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
)
def test_bloom_membership_never_false_negative(spark, members, probes):
    dim = spark.createDataFrame([(k,) for k in members], "k long")
    bloom = bloom_build(dim, "k", m_bits=1024, k_hashes=3)
    probe = spark.createDataFrame([(k,) for k in probes], "k long")
    hits = {r["k"]: r["bloom_hit"] for r in bloom_probe(probe, bloom, "k", 1024, 3).collect()}
    for k in probes & members:
        assert hits[k], f"member {k} reported absent"


@_SETTINGS
@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    chunk=st.integers(min_value=2, max_value=24),
    stride_frac=st.integers(min_value=1, max_value=4),
)
def test_rag_chunks_cover_and_reassemble(spark, n_tokens, chunk, stride_frac):
    stride = max(1, chunk - stride_frac)  # stride < chunk ⇒ overlap
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        rag_chunks(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    # every token index covered by at least one chunk window
    covered = set()
    for r in rows:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_chunk_tokens"]
        assert toks == [f"w{i}" for i in range(r["start_token"], r["start_token"] + len(toks))]
        covered.update(range(r["start_token"], r["start_token"] + len(toks)))
    assert covered == set(range(n_tokens))
    # chunk count matches the closed form
    want = 1 + math.ceil(max(n_tokens - chunk, 0) / stride)
    assert len(rows) == want


def _naive_bm25(docs, terms, k1=1.2, b=0.75):
    tokenized = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in tokenized.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for t in tokenized.values() if term in t)
        if df == 0:
            continue
        idf_u = math.floor(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
        for i, toks in tokenized.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            contrib = math.floor(
                idf_u * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            )
            scores[i] = scores.get(i, 0) + contrib
    return scores


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["apple", "banana", "cherry", "date", "egg", "fig"]),
            min_size=1,
            max_size=30,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_bm25_matches_naive_scorer(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ("apple", "cherry")
    got = {r["doc_id"]: r["bm25_u"] for r in bm25_rank(df, terms=terms, top_n=100).collect()}
    want = _naive_bm25(rows, terms)
    assert got == want


@_SETTINGS
@given(
    xs=st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=20),
    ys=st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=20),
)
def test_zorder_matches_python_interleave(spark, xs, ys):
    pairs = list(zip(xs, ys))
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pairs:
        xm, ym, z = x % 256, y % 256, 0
        for bit in range(8):
            z |= ((xm >> bit) & 1) << (2 * bit + 1)
            z |= ((ym >> bit) & 1) << (2 * bit)
        assert got[(x, y)] == z


def test_rrf_fuse_matches_python_model_randomized(spark):
    """Randomized cross-check: rrf_fuse over arbitrary top-k lists must
    equal a direct Python model (integer contributions, score-desc /
    id-asc order), and be invariant to the order rankings are given."""
    import random

    from debezium_server_spark.operators.similarity import rrf_fuse

    rng = random.Random(7)
    T, K = 10 ** 12, 60
    for trial in range(5):
        ids = list(range(1, 30))
        lists = {}
        for name in ("a", "b", "c"):
            rng.shuffle(ids)
            lists[name] = ids[: rng.randint(1, 12)]
        frames = {
            name: spark.createDataFrame(
                [(d, r + 1) for r, d in enumerate(docs)],
                "doc_id long, rank long")
            for name, docs in lists.items()
        }
        model: dict[int, int] = {}
        for docs in lists.values():
            for r, d in enumerate(docs):
                model[d] = model.get(d, 0) + T // (K + r + 1)
        order = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

        got = rrf_fuse(frames, top_n=10).orderBy("rank").collect()
        assert [(r["doc_id"], r["rrf_u"]) for r in got] == order
        # permutation invariance of the rankings dict
        rev = {k: frames[k] for k in reversed(list(frames))}
        got2 = rrf_fuse(rev, top_n=10).orderBy("rank").collect()
        assert [(r["doc_id"], r["rrf_u"]) for r in got2] == order
