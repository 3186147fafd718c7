"""Round-5 semantic pin tests — the properties the consistency oracle
cannot see (round-4 verdict #2: every policy-bearing entry ships a test
pinning its direction/completeness against an independent computation).

- multivector_maxsim_rerank: MaxSim really is sum-over-query-subvectors
  of MAX-over-doc-subvectors (not min, not mean), rank 1 is the HIGHEST
  score, and brute_hit marks true exhaustive-top-5 membership —
  recomputed with numpy from the raw parquet, no Spark expressions.
- pgoutput entries' policy pins live in tests/test_pgoutput_source.py
  (op-code direction, key-only delete images, cross-band association).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from debezium_server_spark.plans.catalog import CATALOG


def _vectors(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    return {int(v): np.asarray(e, dtype=np.float64)
            for v, e in zip(t["vec_id"], t["embedding"])}


def _maxsim(q, d):
    """Independent MaxSim: round(x*1000) integer quantization, 4x16
    sub-vectors, sum_i max_j (q_i . d_j)."""
    qi = np.round(q * 1000).astype(np.int64).reshape(4, 16)
    di = np.round(d * 1000).astype(np.int64).reshape(4, 16)
    return int(sum((qi[i] @ di.T).max() for i in range(4)))


def _ivf_pool(vecs, query_id, n_probe=4):
    """Independent IVF rule: round(x*1e6) quantization, centroids =
    even vec_id < 32, integer argmin assignment (ties to lower cell)."""
    q6 = {v: np.round(e * 1_000_000).astype(np.int64)
          for v, e in vecs.items()}
    cents = {c: q6[c] for c in sorted(q6) if c < 32 and c % 2 == 0}

    def d2(a, b):
        diff = a - b
        return int(diff @ diff)

    probe_cells = sorted(cents, key=lambda c: (d2(q6[query_id], cents[c]), c))[:n_probe]
    pool = set()
    for v in q6:
        assigned = min(cents, key=lambda c: (d2(q6[v], cents[c]), c))
        if assigned in probe_cells and v != query_id:
            pool.add(v)
    return pool


@pytest.fixture(scope="module")
def rerank_rows(spark, sf_dir):
    return CATALOG["multivector_maxsim_rerank"].spark_fn(spark, sf_dir).collect()


def test_maxsim_rerank_direction_and_pool(rerank_rows, sf_dir):
    vecs = _vectors(sf_dir)
    for qid in (0, 1, 2):
        rows = sorted((r for r in rerank_rows if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        pool = _ivf_pool(vecs, qid)
        expected = sorted(
            ((_maxsim(vecs[qid], vecs[n]), n) for n in pool),
            key=lambda t: (-t[0], t[1]))[:5]
        got = [(r["maxsim"], r["neighbor_id"]) for r in rows]
        # rank 1 is the HIGHEST pool score (direction pin) and the full
        # top-5 matches the independent recomputation exactly
        assert got == expected
        assert got[0][0] == max(s for s, _ in expected)


def test_maxsim_rerank_brute_hit_is_exhaustive_membership(rerank_rows, sf_dir):
    vecs = _vectors(sf_dir)
    for qid in (0, 1, 2):
        brute5 = {n for _, n in sorted(
            ((_maxsim(vecs[qid], vecs[n]), n)
             for n in vecs if n != qid),
            key=lambda t: (-t[0], t[1]))[:5]}
        for r in (r for r in rerank_rows if r["query_id"] == qid):
            assert r["brute_hit"] == (r["neighbor_id"] in brute5)
