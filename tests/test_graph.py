"""Pointer-doubling ancestry resolution (operators/graph.py)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.graph import transitive_roots


def _resolve(spark, rows):
    df = spark.createDataFrame(rows, "id long, parent long")
    out = transitive_roots(df).orderBy("id").collect()
    return {r["id"]: (r["root"], r["depth"]) for r in out}


def test_deep_chain_resolves_past_doubling_boundaries(spark):
    # 1 <- 2 <- 3 <- ... <- 13: depth 12 needs 4 doubling rounds
    # (1,2,4,8,12) — crosses several non-power-of-two boundaries.
    rows = [(1, 0)] + [(i, i - 1) for i in range(2, 14)]
    got = _resolve(spark, rows)
    assert got == {i: (1, i - 1) for i in range(1, 14)}


def test_forest_with_branching(spark):
    #     1           10
    #    / \           |
    #   2   3         11
    #       |
    #       4
    rows = [(1, 0), (2, 1), (3, 1), (4, 3), (10, None), (11, 10)]
    got = _resolve(spark, rows)
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (1, 2),
                   10: (10, 0), 11: (10, 1)}


def test_dangling_parent_treated_as_root(spark):
    # 7's parent 99 is not a listed node: the chain terminates there
    # (root = the dangling id, depth = hops walked to it).
    got = _resolve(spark, [(7, 99), (8, 7)])
    assert got == {7: (99, 1), 8: (99, 2)}


def test_matches_python_walk_on_random_forest(spark):
    # parent(k) = k // 7 gives a ragged multi-level forest over 1..200.
    rows = [(k, k // 7) for k in range(1, 201)]
    got = _resolve(spark, rows)

    def walk(k):
        depth = 0
        while k // 7 > 0:
            k, depth = k // 7, depth + 1
        return k, depth

    assert got == {k: walk(k) for k in range(1, 201)}


def test_pagerank_matches_python_power_iteration(spark):
    from debezium_server_spark.operators.graph import pagerank

    # 4-node graph: 1->2, 2->3, 3->1, 3->2, 4->1 (node 4 has no inflow)
    edges = [(1, 2), (2, 3), (3, 1), (3, 2), (4, 1)]
    outdeg = {1: 1, 2: 1, 3: 2, 4: 1}
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame(
        [(k, d) for k, d in outdeg.items()], "id long, outdeg int")
    got = {r["id"]: r["rank_micro"]
           for r in pagerank(e, n, iterations=5).collect()}

    ranks = {k: 1_000_000 for k in outdeg}
    for _ in range(5):
        inflow = {k: 0 for k in outdeg}
        for s, d in edges:
            inflow[d] += ranks[s] // outdeg[s]
        ranks = {k: 150_000 + 85 * inflow[k] // 100 for k in outdeg}
    assert got == ranks
    assert got[4] == 150_000  # zero-inflow node pinned at the floor


def test_triangle_count_matches_bruteforce(spark):
    from itertools import combinations

    from debezium_server_spark.operators.graph import triangle_count

    # messy input: directed duplicates, reversed pairs, a self-loop
    raw = [(1, 2), (2, 1), (2, 3), (3, 1), (3, 4), (4, 1), (4, 4),
           (2, 4), (5, 6), (6, 7), (1, 2)]
    e = spark.createDataFrame(raw, "src long, dst long")
    got = {r["id"]: r["triangles"] for r in triangle_count(e).collect()}

    edges = {tuple(sorted(p)) for p in raw if p[0] != p[1]}
    nodes = sorted({x for p in edges for x in p})
    expect: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    assert got == expect  # {1,2,3},{1,2,4},{1,3,4},{2,3,4} -> 3 each


def test_triangle_count_skew_orientation_bounds_wedges(spark):
    """A star center with high degree contributes NO wedges after
    degree orientation (all its edges point outward from the leaves),
    so the hub never fans out quadratically — and the count is right."""
    from debezium_server_spark.operators.graph import triangle_count

    star = [(0, i) for i in range(1, 40)] + [(1, 2)]  # one closed corner
    e = spark.createDataFrame(star, "src long, dst long")
    got = {r["id"]: r["triangles"] for r in triangle_count(e).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_bfs_layers_min_dist_and_early_exit(spark):
    """Multi-source BFS: min hop distance wins when a node is reachable
    from two seeds; expansion stops early when the frontier drains
    before max_hops."""
    from debezium_server_spark.operators.graph import bfs_layers

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 3), (5, 5)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (10,)], "id long")
    got = {r["id"]: r["dist"]
           for r in bfs_layers(edges, seeds, max_hops=10).collect()}
    # 3 is 1 hop from seed 10 (not 2 hops from seed 1); 5 unreachable
    assert got == {1: 0, 10: 0, 2: 1, 3: 1, 4: 2}


# ---- k-core decomposition -------------------------------------------------

def _kcore(spark, und_pairs, k=2, rounds=6):
    from debezium_server_spark.operators.graph import kcore

    both = und_pairs + [(b, a) for a, b in und_pairs]
    df = spark.createDataFrame(both, "src long, dst long")
    out = kcore(df, k=k, rounds=rounds).collect()
    return {r["node"]: r["degree"] for r in out}


def test_kcore_keeps_clique_drops_pendant_chain(spark):
    # triangle 1-2-3 (each degree 2) with pendant chain 3-4-5:
    # chain nodes peel (degree 1), the triangle is the entire 2-core.
    got = _kcore(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel(spark):
    # path 1-2-3-4-5: every node eventually peels (no 2-core), but only
    # via CASCADE — after round 1 removes the endpoints, new endpoints
    # appear. A single-round degree filter would wrongly keep 2,3,4.
    got = _kcore(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {}


def test_kcore_two_components(spark):
    # 4-clique survives at k=3; the separate triangle does not.
    clique = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    tri = [(10, 11), (11, 12), (10, 12)]
    got = _kcore(spark, clique + tri, k=3)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_rounds_bounded_contract(spark):
    """Pin the documented rounds-bounded semantics on a 20-node path:
    too-few rounds return the documented over-approximation; enough
    rounds return the true (empty) 2-core."""
    from debezium_server_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(19)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in path] + [(b, a) for a, b in path],
        "src long, dst long")
    # 6 rounds peel 12 endpoints: an 8-node path [6..13] remains; the
    # final half-step filter keeps its 6 interior nodes with degree 2
    # measured in the round-6 subgraph (documented approximation).
    got = {r["node"]: r["degree"] for r in
           kcore(edges, k=2, rounds=6).collect()}
    assert got == {i: 2 for i in range(7, 13)}
    # a path's true 2-core is empty; 10 rounds reach the fixpoint
    assert kcore(edges, k=2, rounds=10).count() == 0
