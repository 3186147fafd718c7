"""Connected components over near-dup pair graphs (operators/dedup.py)."""

from debezium_server_spark.operators.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_chain_collapses_to_one_component(spark):
    # a~b, b~c, c~d but no direct a~c/a~d: the one-pass smaller-id
    # anti-join keeps {a, c}; true closure is a single component.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_component_label_is_min_regardless_of_edge_direction(spark):
    # min id appears only on the right side of pairs
    got = _cc(spark, [(5, 1), (5, 6), (6, 7)])
    assert got == {1: 1, 5: 1, 6: 1, 7: 1}


def test_long_chain_converges(spark):
    n = 30
    got = _cc(spark, [(i, i + 1) for i in range(1, n)])
    assert set(got.values()) == {1} and len(got) == n


def test_empty_pairs(spark):
    assert _cc(spark, []) == {}
