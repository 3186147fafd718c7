"""Property tests for the ExactSubstr span family: planted shared runs
are always recovered with exact offsets, and the prefix-filter join is
complete against brute force on random corpora."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORD = st.integers(min_value=0, max_value=30).map(lambda i: f"w{i}")


@st.composite
def _planted_corpus(draw):
    """Two docs from a small vocabulary with a planted shared run of
    exactly `run_len` tokens made of UNIQUE sentinel words (so the run
    cannot collide with the random filler), at random offsets."""
    run_len = draw(st.integers(min_value=8, max_value=14))
    run = [f"s{i}" for i in range(run_len)]
    pre_a = draw(st.lists(_WORD, min_size=0, max_size=10))
    post_a = draw(st.lists(_WORD, min_size=0, max_size=10))
    pre_b = draw(st.lists(_WORD, min_size=0, max_size=10))
    post_b = draw(st.lists(_WORD, min_size=0, max_size=10))
    a = pre_a + run + post_a
    b = pre_b + run + post_b
    return (" ".join(a), " ".join(b), len(pre_a), len(pre_b), run_len)


@_SETTINGS
@given(_planted_corpus())
def test_planted_run_always_recovered(spark, corpus):
    from debezium_server_spark.operators.dedup import exact_span_matches

    a, b, off_a, off_b, run_len = corpus
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = exact_span_matches(df, k=5, w=4, min_span=8).collect()
    # the planted run (or a superset span containing it) must be found
    hit = [
        r for r in rows
        if r["da"] == 1 and r["db"] == 2
        and r["start_a"] <= off_a
        and r["start_a"] + r["span_tokens"] >= off_a + run_len
        and r["start_b"] <= off_b
        and r["start_b"] + r["span_tokens"] >= off_b + run_len
    ]
    assert hit, f"planted run at ({off_a},{off_b}) x{run_len} missed: {rows}"


@st.composite
def _random_corpus(draw):
    n_docs = draw(st.integers(min_value=3, max_value=6))
    docs = []
    for i in range(n_docs):
        words = draw(st.lists(st.integers(min_value=0, max_value=8)
                              .map(lambda x: f"t{x}"),
                              min_size=3, max_size=10))
        docs.append((i, " ".join(words)))
    return docs


@_SETTINGS
@given(_random_corpus())
def test_prefix_filter_complete_on_random_corpora(spark, docs):
    from debezium_server_spark.operators.dedup import jaccard_prefix_join

    expect = set()
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = set(ta.split()), set(tb.split())
        if sa and sb and 5 * len(sa & sb) >= 3 * len(sa | sb):
            expect.add((ia, ib))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["da"], r["db"]) for r in
           jaccard_prefix_join(df, tau_num=3, tau_den=5, shingle_k=1)
           .collect()}
    assert got == expect


@_SETTINGS
@given(_random_corpus())
def test_containment_prefix_complete_on_random_corpora(spark, docs):
    """One-sided prefix filtering is COMPLETE for containment: every
    pair with |Sa ∩ Sb| >= ceil(tau*|Sa|) must be found (both
    directions — containment is asymmetric)."""
    from debezium_server_spark.operators.dedup import containment_prefix_join

    expect = set()
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = set(ta.split()), set(tb.split())
        if sa and 5 * len(sa & sb) >= 3 * len(sa):
            expect.add((ia, ib))
        if sb and 5 * len(sa & sb) >= 3 * len(sb):
            expect.add((ib, ia))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["da"], r["db"]) for r in
           containment_prefix_join(df, tau_num=3, tau_den=5, shingle_k=1)
           .collect()}
    assert got == expect
