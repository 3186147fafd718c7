"""Text-analysis operators: PII redaction, repetition signals,
contamination — unit-level semantics (catalog entries cover parity)."""

from debezium_server_spark.operators.text import (
    ngram_contamination,
    redact_pii,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_redact_pii_masks_and_counts(spark):
    df = _docs(spark, [
        "mail me at jane.doe+x@corp.example.com or call +1 (555) 123-4567",
        "server 10.0.0.12 logged account 123456789",
        "nothing sensitive here",
    ])
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert "[email]" in out[0]["text"] and "[phone]" in out[0]["text"]
    assert "jane" not in out[0]["text"] and "555" not in out[0]["text"]
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert "[ip]" in out[1]["text"] and "[id_number]" in out[1]["text"]
    assert out[1]["n_ip"] == 1 and out[1]["n_id_number"] == 1
    assert out[2]["text"] == "nothing sensitive here"
    assert out[2]["n_email"] == out[2]["n_phone"] == 0


def test_repetition_signals_flags_degenerate_doc(spark):
    df = _docs(spark, [
        "spam spam spam spam spam",          # 1 distinct / 5 words
        "all five words are different",
    ])
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[0]["n_words"] == 5 and out[0]["n_distinct"] == 1
    assert out[0]["top_word_frac"] == 1.0 and out[0]["ttr"] == 0.2
    assert out[1]["ttr"] == 1.0 and out[1]["top_word_frac"] == 0.2


def test_ngram_contamination_detects_shared_bigrams(spark):
    df = _docs(spark, [
        "alpha beta gamma delta",
        "alpha beta epsilon zeta",
        "totally unrelated words here",
    ])
    out = {r["doc_id"]: r for r in ngram_contamination(df).collect()}
    # docs 0 and 1 share exactly the bigram "alpha beta" (1 of 3 each)
    assert out[0]["n_grams"] == 3 and out[0]["n_shared"] == 1
    assert out[1]["n_shared"] == 1
    assert out[2]["n_shared"] == 0 and out[2]["shared_frac"] == 0.0


def test_chunk_dedup_flags_shared_chunks(spark):
    from debezium_server_spark.operators.text import chunk_dedup

    shared = " ".join(["boiler"] * 15)          # one full shared chunk
    uniq_a = " ".join(f"a{i}" for i in range(15))
    uniq_b = " ".join(f"b{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + uniq_a),
            (2, shared + " " + uniq_b),
            (3, uniq_a),                         # exact dup of doc 1's tail chunk
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_words=15).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["dup_chunks"] == 2  # both chunks shared
    assert out[2]["n_chunks"] == 2 and out[2]["dup_chunks"] == 1
    assert out[3]["dup_chunks"] == 1 and out[3]["dup_frac"] == 1.0


def test_boilerplate_strip_removes_shared_chunks_preserves_order(spark):
    from debezium_server_spark.operators.text import boilerplate_strip

    footer = " ".join(["legal"] * 15)          # exactly one 15-word chunk
    u1 = " ".join(f"a{i}" for i in range(15))
    u2 = " ".join(f"b{i}" for i in range(15))
    df = spark.createDataFrame(
        [(0, f"{u1} {footer}"), (1, f"{u2} {footer}")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_strip(df).collect()}
    assert out[0]["clean_text"] == u1
    assert out[1]["clean_text"] == u2
    assert out[0]["dropped_chunks"] == 1 and out[0]["kept_chunks"] == 1


def test_bigram_interp_logprob_shuffling_detector(spark):
    """A document whose words are real but shuffled keeps its unigram
    mass yet loses bigram mass — the interpolated score must rank the
    fluent doc above the shuffled one, and the score must equal a
    direct Python recomputation (integer micro-nats)."""
    import math

    from debezium_server_spark.operators.text import bigram_interp_logprob

    fluent = "the cat sat on the mat"
    # 10 fluent docs establish the corpus bigram stats; doc 99 uses the
    # SAME words once, shuffled — its unigram mass matches, its bigram
    # counts are all 1
    rows = [(i, fluent) for i in range(10)] + [
        (99, "mat the on sat cat the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp_micronats"])
           for r in bigram_interp_logprob(df).collect()}

    from collections import Counter
    docs = {i: t.split() for i, t in rows}
    uni = Counter(w for ws in docs.values() for w in ws)
    big = Counter(
        (ws[i], ws[i + 1]) for ws in docs.values() for i in range(len(ws) - 1))
    ctx = Counter()
    for (x, _), c in big.items():
        ctx[x] += c
    T = sum(uni.values())
    expect = {}
    for d, ws in docs.items():
        lps = []
        for i in range(len(ws) - 1):
            cb, cu, cx = big[(ws[i], ws[i + 1])], uni[ws[i + 1]], ctx[ws[i]]
            lps.append(math.floor(
                math.log((3 * cb * T + cu * cx) / (4 * cx * T)) * 1e6))
        # Spark `div` truncates toward zero, like int() on the quotient
        expect[d] = (len(lps), int(sum(lps) / len(lps)))
    assert got == expect, "exact micro-nat parity with direct recompute"
    assert got[0][1] > got[99][1], "fluent doc must outscore shuffled doc"


def test_bigram_ops_survive_single_token_docs(spark):
    """Docs with <2 tokens must yield zero bigrams, not an ANSI
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT crash (sequence(1, 0) is the
    DESCENDING [1, 0] — regression guard in _bigrams)."""
    from debezium_server_spark.operators.text import (
        bigram_interp_logprob,
        bigram_pmi,
    )

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "the cat sat")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_bigrams"]
           for r in bigram_interp_logprob(df).collect()}
    assert got == {3: 2}  # one-token and empty docs absent, no crash
    assert bigram_pmi(df, min_count=1).count() == 2


def test_winnowing_guarantee_detects_shared_run(spark):
    """The winnowing coverage guarantee: two docs sharing a token run of
    length >= w + k - 1 = 8 MUST share at least one fingerprint, at any
    alignment; docs with no shared substring share none."""
    from debezium_server_spark.operators.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    a = "x1 x2 x3 " + shared + " x4 x5 x6"
    b = "y1 " + shared + " y2 y3 y4 y5 y6 y7"                 # shifted
    c = " ".join(f"z{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string")
    fp = winnowing_fingerprints(df, k=5, w=4)
    sets = {}
    for r in fp.collect():
        sets.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert sets[1] & sets[2], "shared 8-token run must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # density: every full window contributed, positions within bounds
    for r in fp.collect():
        assert 0 <= r["fp_pos"] <= r["n_grams"] - 1


def test_exact_span_matches_shifted_run(spark):
    """ExactSubstr span detection: a shared run of exactly min_span
    tokens is found at any alignment with exact start offsets and
    length; a 7-token (sub-threshold) run is excluded."""
    from debezium_server_spark.operators.dedup import exact_span_matches

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    a = "x1 x2 x3 " + shared + " x4 x5 x6"                    # starts at 3
    b = "y1 " + shared + " y2 y3 y4 y5 y6 y7"                 # starts at 1
    sub = "p1 p2 p3 p4 p5 p6 p7"                              # 7 tokens
    c = "m1 m2 " + sub + " m3 m4 m5 m6 m7 m8 m9"
    d = sub + " n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string")
    rows = exact_span_matches(df, k=5, w=4, min_span=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["da"], r["db"]) == (1, 2)
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (3, 1, 8)


def test_exact_span_removal_merges_overlaps(spark):
    """Removal audit: overlapping spans owed to DIFFERENT earlier
    partners union into one removal range on the later doc; the
    earliest doc keeps its copy (zero removed)."""
    from debezium_server_spark.operators.dedup import exact_span_removal

    run = ("alpha beta gamma delta epsilon zeta eta theta "
           "iota kappa lam mu")                                # 12 tokens
    toks = run.split()
    a = " ".join(toks[:10]) + " a1 a2 a3 a4"   # first 10 of the run
    b = " ".join(toks[2:]) + " b1 b2 b3 b4"    # last 10 of the run
    c = run + " c1 c2"                         # the full 12-token run
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           exact_span_removal(df, k=5, w=4, min_span=8).collect()}
    assert got[1]["tokens_removed"] == 0 and got[1]["tokens_kept"] == 14
    # doc 3 owes [0,10) to doc 1 and [2,12) to doc 2 -> merged [0,12)
    assert got[3]["n_spans"] == 1
    assert got[3]["tokens_removed"] == 12
    assert got[3]["tokens_kept"] == got[3]["n_tokens"] - 12
    # doc 2 owes its overlap with doc 1 (run[2:10] = 8 tokens at pos 0)
    assert got[2]["tokens_removed"] == 8


def test_jaccard_prefix_join_complete_vs_bruteforce(spark):
    """Prefix filtering is COMPLETE: the operator returns exactly the
    pairs a brute-force all-pairs exact Jaccard >= 3/5 finds."""
    from itertools import combinations

    from debezium_server_spark.operators.dedup import jaccard_prefix_join

    docs = [
        (1, "a b c d e"),
        (2, "a b c d f"),          # J(1,2)=4/6=0.66 -> pair
        (3, "a b c x y z"),        # J(1,3)=3/8 -> no
        (4, "a b c d e"),          # J(1,4)=1, J(2,4)=0.66
        (5, "q r s t"),            # disjoint
        (6, "q r s t u v w"),      # J(5,6)=4/7=0.57 -> no (< 0.6)
        (7, "q r s t u"),          # J(5,7)=4/5=0.8, J(6,7)=5/7=0.71
    ]
    expect = set()
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = set(ta.split()), set(tb.split())
        if 5 * len(sa & sb) >= 3 * len(sa | sb):
            expect.add((ia, ib))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = jaccard_prefix_join(df, tau_num=3, tau_den=5, shingle_k=1).collect()
    got = {(r["da"], r["db"]) for r in rows}
    assert got == expect
    for r in rows:  # exact integer verification columns
        assert r["jacc_u"] == r["inter"] * 10000 // r["union_sz"]
        assert 5 * r["inter"] >= 3 * r["union_sz"]


def test_nb_classifier_separable_vocab(spark):
    """NB train+score: on a corpus with disjoint per-label vocabulary the
    classifier recovers every label, and unseen-token mass is handled
    through the closed form (a doc with one out-of-label token still
    classifies by its majority vocabulary)."""
    from debezium_server_spark.operators.text import nb_lang_classifier

    rows = [
        (1, "aa bb cc aa bb", "x"),
        (2, "aa cc aa cc bb", "x"),
        (3, "dd ee ff dd ee", "y"),
        (4, "ff ee dd ff dd", "y"),
        (5, "aa bb aa bb dd", "x"),   # one y-vocab token, still x
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in nb_lang_classifier(df).collect()}
    assert all(got[i]["predicted"] == got[i]["actual"] for i in got)
    assert got[5]["correct"] is True


def test_intra_doc_repeat_spans_offsets(spark):
    """A doc repeating a 4-token phrase at two offsets yields one span
    with exact positions; a doc with no repetition yields nothing."""
    from debezium_server_spark.operators.dedup import intra_doc_repeat_spans

    phrase = "alpha beta gamma delta"
    a = phrase + " x1 x2 x3 " + phrase + " x4"   # at 0 and at 7
    b = " ".join(f"u{i}" for i in range(15))
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = intra_doc_repeat_spans(df, k=2, min_span=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["start_b"], r["start_a"], r["span_tokens"]) == \
        (1, 0, 7, 4)
