"""BPE trainer vs the canonical pure-Python reference algorithm
(Sennrich et al.'s get_stats/merge_vocab loop) on the same corpus."""

from collections import Counter

from debezium_server_spark.operators.bpe import EOW, bpe_segment, bpe_train, pair_counts, word_vocab


def _ref_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [EOW])] += 1
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += freq
        if not stats:
            break
        # max count, ties broken lexicographically — mirrors the operator
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = Counter()
        for syms, freq in vocab.items():
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += freq
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide wide",
    "low new wide lower",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = bpe_train(df, n_merges=8)
    want = _ref_bpe(TEXTS, 8)
    assert got == want


def test_pair_counts_weighted_by_freq(spark):
    df = spark.createDataFrame([(0, "ab ab ba")], "doc_id long, text string")
    vocab = word_vocab(df)
    counts = {(r["a"], r["b"]): r["n"] for r in pair_counts(vocab).collect()}
    assert counts[("a", "b")] == 2      # 'ab' appears twice
    assert counts[("b", EOW)] == 2
    assert counts[("b", "a")] == 1
    assert counts[("a", EOW)] == 1


def test_bpe_segment_roundtrip(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=6)
    seg = bpe_segment(df, merges).collect()
    for r in seg:
        # concatenating tokens and removing EOW reconstructs the text
        joined = "".join(r["bpe_tokens"]).replace(EOW, " ").strip()
        assert joined == " ".join(r["text"].lower().split())
    # frequent word 'low' must have become a single token after training
    flat = [t for r in seg for t in r["bpe_tokens"]]
    assert ("low" + EOW) in flat or "low" in flat
