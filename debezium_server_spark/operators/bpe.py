"""Byte-pair-encoding trainer — the tokenizer-training precursor, shaped
for a 100 TB corpus.

Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table,
not the raw corpus: the only corpus-scale job is one aggregation to
(word, freq) — everything iterative happens on the vocabulary frame,
which is orders of magnitude smaller (Heaps' law) and stays distributed.
Each merge round is:

    adjacent-pair counts weighted by word freq  (explode + sum — one
      shuffle over the vocab, map-side combinable)
    argmax pair with lexicographic tie-break    (TakeOrdered top-1)
    apply the merge to every word's symbol list (map-only slide-and-join)

Rounds localCheckpoint the vocab (same lineage discipline as connected
components) so round k never replays rounds 1..k-1. The merge list is
driver-resident control data (n_merges × 2 strings); the corpus never
leaves the executors.

Symbols carry the `</w>` end-of-word marker so merges can capture word
endings, exactly as in the reference algorithm.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq, symbols): the ONE corpus-scale pass. Symbols
    are the word's characters plus the end-of-word marker."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    symbols = F.concat(
        F.split(F.col("word"), ""),  # single characters
        F.array(F.lit(EOW)),
    )
    return vocab.withColumn("symbols", symbols)


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the vocab's symbol lists:
    pair (a, b) counts freq × (occurrences of a followed by b).
    zip_with over shifted slices — one pass, no per-element rescans."""
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        vocab.select(F.explode(pairs).alias("pk"), "freq")
        .groupBy("pk")
        .agg(F.sum("freq").alias("n"))
        .select(
            F.split(F.col("pk"), " ").getItem(0).alias("a"),
            F.split(F.col("pk"), " ").getItem(1).alias("b"),
            "n",
        )
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) in each symbol list with the merged
    symbol, left-to-right non-overlapping (canonical BPE greedy order).

    Implemented as an Arrow-batched kernel: the slide is inherently
    sequential per word (an overlap like a,a,a must merge the LEFT pair
    first), which column algebra can't express without quadratic
    re-scans. The vocab frame is small; the kernel is a per-row list
    walk."""
    merged = a + b

    @F.pandas_udf("array<string>")
    def merge_udf(lists: pd.Series) -> pd.Series:
        out = []
        for syms in lists:
            res = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return vocab.withColumn("symbols", merge_udf(F.col("symbols")))


def bpe_train(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus. Returns the ordered
    merge list [(a, b), ...]; ties break on (count desc, a, b) so any
    engine reproduces the same vocabulary."""
    # LAZY checkpoints: each round's argmax collect is already a driver
    # barrier, and it materializes (and persists) the current vocab on
    # the way — an eager checkpoint per round would double the barrier
    # count for zero extra reuse (the NB/connected-components convention).
    vocab = word_vocab(df, text_col=text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = _apply_merge(vocab, a, b).localCheckpoint(eager=False)
    return merges


def bpe_segment(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge list to segment text into BPE tokens —
    the inference path (map-only, merges ride as broadcast closure
    data). Returns (original columns..., bpe_tokens ARRAY<STRING>)."""
    import pandas as pd

    merge_list = list(merges)

    @F.pandas_udf("array<string>")
    def segment_udf(texts: pd.Series) -> pd.Series:
        # Segmentation is a pure function of the word, and corpus word
        # occurrences vastly outnumber DISTINCT words (Heaps' law) — a
        # per-task memo turns the merge walk into a dict hit for every
        # repeat occurrence. Bit-identical output; the memo lives only
        # for the task, so executor memory stays bounded by task vocab.
        memo: dict[str, list[str]] = {}

        def seg_word(word: str) -> list[str]:
            cached = memo.get(word)
            if cached is not None:
                return cached
            syms = list(word) + [EOW]
            for a, b in merge_list:
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            memo[word] = syms
            return syms

        out = []
        for text in texts:
            toks: list[str] = []
            for word in (text or "").lower().split():
                toks.extend(seg_word(word))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn("bpe_tokens", segment_udf(F.col(text_col)))
