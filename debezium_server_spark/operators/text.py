"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in-function compositions (JVM-side),
each with a DuckDB-oracle twin in plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.functions.text_functions import (
    round4,
    bpe_ish_tokens,
    char_shingles,
    tokens,
)

# Stopword marker sets for the n-gram/stopword language-ID heuristic.
# Ordered dict → deterministic tie-break (first language wins ties).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "la", "de", "los", "que", "un"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
}


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language ID by stopword-marker voting: score each language by
    marker-token hits; argmax wins, ties broken by language order,
    'unknown' when nothing matches."""
    toks = tokens(F.col(text_col))
    out = df.select(F.col(id_col), toks.alias("__toks"))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(f"score_{lang}", _marker_hits(F.col("__toks"), markers).cast("long"))
        score_cols.append(f"score_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("unknown")
    for lang in reversed(LANG_MARKERS):  # earlier langs overwrite later on ties
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.select(id_col, *score_cols, pred.alias("pred_lang"))


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: token count, mean token length,
    stopword ratio, punctuation count, alpha ratio. Deterministic integer/
    ratio math, ratios rounded to 4 decimals."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    stop_hits = _marker_hits(toks, LANG_MARKERS["en"])
    n_chars = F.length(F.col(text_col))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[\.,;:!\?]", ""))
    alpha = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z]", ""))
    mean_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("double") / n_tokens.cast("double")
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        round4(mean_tok_len).alias("mean_token_len"),
        round4(stop_hits.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        punct.cast("long").alias("punct_count"),
        round4(alpha.cast("double") / n_chars.cast("double")).alias("alpha_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 group_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Token counting per group: whitespace tokens and BPE-ish regex
    tokens (word pieces + single symbols)."""
    ws = F.size(tokens(F.col(text_col)))
    bpe = F.size(bpe_ish_tokens(F.col(text_col)))
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ws).alias("ws_tokens"),
            F.sum(bpe).alias("bpe_tokens"),
        )
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 8, stride: int = 4) -> DataFrame:
    """Rolling-hash fingerprint: minimum md5 over strided k-char shingles
    (winnowing-lite). Equal fingerprints ⇒ near-identical prefixes/content."""
    sh = char_shingles(F.col(text_col), k=k, stride=stride)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(F.col(id_col), fp.alias("fingerprint"))
