"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in-function compositions (JVM-side),
each with a DuckDB-oracle twin in plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def pred_lang(toks: Column) -> Column:
    """Column form of the language vote (argmax marker hits, ties to the
    earlier language, 'unknown' when nothing matches) — composable into
    single-pass pipelines without a join. NOTE: references `toks` several
    times, so pass a COLUMN REFERENCE to a projected tokens column, not
    the tokens() expression itself, in hot paths (HOF lambdas are
    interpreted; repeated tokenization would multiply the work)."""
    scores = {
        lang: _marker_hits(toks, markers).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in reversed(LANG_MARKERS):  # earlier langs overwrite later on ties
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


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
    return out.select(
        id_col, *score_cols, pred_lang(F.col("__toks")).alias("pred_lang")
    )


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


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals per document: word count,
    distinct-word count, type-token ratio, and the fraction of the doc
    taken by its single most frequent word (high top-word fraction ⇒
    degenerate/repetitive text, a standard pre-training filter).

    Shape: explode → per-(doc, word) counts → per-doc agg. Both shuffles
    key on doc_id-first keys, so a 100 TB corpus distributes by document
    with no hot keys; counts are integers (exact parity), ratios go
    through round4.
    """
    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    per_word = words.groupBy(id_col, "w").agg(F.count("*").alias("c"))
    ttr = F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
    top_frac = F.col("top_count").cast("double") / F.col("n_words").cast("double")
    return (
        per_word.groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("c").cast("long").alias("top_count"),
        )
        .select(
            id_col,
            "n_words",
            "n_distinct",
            round4(ttr).alias("ttr"),
            round4(top_frac).alias("top_word_frac"),
        )
    )


def ngram_contamination(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Cross-document contamination: per doc, the fraction of its distinct
    n-grams that also occur in at least one OTHER document — the overlap
    screen run between training corpora and eval sets.

    Distributed shape: explode distinct n-grams once, then a count(*)
    window partitioned by gram gives each occurrence its document
    frequency (grams are distinct within a doc, so occurrence count =
    doc count) — no join-back, no second scan, and no broadcast of a
    corpus-sized gram table (which would OOM at 100 TB). Two shuffles
    total: one on gram, one on doc_id; integer counts until the final
    round4 ratio.
    """
    from pyspark.sql.window import Window

    from debezium_server_spark.functions.text_functions import token_shingles

    grams = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(token_shingles(tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    docfreq = F.count("*").over(Window.partitionBy("g"))
    shared_frac = F.col("n_shared").cast("double") / F.col("n_grams").cast("double")
    return (
        grams.select(id_col, (docfreq >= 2).cast("int").alias("shared"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("shared").cast("long").alias("n_shared"),
        )
        .select(id_col, "n_grams", "n_shared", round4(shared_frac).alias("shared_frac"))
    )


# PII patterns for training-corpus scrubbing. Order matters: email first
# (owns its digits), then dotted IPs, then contiguous id runs; phone last
# so it only claims separator-structured digit groups the earlier kinds
# left behind (its class has no dot, so it can never span an IP).
PII_PATTERNS: dict[str, str] = {
    "email": r"[\w.+-]+@[\w-]+(\.[\w-]+)+",
    "ip": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    "id_number": r"\b\d{6,}\b",
    "phone": r"\+?\d[\d()\s-]{6,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    mask: str = "[{kind}]",
    out_col: str | None = None,
) -> DataFrame:
    """PII redaction for training corpora: replace matches of each named
    pattern with a typed mask token (`[email]`, `[phone]`, …) and count
    the hits per kind — pure `regexp_replace`/`regexp_extract_all`
    column expressions, whole-stage-codegen'd JVM regex, no Python in the
    row path. Counts let a pipeline quarantine high-PII docs instead of
    silently rewriting them."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out_col = out_col or text_col
    redacted = F.col(text_col)
    out = df
    for kind, pat in patterns.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(redacted, F.lit(pat), 0)).cast("long"),
        )
        redacted = F.regexp_replace(redacted, pat, mask.format(kind=kind))
    return out.withColumn(out_col, redacted)


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 8, stride: int = 4) -> DataFrame:
    """Rolling-hash fingerprint: minimum md5 over strided k-char shingles
    (winnowing-lite). Equal fingerprints ⇒ near-identical prefixes/content."""
    sh = char_shingles(F.col(text_col), k=k, stride=stride)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 15,
) -> DataFrame:
    """Paragraph/chunk-level exact dedup signals (the C4/CCNet boilerplate
    pass, adapted to newline-free corpora): split each document into
    consecutive `chunk_words`-word chunks, hash each chunk, and count how
    many of a document's chunks also appear in ANY other document.

    Two shuffles, both linear: (1) chunk-hash → corpus-wide occurrence
    counts (map-side combinable; the shuffle carries |distinct chunks|
    rows), (2) doc_id → per-document rollup. No pairwise comparison —
    boilerplate detection is a counting problem, not a similarity one.

    Returns (id, n_chunks, dup_chunks, dup_frac).
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(F.array_join(F.slice(toks, i * chunk_words + 1, chunk_words), " ")),
    )
    # Checkpoint the chunk-hash frame: `freq` aggregates it and then
    # arrives at the join as a BroadcastExchange, which is NOT the probe
    # side's shuffle — no ReusedExchange fires and the tokenize+md5
    # chunk pass would execute once per consumer (verified: 2 full scan
    # subtrees in the committed plan).
    per_chunk = df.select(
        F.col(id_col), F.explode(chunks).alias("chunk_hash")
    ).localCheckpoint(eager=False)
    # corpus-wide: in how many documents does each chunk occur?
    freq = per_chunk.groupBy("chunk_hash").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    return (
        per_chunk.join(freq, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("dup_chunks"),
        )
        .withColumn(
            "dup_frac",
            F.floor(
                F.col("dup_chunks").cast("double")
                / F.col("n_chunks").cast("double")
                * 10000
            )
            / 10000,
        )
    )


def _toks(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def _bigrams(toks: Column) -> Column:
    """Adjacent-pair strings from a token array. Single-token / empty
    docs yield an EMPTY array: without the guard, sequence(1, size-1)
    on size=1 is the DESCENDING [1, 0] and element_at(toks, 0) throws
    under ANSI mode (INVALID_ARRAY_INDEX_IN_ELEMENT_AT)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model score per document (the cheap perplexity
    proxy used for corpus quality filtering): mean log-probability of the
    document's tokens under the corpus's own unigram distribution.

    Exact-parity trick: log-probs are quantized to integer micro-nats
    (floor(ln(p)*1e6)) the moment they're computed, so every later sum /
    mean is integer arithmetic — order-independent and engine-exact.
    Two shuffles (token counts, then per-doc rollup); the vocabulary is
    a broadcast-scale side table.

    Returns (id, n_tokens, avg_logp_micronats).
    """
    tok = df.select(F.col(id_col), F.explode(_toks(text_col)).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    logp = (
        F.floor(F.log(F.col("cnt").cast("double") / F.col("total").cast("double")) * 1e6)
        .cast("bigint")
        .alias("logp_u")
    )
    scored = vocab.crossJoin(F.broadcast(total)).select("token", logp)
    return (
        tok.join(scored, "token")  # vocab-keyed: AQE decides broadcast by size
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(logp_u) div count(1)").alias("avg_logp_micronats"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k characteristic terms per document by tf×idf, with idf
    quantized to integer micro-nats so scores (tf × idf_micro) stay in
    exact integer arithmetic. Deterministic tie-break on the term.

    Returns (id, term, score) with ≤k rows per document.
    """
    tok = df.select(F.col(id_col), F.explode(_toks(text_col)).alias("term"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tok.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(
            F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")) * 1e6
        )
        .cast("bigint")
        .alias("idf_u"),
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.join(idf, "term").select(  # vocab-keyed: AQE decides
        F.col(id_col), "term", (F.col("tf") * F.col("idf_u")).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def bigram_pmi(
    df: DataFrame, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent token
    pairs, PMI = ln(c_xy · T_uni² / (c_x · c_y · T_big)), reported in
    integer micro-nats. Only bigrams with corpus count ≥ min_count.

    All counts are exact integers; the single ln runs on identical
    IEEE-double operands in any engine. Three linear shuffles (bigram
    counts, unigram counts, final join) — the unigram table broadcasts.

    Returns (bigram, n, pmi_micronats).
    """
    toks = _toks(text_col)
    big = df.select(F.explode(_bigrams(toks)).alias("bigram"))
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    bc = bc.filter(F.col("n") >= min_count)
    uni = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # both totals derive from doc lengths: t_uni = Σ len, t_big =
    # Σ (len-1) — one extra scan of the text column instead of two
    # global re-aggregations of the exploded frames
    totals = df.select(F.size(toks).alias("_len")).agg(
        F.sum("_len").alias("t_uni"),
        F.sum(F.greatest(F.col("_len") - 1, F.lit(0))).alias("t_big"),
    )
    parts = F.split(F.col("bigram"), " ")
    ux = uni.select(F.col("token").alias("tok_x"), F.col("cnt").alias("c_x"))
    uy = uni.select(F.col("token").alias("tok_y"), F.col("cnt").alias("c_y"))
    joined = (
        bc.withColumn("tok_x", parts.getItem(0))
        .withColumn("tok_y", parts.getItem(1))
        .join(ux, "tok_x")  # vocab-keyed: AQE decides
        .join(uy, "tok_y")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.floor(
        F.log(
            (F.col("n") * F.col("t_uni") * F.col("t_uni")).cast("double")
            / (F.col("c_x") * F.col("c_y") * F.col("t_big")).cast("double")
        )
        * 1e6
    ).cast("bigint")
    return joined.select("bigram", "n", pmi.alias("pmi_micronats"))


def bm25_rank(
    df: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set (the standard
    lexical-retrieval scorer; Robertson & Walker's Okapi weighting with
    the Lucene +1 idf floor so scores stay positive).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).

    Exact-parity shape: idf is quantized to integer micro-nats the moment
    it's computed; the per-(doc,term) contribution is one double
    expression evaluated in a fixed operand order and floor-quantized to
    a BIGINT before the per-doc sum — so the final aggregation is pure
    integer addition, order-independent across engines.

    Scale shape: the term filter lands on the exploded token stream
    (posting lists, not corpus size); doc lengths ride along from a
    single corpus pass; `avgdl` and the per-term df are one-row /
    |terms|-row broadcast sides. Returns top_n docs by score.
    """
    tok = df.select(F.col(id_col), F.explode(_toks(text_col)).alias("term"))
    dl = df.select(F.col(id_col), F.size(_toks(text_col)).cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    hits = tok.filter(F.col("term").isin(*terms))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(corpus)).select(
        "term",
        F.floor(
            F.log(
                (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
                + F.lit(1.0)
            )
            * 1e6
        )
        .cast("bigint")
        .alias("idf_u"),
        F.col("sum_dl"),
        F.col("n_docs"),
    )
    # contribution in doubles, identical operand order in the SQL oracle,
    # then floor → BIGINT so the per-doc sum is integer arithmetic
    contrib = F.floor(
        F.col("idf_u").cast("double")
        * (F.col("tf").cast("double") * F.lit(float(k1) + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - float(b))
                + F.lit(float(b))
                * F.col("dl").cast("double")
                / (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"))
            )
        )
    ).cast("bigint")
    scored = (
        tf.join(idf, "term")  # vocab-keyed: AQE decides
        .join(dl, id_col)
        .select(F.col(id_col), contrib.alias("contrib"))
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("bm25_u"))
    )
    # Global TopK as orderBy().limit() — compiles to the distributed
    # TakeOrderedAndProject (per-partition heaps, driver merge of top_n
    # rows), then the rank window runs over the ≤top_n-row frame. The
    # previous row_number-then-filter shape put an UNPARTITIONED window
    # over the corpus-proportional scored frame — one task holds every
    # scored doc at 100× (caught by plan_audit's global-window rule).
    topk = scored.orderBy(F.desc("bm25_u"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("bm25_u"), F.asc(id_col))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(id_col, "rank", "bm25_u")
    )


def rag_chunks(
    df: DataFrame,
    chunk_tokens: int = 16,
    stride: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the RAG /
    context-window preprocessing step): chunk i covers tokens
    [i·stride, i·stride + chunk_tokens); the last chunk is the first one
    whose window reaches the document end (no degenerate tail windows).

    Map-only: tokenize once, `posexplode` a per-doc chunk-index sequence,
    re-materialize each chunk with slice + array_join — no shuffle, no
    UDF, output rows ∝ tokens/stride. Returns (doc_id, chunk_id,
    n_chunk_tokens, start_token, chunk_text).
    """
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("n") - F.lit(chunk_tokens), F.lit(0)).cast("double")
        / F.lit(float(stride))
    ).cast("int")
    chunked = toks.select(
        F.col(id_col),
        "toks",
        "n",
        F.posexplode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id", "_i"),
    )
    start = F.col("chunk_id") * F.lit(stride)
    piece = F.slice(F.col("toks"), start + 1, F.lit(chunk_tokens))
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        start.cast("bigint").alias("start_token"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear quality-classifier inference as pure column algebra — the
    fasttext-style keep/drop filter every pretraining corpus applies,
    expressed so a 100 TB scoring pass is one map-only scan (no UDF, no
    model server; weights are constants folded into codegen).

    Features are floor-quantized to integer basis points the moment
    they're computed, so the logit is exact integer arithmetic:
      logit_u = 2·mean_tok_len_u + 10·stopword_ratio_u + 12·alpha_ratio_u
                − 40·punct_count + 2·min(n_tokens, 400) + bias
    Returns (id, logit_u, keep). Weights are illustrative (a real model
    drops in by swapping constants — the plan shape is the point).
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    stop_hits = _marker_hits(toks, LANG_MARKERS["en"])
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[\.,;:!\?]", ""))
    alpha = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z]", ""))
    mtl_u = F.floor(sum_len.cast("double") / n_tokens.cast("double") * 1e4)
    stop_u = F.floor(stop_hits.cast("double") / n_tokens.cast("double") * 1e4)
    alpha_u = F.floor(alpha.cast("double") / n_chars.cast("double") * 1e4)
    logit_u = (
        F.lit(2) * mtl_u
        + F.lit(10) * stop_u
        + F.lit(12) * alpha_u
        - F.lit(40) * punct.cast("bigint")
        + F.lit(2) * F.least(n_tokens.cast("bigint"), F.lit(400))
        - F.lit(70000)
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        logit_u.alias("logit_u"),
        (logit_u >= 0).alias("keep"),
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 15,
) -> DataFrame:
    """The APPLY step of the C4/CCNet boilerplate pass: rebuild each
    document keeping only the chunks that occur in NO other document
    (corpus document-frequency 1); shared chunks — headers, footers,
    licence blocks — are stripped. `chunk_dedup` measures, this cleans.

    Same two linear shuffles as the measurement pass (chunk-hash counts,
    per-doc rollup); reassembly keeps original chunk order via a
    position-sorted struct collect. Returns (id, clean_text, kept_chunks,
    dropped_chunks).
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunk_txt = lambda i: F.array_join(  # noqa: E731
        F.slice(toks, i * chunk_words + 1, chunk_words), " "
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(i.alias("pos"), chunk_txt(i).alias("txt")),
    )
    # Checkpointed for the same reason as chunk_dedup's per_chunk: the
    # freq aggregate broadcasts into the join, so without the cut the
    # chunking pass runs once per consumer.
    per_chunk = df.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.pos").alias("pos"),
        F.col("c.txt").alias("txt"),
        F.md5(F.col("c.txt")).alias("chunk_hash"),
    ).localCheckpoint(eager=False)
    freq = per_chunk.groupBy("chunk_hash").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    marked = per_chunk.join(freq, "chunk_hash")
    return (
        marked.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("n_docs") == 1, F.struct("pos", "txt"))
                )
            ).alias("kept"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("kept_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("dropped_chunks"),
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(F.col("kept"), lambda s: s["txt"]), " "
            ).alias("clean_text"),
            "kept_chunks",
            "dropped_chunks",
        )
    )


def bigram_interp_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Interpolated-bigram language-model score per document — the
    stronger fluency/perplexity proxy one notch up from
    `unigram_logprob` (a document of real-but-shuffled words fools a
    unigram LM; it cannot fool this one, because shuffling destroys the
    bigram mass):

        p(w2 | w1) = 0.75 * c(w1 w2) / ctx(w1)  +  0.25 * c(w2) / T

    (Jelinek–Mercer interpolation with a fixed lambda; ctx(w1) = count
    of bigrams starting with w1, T = corpus token count.) The mixture
    is assembled as ONE exact integer ratio before the single ln:

        p = (3*c_b*T + c_u*ctx) / (4*ctx*T)

    so both engines hand the same two integers to the log and the
    floor(ln * 1e6) micro-nat quantization sees identical operands —
    the only cross-engine exposure is the one libm ln, same as every
    other quantized-log entry here. Interpolation also makes p > 0 for
    unseen-context bigrams without add-k smoothing's count distortion.

    Plan: three token-stream aggregates (bigram counts, context counts
    folded FROM the bigram counts — no second explode, unigram counts),
    a hash join of the per-bigram score table back onto the exploded
    doc-bigram stream (bigram vocabulary is Heaps-law-small but NOT
    broadcast-assumed), then the per-doc integer rollup.

    Returns (id, n_bigrams, avg_logp_micronats); docs with fewer than
    two tokens have no bigrams and are absent by construction.
    """
    toks = _toks(text_col)
    doc_big = df.select(F.col(id_col), F.explode(_bigrams(toks)).alias("bigram"))
    bc = doc_big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_b"))
    parts = F.split(F.col("bigram"), " ")
    # the vocab frame feeds two consumers (ctx fold + score join);
    # without a lineage cut each re-derives the explode+count pipeline
    bc = (
        bc.withColumn("tok_x", parts.getItem(0))
        .withColumn("tok_y", parts.getItem(1))
        .localCheckpoint(eager=False)
    )
    ctx = bc.groupBy("tok_x").agg(F.sum("c_b").alias("ctx"))
    uni = (
        df.select(F.explode(toks).alias("tok_y"))
        .groupBy("tok_y")
        .agg(F.count(F.lit(1)).alias("c_u"))
    )
    totals = df.select(F.size(toks).alias("_len")).agg(
        F.sum("_len").cast("long").alias("t_uni")
    )
    scored = (
        bc.join(ctx, "tok_x")  # vocab-keyed: AQE decides
        .join(uni, "tok_y")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            F.floor(
                F.log(
                    (3 * F.col("c_b") * F.col("t_uni")
                     + F.col("c_u") * F.col("ctx")).cast("double")
                    / (4 * F.col("ctx") * F.col("t_uni")).cast("double")
                )
                * 1e6
            )
            .cast("bigint")
            .alias("logp_u"),
        )
    )
    return (
        doc_big.join(scored, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(logp_u) div count(1)").alias("avg_logp_micronats"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """MOSS winnowing (Schleimer et al., SIGMOD 2003): select a sparse,
    position-aware fingerprint set per document with the COVERAGE
    GUARANTEE fixed-stride chunking (chunk_dedup) lacks — any token run
    shared between two documents of length >= w + k - 1 shares at least
    one selected fingerprint, regardless of alignment. The
    exact-substring-overlap detector for plagiarism / license text /
    cross-doc boilerplate, one notch stronger than bag-of-chunks.

    Per document: k-token shingles -> 40-bit md5 hash each -> over every
    FULL window of w consecutive shingles keep the minimum of the
    composite (hash * 100000 + position) -> distinct. The composite
    makes every window's argmin unique (position breaks hash ties), so
    selection is deterministic and engine-portable in pure integer
    arithmetic; positions must fit 100000 (guaranteed for fixture-scale
    docs; shard longer texts upstream).

    Plan shape: one explode + one doc-partitioned running-min window +
    distinct — shuffles key on the document id, no cross-doc work until
    the caller joins fingerprints, which is a hash join on fp_hash with
    candidates proportional to TRUE overlap (never docs^2).

    Returns (id, n_grams, fp_hash, fp_pos), distinct per document.
    """
    from debezium_server_spark.functions.text_functions import token_shingles

    toks = tokens(F.col(text_col))
    grams = token_shingles(toks, k)
    g = df.select(
        F.col(id_col),
        F.size(grams).alias("n_grams"),
        F.posexplode(grams).alias("pos", "gram"),
    )
    h40 = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    g = g.withColumn(
        "comp", h40 * F.lit(100000).cast("long") + F.col("pos")
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        g.withColumn("fp", F.min("comp").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - w)  # full windows only
        .select(
            F.col(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.expr("fp DIV 100000").alias("fp_hash"),
            (F.col("fp") % 100000).cast("int").alias("fp_pos"),
        )
        .distinct()
    )


def nb_lang_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """TRAINED multinomial Naive Bayes language classifier — training
    AND inference as one relational pipeline (the in-engine complement
    to quality_classifier's fixed-weight inference): per-(label, token)
    counts with add-one smoothing become integer log-likelihoods
    floor(ln((c+1)/(T_label+V))·1e6), priors floor(ln(n_label/N)·1e6),
    and each document scores every label as
        prior + Σ_seen ll(label, tok) + (n_tokens − n_covered)·unseen
    — the unseen-token closed form avoids materializing the full
    doc×vocab×label grid: only (doc, token)×(labels that saw the
    token) rows exist, ≤ |labels|·|token occurrences|.

    Integer arithmetic after the one floor-quantized ln, so scores sum
    order-independently and the argmax (tie → label asc) is
    engine-exact. The label set is collected once (a handful of rows,
    the IVF-centroid pattern) and becomes a literal explode — the
    doc×label grid needs no join, keeping the plan free of
    nested-loop shapes.

    Returns (id, actual, predicted, score_u, correct) per document.

    Scale: training is two hash aggregations over token rows; scoring
    is one equi-join on token plus a per-doc argmax window — every
    shuffle keys on token, label, or doc. A 100 TB corpus trains and
    scores in three passes with no driver-side model but the label
    list.
    """
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    docs = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("actual"),
        toks.alias("__toks"),
    )
    # LAZY checkpoints throughout (r08 optimization): the token frames
    # and the count model each feed several consumers, but an EAGER cut
    # is a serial driver-side barrier per frame — 4 barriers plus the
    # two scalar count() actions made one classifier evaluation ~6
    # serial jobs before the real query started. eager=False keeps the
    # plan-dedup (each subtree appears once, materialized on first use
    # inside the SINGLE final action) and drops every barrier.
    t = docs.select(
        "id", F.explode("__toks").alias("tok")
    ).localCheckpoint(eager=False)  # token occurrences feed train AND score

    # `train_df` splits training from scoring (holdout evaluation);
    # default trains on the scored frame itself
    if train_df is None:
        tr, t_train = df, t
    else:
        tr = train_df
        t_train = tr.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        ).localCheckpoint(eager=False)
    tl = t_train.join(
        tr.select(F.col(id_col).alias("id"),
                  F.col(label_col).alias("lang")),
        "id",
    )
    # the count model feeds BOTH the per-label totals and the
    # log-likelihood table — materialize it once
    cnt = (
        tl.groupBy("lang", "tok").agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t_lang"))
    # vocab size and doc count ride the plan as broadcast 1-row frames
    # (the oracle's CROSS JOIN vv / nn shape) instead of driver-side
    # count() actions — two fewer serial passes over the token frame,
    # identical arithmetic (count DISTINCT ≡ the old distinct().count()
    # here: the tokenizer emits no NULL tokens)
    vv = t_train.agg(F.count_distinct(F.col("tok")).alias("v"))
    nn = tr.agg(F.count(F.lit(1)).alias("n_docs"))
    pri = tr.groupBy(F.col(label_col).alias("lang")).agg(
        F.count("*").alias("n_l"))
    lang_stats = (
        pri.join(tot, "lang")
        .crossJoin(F.broadcast(vv))
        .crossJoin(F.broadcast(nn))
        .select(
            "lang",
            F.floor(F.log(F.col("n_l").cast("double")
                          / F.col("n_docs").cast("double"))
                    * 1e6).cast("long").alias("prior_u"),
            F.floor(F.log(F.lit(1.0)
                          / (F.col("t_lang") + F.col("v")).cast("double"))
                    * 1e6).cast("long").alias("unseen_u"),
            "t_lang",
            "v",
        )
    ).localCheckpoint(eager=False)  # |labels| rows, read by ll AND scoring
    ll = (
        cnt.join(F.broadcast(lang_stats.select("lang", "t_lang", "v")),
                 "lang")
        .select(
            "lang", "tok",
            F.floor(F.log((F.col("c") + 1).cast("double")
                          / (F.col("t_lang") + F.col("v")).cast("double"))
                    * 1e6).cast("long").alias("ll_u"),
        )
    )
    cov = (
        t.join(ll, "tok")
        .groupBy("id", "lang")
        .agg(F.sum("ll_u").alias("sum_ll"), F.count("*").alias("n_cov"))
    )
    labels = sorted(r["lang"] for r in pri.select("lang").collect())
    grid = docs.select(
        "id", "actual", F.size("__toks").cast("long").alias("n_tokens"),
        F.explode(F.array(*[F.lit(x) for x in labels])).alias("lang"),
    )
    scored = (
        grid.join(cov, ["id", "lang"], "left")
        .join(F.broadcast(lang_stats.select("lang", "prior_u", "unseen_u")),
              "lang")
        .select(
            "id", "actual", "lang",
            (F.col("prior_u")
             + F.coalesce(F.col("sum_ll"), F.lit(0))
             + (F.col("n_tokens") - F.coalesce(F.col("n_cov"), F.lit(0)))
             * F.col("unseen_u")).cast("long").alias("score_u"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score_u"), F.asc("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        # margin over the runner-up label: the integer CONFIDENCE the
        # calibration audit buckets on (lead reads rn=2 from the same
        # sorted window — no second pass)
        .withColumn("margin_u",
                    (F.col("score_u") - F.lead("score_u").over(w))
                    .cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias(id_col), "actual",
            F.col("lang").alias("predicted"), "score_u", "margin_u",
            (F.col("lang") == F.col("actual")).alias("correct"),
        )
    )
