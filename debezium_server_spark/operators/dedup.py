"""Deduplication operators for large-scale document pipelines.

Four families, each designed for 100 TB (no O(n²) anywhere — candidate
generation is always a hash/band bucket join):

- exact:     md5-hash groupBy, keep the smallest id per content hash.
- MinHash+LSH: shingle → K minhashes → B bands → bucket self-join →
               candidate pairs (optionally verified with exact Jaccard).
- n-gram Jaccard: exact Jaccard on cheaply-blocked candidates.
- SimHash:   16-bit signatures; near-dup = equal signature (or small
             hamming distance within a block).

All pure DataFrame algebra (see functions/text_functions.py) — every
operator has a DuckDB-oracle SQL twin in plans/oracles.py.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.functions.text_functions import token_shingles, tokens, round4

# Universal-hash family for minhash: h_j = (a_j·x + b_j) mod p, p = 2^31−1.
MINHASH_P = 2147483647


def _mh_a(j: int) -> int:
    return (1103515245 * (j + 1)) % MINHASH_P


def _mh_b(j: int) -> int:
    return (12345 * (j + 1)) % MINHASH_P


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one surviving (minimum) id per distinct content hash.

    Scale: a single hash-aggregate with map-side partial min — the
    canonical 100 TB dedup shape. Output: (content_hash, keep_id, n_dups).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _sig_from_base(
    base_df: DataFrame, id_col: str, num_hashes: int, base_expr: str
) -> DataFrame:
    """Shared affine-family + min-aggregate tail of minhash_signatures:
    `base_expr` (a SQL string over base_df's columns) must evaluate to
    the md5-derived base int already reduced mod MINHASH_P."""
    hashed = base_df.selectExpr(
        f"`{id_col}`", f"{base_expr} AS __b"
    ).selectExpr(
        f"`{id_col}`",
        *[f"({_mh_a(j)} * __b + {_mh_b(j)}) % {MINHASH_P} AS __h{j}"
          for j in range(num_hashes)],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"__h{j}").alias(f"__m{j}") for j in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 12,
    hashed_base: DataFrame | None = None,
    base_col: str = "tok",
) -> DataFrame:
    """Raw MinHash signatures: (id, __m0..__m{K-1}), __mj = min over the
    doc's distinct shingles of the j-th universal hash. One md5 per
    shingle, K affine hashes per row, map-side-combinable min aggregate
    — the shared signature stage under `minhash_bands` (banded LSH) and
    the sketch-error audit (per-pair signature agreement).

    `hashed_base`, when given, replaces the tokenize+md5 stage with a
    pre-built (id, base) shingle frame whose `base_col` is the shared
    60-bit md5 base — conv(substring(md5(shingle),1,15),16,10) cast to
    long, the exact value the ngram/PPJoin family explodes. Signatures
    are bit-identical: __b = base % p commutes with the cast, and a
    min over a multiset is unchanged by dropping or keeping duplicate
    elements, so string-level vs hash-level distinct cannot move __mj.
    This is how entries that already materialize the hashed-shingle
    frame for an exact-Jaccard side reuse it for the sketch side
    instead of re-tokenizing the corpus (guide §1.2: don't compute
    the same pass twice)."""
    if hashed_base is not None:
        return _sig_from_base(
            hashed_base, id_col, num_hashes, f"`{base_col}` % {MINHASH_P}"
        )
    exploded = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(token_shingles(tokens(F.col(text_col)), shingle_k))
        ).alias("__sh"),
    )
    # SQL strings instead of per-hash Column trees: the K-wide affine
    # family cost ~100 py4j round-trips PER CONSTRUCTION on the driver
    # (the corpus sink builds this several times per epoch) — two
    # selectExpr calls parse everything JVM-side. CollapseProject
    # inlines __b into each hash, so the physical plan (and therefore
    # every value) is identical to the old single-projection form.
    return _sig_from_base(
        exploded, id_col, num_hashes,
        f"CAST(conv(substring(md5(__sh), 1, 15), 16, 10) AS BIGINT)"
        f" % {MINHASH_P}",
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    sig_df: DataFrame | None = None,
    hashed_base: DataFrame | None = None,
    base_col: str = "tok",
) -> DataFrame:
    """Banded MinHash signatures: (id, band_id, band_hash) rows — the
    reusable index half of LSH dedup. Same deterministic hash family as
    `minhash_lsh_pairs`, so signatures built at different times (e.g. a
    persisted corpus index vs today's increment) collide exactly when
    the band rows agree. `sig_df`, when given, is an already-built
    `minhash_signatures` frame (typically checkpointed by a caller that
    also consumes the signatures directly) and skips recomputing it;
    `hashed_base` forwards to minhash_signatures (see there)."""
    rows_per_band = num_hashes // bands
    if sig_df is None:
        sig_df = minhash_signatures(
            df, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
            num_hashes=num_hashes, hashed_base=hashed_base,
            base_col=base_col,
        )
    # one selectExpr parse instead of ~25 py4j column-builder calls;
    # expression-identical to the old F.array(F.md5(F.concat_ws(...)))
    band_sql = ", ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"__m{b * rows_per_band + r}" for r in range(rows_per_band))
        + "))"
        for b in range(bands)
    )
    return sig_df.selectExpr(
        f"`{id_col}`",
        f"posexplode(array({band_sql})) AS (band_id, band_hash)",
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Dedup an INCREMENT against an already-indexed corpus — the
    steady-state shape of corpus maintenance (re-minhashing 100 TB of
    history for every daily batch is the design that dies; the band
    index is built once and persisted, increments only hash themselves).

    `corpus_index` is a `minhash_bands` frame (persisted/checkpointed).
    A new doc is dropped when ANY of its bands collides with the index;
    survivors return with their band rows discarded. Join is a hash
    semi-join on (band_id, band_hash) — shuffle ∝ increment×bands.
    """
    inc_bands = minhash_bands(
        new_docs, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        num_hashes=num_hashes, bands=bands,
    )
    dup_ids = (
        inc_bands.join(
            corpus_index.select("band_id", "band_hash").distinct(),
            ["band_id", "band_hash"],
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return new_docs.join(dup_ids, id_col, "left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    banded: DataFrame | None = None,
    hashed_base: DataFrame | None = None,
    base_col: str = "tok",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash.

    Docs sharing ≥1 of `bands` band keys become a candidate pair. The
    self-join is on the band key — shuffle is proportional to docs×bands,
    never docs², which is what keeps this viable at 100 TB (hot buckets
    are the skew risk; AQE skew-join handles moderate skew, salting the
    band key handles the pathological case).
    """
    rows_per_band = num_hashes // bands
    # Explode shingles to rows and reduce with groupBy+min: one pass over
    # (doc, shingle), map-side partial aggregation, and no nested-array
    # re-evaluation (the array_min(transform(...)) form re-computes the
    # shingle expression per hash function — 50x slower at sf0.1).
    #
    # One md5 per shingle; the K hash functions are universal hashes
    # h_j = (a_j·base + b_j) mod p over the md5-derived base int — the
    # standard scalable minhash (hashing the shingle string K times costs
    # K·|shingle| bytes of digesting per row; the affine family costs two
    # multiplies). p = 2^31−1 keeps a_j·base < 2^62 (no 64-bit overflow),
    # and the identical closed-form constants reproduce in any engine.
    if banded is None:
        # Checkpoint the banded frame: the self-join below broadcasts
        # one side, and a broadcast build is NOT the same exchange as
        # the probe side's shuffle — no ReusedExchange fires, so
        # without the cut the whole tokenize→md5→12-affine-hash→min-agg
        # →band pipeline executes once PER JOIN SIDE (verified in the
        # committed dedup_minhash_lsh plan: two full Scan→…→Generate
        # subtrees). Lazy: the broadcast build is the first consumer
        # and materializes the ≤(docs×bands)-row frame inside its own
        # job; the probe side then reads the persisted blocks.
        banded = minhash_bands(
            df, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
            num_hashes=num_hashes, bands=bands, hashed_base=hashed_base,
            base_col=base_col,
        ).localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.2,
    block_cols: tuple[str, ...] = ("lang",),
    exploded: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard on blocked candidates.

    Candidates = pairs sharing `block_cols` (cheap blocking key); exact
    Jaccard = |A∩B| / |A∪B| over distinct k-token shingles. Blocking keeps
    the join linear-ish in block sizes; at scale the block key should be a
    band/bucket (compose with minhash_lsh_pairs for the full pipeline).

    Physical shape (oracle-safe — values unchanged): instead of joining
    whole shingle ARRAYS pairwise and intersecting per pair (quadratic in
    block size AND shuffles wide arrays), explode to (doc, shingle-hash)
    rows and self-join on the shingle: each output row is one shared
    shingle, so groupBy(pair).count() IS |A∩B|. Work is Σ_shingle df²
    (document frequency squared) — at sf0.1 that's 326k rows vs 3.2M
    array-intersects, ~10x less work, and the scan/shuffle carries longs,
    not arrays. Shingles are md5→60-bit ints (collisions hit both engines
    identically). Pairs with zero overlap never materialize — correct,
    since their Jaccard is 0 < threshold.
    """
    if exploded is None:
        # The hashed-shingle frame feeds FOUR consumers (both sides of
        # the shingle self-join and the sizes frame joined twice) on
        # two different keys — checkpoint it once so tokenize/shingle/
        # md5 runs a single time (the jaccard_prefix_join pattern).
        # Callers that already materialize this frame for another
        # pipeline (e.g. a minhash sketch side) pass it in instead.
        sh_hashed = F.array_distinct(
            F.transform(
                token_shingles(tokens(F.col(text_col)), shingle_k),
                lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            )
        )
        exploded = df.select(
            F.col(id_col), *[F.col(c) for c in block_cols],
            F.explode(sh_hashed).alias("sh"),
        ).localCheckpoint(eager=False)
    a = exploded.alias("a")
    b = exploded.alias("b")
    join_cols = ["sh", *block_cols]
    inter = (
        a.join(b, join_cols)
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = exploded.groupBy(F.col(id_col)).agg(F.count("*").alias("n_sh"))
    jac = F.col("inter").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", round4(jac).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash signature per document; docs with equal signatures
    are near-duplicates. Scale: signature is a narrow groupable int —
    dedup becomes the exact-dedup shape on `simhash`.

    Physical shape: explode tokens → one md5 per token → 16 bit-vote sums
    in a single map-side-combinable aggregation (the array-expression form
    re-hashes every token once per bit; see functions.simhash16 for the
    composable column variant)."""
    hashed = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    ).select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 4), 16, 10).cast("long").alias("__h"),
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(F.col("__h"), i).cast("int").bitwiseAND(F.lit(1)) * 2 - 1).alias(
                f"__v{i}"
            )
            for i in range(16)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(16):
        sig = sig + F.when(F.col(f"__v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Random-hyperplane signature (integer-valued deterministic planes →
    exact float math, engine-portable) buckets vectors; exact cosine runs
    only within buckets. See operators/similarity.py for the plane
    construction.
    """
    from debezium_server_spark.operators.similarity import with_hyperplane_bucket
    from debezium_server_spark.functions.text_functions import cosine_similarity

    bucketed = with_hyperplane_bucket(df, vec_col=vec_col, planes=bucket_planes)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = cosine_similarity(F.col(f"a.{vec_col}_d"), F.col(f"b.{vec_col}_d"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            round4(sim).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 1,
) -> DataFrame:
    """SimHash near-duplicate PAIRS: hamming(sig_a, sig_b) ≤ max_hamming.

    Multi-probe banding makes this a hash join, never n²: a pair within
    hamming ≤ 7 must agree exactly on at least one of the two 8-bit
    halves (pigeonhole), so candidates = (same high band) ∪ (same low
    band) — two equi-joins unioned and deduped, then the exact popcount
    filter. At 100 TB each band join shuffles narrow (band, id) rows.
    """
    sig = simhash_signatures(df, text_col, id_col)
    # One banded frame, bands exploded into rows, ONE self-join on
    # (band, band_value): both join sides are the identical plan shuffled
    # on the identical key, so Spark computes + shuffles the signatures
    # once and reuses the exchange — vs 2 band joins × 2 sides = 4
    # signature computations and 4 shuffles in the naive union form.
    hi = F.shiftright(F.col("simhash"), 8)
    lo = F.col("simhash").bitwiseAND(F.lit(255))
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), hi.alias("bv")),
                F.struct(F.lit(1).alias("band"), lo.alias("bv")),
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.bv")
    a, bb = banded.alias("a"), banded.alias("bb")
    candidates = (
        a.join(bb, ["band", "bv"])
        .filter(F.col(f"a.{id_col}") < F.col(f"bb.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"bb.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("bb.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).cast("long")
    return (
        candidates.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    rounds: int = 3,
    max_iter: int = 25,
) -> DataFrame:
    """Exact connected components over a near-dup pair graph →
    (node, component), component = smallest node id in the component.

    The one-pass "anti-join docs with a smaller-id partner" apply step is
    exact only for star-shaped clusters; chains (a~b, b~c, but a≁c) need
    the transitive closure. This is iterative min-label propagation:

        label(v) ← min(label(v), min over neighbors u of label(u))

    followed by pointer jumping (label(v) ← label(label(v)) — labels are
    always node ids, so the compression step is a self-join of the label
    frame). Neighbor propagation alone needs diameter rounds; with path
    compression the count drops to O(log n) even on adversarial chains
    (same doubling that makes large-star/small-star converge — Kiveris
    et al., "Connected Components in MapReduce"). Each round is two
    shuffle-joins + a map-side-combinable min aggregate — no driver-side
    graph; the labels frame covers only nodes touched by a pair, far
    smaller than the corpus.

    Scheduling: the first `rounds` doubling rounds are UNROLLED into one
    job with ZERO per-round driver actions — each round's frame carries
    only a lazy localCheckpoint (plan truncation + persistence when the
    single final job computes through it; an eager checkpoint would be a
    driver-blocking job barrier per round). One scalar action then reads
    the label sum, and a verification round confirms the fixpoint:
    labels only decrease, so an unchanged sum IS convergence. Graphs
    deeper than 2^rounds (near-dup clusters almost never are) fall back
    to sum-checked rounds up to `max_iter`. Common case: 2 actions
    total, independent of round count — previously 1 barrier + 1
    collect per round.

    Bounded contract (same honesty as graph.kcore): if the label sum is
    STILL decreasing after the doubling phase plus `max_iter`
    verification rounds — reachable only on pathological graphs deeper
    than 2^rounds + max_iter — the last frame is returned and a
    `RuntimeWarning` is emitted so callers see the non-fixpoint instead
    of silently consuming under-merged components.
    """
    # Materialize the edge list ONCE: `pairs` usually carries an
    # expensive lineage (the whole minhash/banding pipeline), and every
    # round joins against edges twice — without this checkpoint the
    # upstream pipeline re-executes per round (measured 10× on the
    # catalog's LSH graph).
    # LAZY checkpoints: the n_nodes count below is the first action and
    # materializes (and persists) both frames in ONE job — the eager
    # form paid two extra driver-blocking barriers for the same reuse.
    # Both edge directions come from ONE explode pass over `pairs`
    # (identical row multiset to the old select-union-select, which
    # evaluated the pairs subtree once per union branch — union is
    # UNION ALL, and explode of the 2-struct array emits exactly the
    # same two rows per pair).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=False)
    )
    # The labels frame is |nodes| rows of two longs. When that is
    # broadcast-sized, hint it on every join: each round becomes two
    # broadcast-hash joins with NO shuffle at all (checkpointed frames
    # can over-report sizeInBytes and talk AQE out of the broadcast it
    # would otherwise pick). Past ~10M nodes the hint drops away and the
    # rounds run as the usual shuffled joins.
    n_nodes = labels.count()

    def _maybe_b(df):
        return F.broadcast(df) if n_nodes < 10_000_000 else df

    def one_round(cur: DataFrame) -> DataFrame:
        prop = (
            edges.join(_maybe_b(cur), edges["u"] == cur["node"])
            .select(F.col("v").alias("node"), "component")
        )
        merged = (
            cur.union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: follow the component's own (possibly smaller) label
        lut = merged.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_label")
        )
        return (
            merged.join(_maybe_b(lut), merged["component"] == lut["c_node"], "left")
            .select(
                "node",
                F.least(F.col("component"), F.col("c_label")).alias("component"),
            )
        )

    # doubling phase: no driver actions, lineage cut lazily per round
    for _ in range(max(rounds, 1)):
        labels = one_round(labels).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    # verification (+ rare continuation for graphs deeper than 2^rounds)
    for _ in range(max_iter):
        labels_next = one_round(labels).localCheckpoint(eager=False)
        cur_sum = labels_next.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        labels, prev_sum = labels_next, cur_sum
    warnings.warn(
        f"connected_components: label sum still decreasing after "
        f"{rounds} doubling + {max_iter} verification rounds — returned "
        f"labels may be unconverged (graph deeper than 2^rounds + "
        f"max_iter); raise `rounds`/`max_iter`",
        RuntimeWarning,
        stacklevel=2,
    )
    return labels


def exact_span_matches(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_span: int = 8,
) -> DataFrame:
    """Exact duplicated token spans between document pairs — the
    ExactSubstr detector of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") re-expressed relationally
    instead of via a monolithic suffix array:

    1. candidate pairs come from MOSS winnowing fingerprints (any
       shared token run >= w + k - 1 shares a selected fingerprint at
       any alignment, so no qualifying span can miss the candidate
       screen as long as min_span >= w + k - 1);
    2. per candidate pair, join the two documents' k-gram hash tables
       on hash equality and extract maximal DIAGONAL runs (pa - pb
       constant, pa consecutive): a run of r matching k-grams is a
       shared token span of r + k - 1 tokens.

    Pure integer arithmetic end-to-end (40-bit md5 gram hashes, the
    same family winnowing uses), so an SQL oracle reproduces it
    bit-for-bit. Scale shape: the gram join is equi-keyed on
    (candidate doc, hash) and the candidate set is proportional to
    TRUE fingerprint overlap — never |docs|^2; the suffix-array
    original is a single global sort that cannot shard this way.

    Returns (da, db, start_a, start_b, span_tokens), da < db,
    spans >= min_span tokens.
    """
    if min_span < w + k - 1:
        raise ValueError(
            f"min_span={min_span} < w + k - 1 = {w + k - 1}: the winnowing "
            "candidate screen only guarantees completeness for spans of at "
            "least w + k - 1 tokens — a smaller min_span would silently "
            "return an incomplete candidate set. Lower w (the fingerprint "
            "window) or k (the gram size) instead."
        )
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    g = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_toks"),
        F.posexplode(token_shingles(toks, k)).alias("pos", "gram"),
    )
    h40 = F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long")
    # The gram table feeds THREE consumers (the fingerprint screen and
    # both sides of the match join); checkpoint it once so the
    # tokenize/explode/md5 pipeline runs a single time and downstream
    # plans read a materialized frame (the triangle_count lesson).
    grams = g.select(
        "id", (F.col("n_toks") - (k - 1)).alias("n_grams"), "pos",
        h40.alias("h"),
    ).localCheckpoint(eager=False)  # materialized inside the final action

    # Winnowing fingerprint selection (same arithmetic as
    # text.winnowing_fingerprints) inlined over the shared gram frame.
    wfp = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    comp = F.col("h") * F.lit(100000).cast("long") + F.col("pos")
    fp = (
        grams.withColumn("fp", F.min(comp).over(wfp))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select("id", F.expr("fp DIV 100000").alias("fp_hash"))
        .distinct()
    )
    cand = (
        fp.alias("a")
        .join(fp.alias("b"), "fp_hash")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("da"), F.col("b.id").alias("db"))
        .distinct()
    )

    ga = grams.select(
        F.col("id").alias("da"), F.col("pos").alias("pa"), F.col("h").alias("ha")
    )
    gb = grams.select(
        F.col("id").alias("db"), F.col("pos").alias("pb"), F.col("h").alias("hb")
    )
    m = (
        cand.join(ga, "da")
        .join(gb, ["db"])
        .filter(F.col("ha") == F.col("hb"))
        .select("da", "db", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    wisl = Window.partitionBy("da", "db", "diag").orderBy("pa")
    runs = (
        m.withColumn("isl", F.col("pa") - F.row_number().over(wisl))
        .groupBy("da", "db", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count("*") + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
    )
    return runs.filter(F.col("span_tokens") >= min_span).select(
        "da", "db",
        F.col("start_a").cast("long").alias("start_a"),
        F.col("start_b").cast("long").alias("start_b"),
        "span_tokens",
    )


def exact_span_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_span: int = 8,
) -> DataFrame:
    """Corpus-level duplicate-span removal audit (the second half of
    Lee et al.'s ExactSubstr dedup): keep the EARLIEST document's copy
    of every duplicated span and mark the later document's range for
    removal. For each doc: take every [start_b, start_b + span) token
    interval it owes to a lower-id partner (from exact_span_matches),
    union overlapping-or-touching intervals via a sweep (running max
    of interval end over the preceding rows; a new removal range
    starts strictly past it), and report per-doc
    (n_spans, tokens_removed, n_tokens, tokens_kept) over the WHOLE
    corpus — untouched documents report zero removal.

    The sweep is one doc-partitioned window over the (sparse) span
    table; no per-pair state survives, so the audit scales with the
    number of detected spans, not documents^2.
    """
    from pyspark.sql.window import Window

    spans = exact_span_matches(df, text_col, id_col, k=k, w=w, min_span=min_span)
    iv = spans.select(
        F.col("db").alias("id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_tokens")).alias("e"),
    )
    wprev = (
        Window.partitionBy("id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = Window.partitionBy("id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev_end = F.max("e").over(wprev)
    new_grp = F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0)
    merged = (
        iv.withColumn("grp", F.sum(new_grp).over(wrun))
        .groupBy("id", "grp")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.col("me") - F.col("ms")).cast("long").alias("tokens_removed"),
        )
    )
    docs = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return (
        docs.join(merged, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("tokens_removed", F.lit(0)).cast("long")
            .alias("tokens_removed"),
            "n_tokens",
            (F.col("n_tokens")
             - F.coalesce("tokens_removed", F.lit(0))).cast("long")
            .alias("tokens_kept"),
        )
    )


def jaccard_prefix_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_num: int = 1,
    tau_den: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard-threshold self-join via PREFIX FILTERING (the
    PPJoin family, Xiao et al. WWW'08) — the provably COMPLETE
    candidate scheme, where MinHash LSH is only probabilistically
    complete: order each document's distinct-SHINGLE set (k-token
    shingles; shingle_k=1 degenerates to token sets) by global rarity
    (document frequency asc, shingle asc), keep the first
    |d| - ceil(tau·|d|) + 1 shingles as its prefix, and any pair with
    J >= tau MUST share a prefix shingle. Candidates then pass the
    size filter (tau·|a| <= |b|) and are verified with an exact
    intersection count; the threshold test is pure integers
    (J >= n/d  <=>  d·inter >= n·union), so no float ever appears.
    Shingles, not raw tokens, are the similarity unit: small-vocabulary
    corpora make token SETS of unrelated documents collide wholesale
    (73k token-set pairs >= 0.6 in the 500-doc fixture vs 28 true
    shingle-set near-dups).

    Returns (da, db, inter, union_sz, jacc_u) for verified pairs,
    jacc_u = floor(inter·1e4 / union), da < db.

    Scale shape: prefixes shrink candidate fan-out toward truly
    similar pairs (rare tokens first), every join is equi-keyed
    (token, then pair), and the exact verify enumerates shared tokens
    (Σ_tok df·(df-1)/2 rows — the inverted-index verify, the same
    quadratic exposure the prefix self-join already carries) rather
    than fanning every candidate pair out by its full token list.
    The all-pairs brute force this replaces is the
    whitelisted-exception shape.
    """
    from pyspark.sql.window import Window

    units = (
        tokens(F.col(text_col)) if shingle_k == 1
        else token_shingles(tokens(F.col(text_col)), shingle_k)
    )
    # The shingle-row table feeds FOUR consumers (sizes, docfreq,
    # prefix ordering, both sides of the exact verify) — checkpoint it
    # once so tokenize/shingle/explode runs a single time. Shingles are
    # md5→60-bit ints, not strings: every downstream shuffle/sort/join
    # carries one long instead of a ~30-byte string (3x wall-clock at
    # sf0.1); hash collisions hit both engines identically (the
    # ngram_jaccard convention).
    t = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(units)).alias("__s"),
    ).select(
        "id",
        F.conv(F.substring(F.md5("__s"), 1, 15), 16, 10).cast("long")
        .alias("tok"),
    ).localCheckpoint(eager=False)  # materialized inside the final action
    sz = t.groupBy("id").agg(F.count("*").alias("len"))
    dfreq = t.groupBy("tok").agg(F.count("*").alias("df"))
    # ceil(tau*len) in exact integer arithmetic: (n*len + d - 1) div d
    p_len = (
        F.col("len")
        - F.expr(f"({tau_num} * len + {tau_den} - 1) div {tau_den}")
        + F.lit(1)
    )
    ordered = (
        t.join(dfreq, "tok")
        .join(sz, "id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "tok")),
        )
    )
    # Both sides of the candidate self-join read the prefix table. A
    # LAZY checkpoint (eager=False): the plan truncates (the prefix
    # pipeline appears once, not once per join side), but there is no
    # up-front job barrier — materialization happens inside the first
    # action and is shared (an eager checkpoint here cost 1.6 s of
    # barrier at sf0.1: 5.95 s vs 4.36 s total).
    prefix = (
        ordered.filter(F.col("rn") <= p_len)
        .select("id", "tok", "len", "rn")
        .localCheckpoint(eager=False)
    )
    # Candidate aggregation with the PPJoin+ POSITIONAL upper bound
    # (Xiao et al. WWW'08 §4): rn is each document's rank under the
    # GLOBAL total order (df asc, tok asc) — ties on df are broken by
    # tok, so the order is total and identical for every document. For
    # a token t shared by docs a, b at positions (i, j): common tokens
    # ≤ t lie within a's first i and b's first j tokens (both sides
    # list tokens in the global order), so there are at most
    # min(i, j) of them (t included); common tokens > t lie in the
    # la - i / lb - j suffixes, so at most min(la-i, lb-j). Hence
    # inter ≤ min(i, j) + min(la-i, lb-j) for EVERY shared prefix
    # token, and the min over the pair's shared prefix tokens is a
    # valid overlap upper bound. The verify keeps a pair iff
    # d·inter ≥ n·(la+lb-inter) ⟺ (d+n)·inter ≥ n·(la+lb); since
    # inter ≤ ubound, a pair with (d+n)·ubound < n·(la+lb) can never
    # verify — dropping it before the exact-intersection join is
    # COMPLETE (pure integers, no float). Pinned against brute force
    # by test_jaccard_prefix_join_complete_vs_bruteforce.
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .filter(F.col("a.id") < F.col("b.id"))
        # size filter: tau*max_len <= min_len is necessary for J >= tau
        .filter(
            F.lit(tau_num) * F.greatest(F.col("a.len"), F.col("b.len"))
            <= F.lit(tau_den) * F.least(F.col("a.len"), F.col("b.len"))
        )
        .select(F.col("a.id").alias("da"), F.col("b.id").alias("db"),
                F.col("a.len").alias("la"), F.col("b.len").alias("lb"),
                (F.least(F.col("a.rn"), F.col("b.rn"))
                 + F.least(F.col("a.len") - F.col("a.rn"),
                           F.col("b.len") - F.col("b.rn"))).alias("ub1"))
        .groupBy("da", "db", "la", "lb")
        .agg(F.min("ub1").alias("ubound"))
        .filter(
            F.lit(tau_den + tau_num) * F.col("ubound")
            >= F.lit(tau_num) * (F.col("la") + F.col("lb"))
        )
        .drop("ubound")
    )
    # Exact verify by SHARED-TOKEN enumeration instead of per-candidate
    # token fanout: the old shape joined every candidate pair with BOTH
    # full token lists (sum(la) over candidates ≈ 21M rows at sf0.1,
    # through two hash joins + a 4-key aggregate); enumerating shared
    # tokens via the t⋈t self-join costs Σ_tok df·(df-1)/2 rows
    # (≈ 1.27M at sf0.1 — 16× fewer) and one (da,db) aggregate.
    # Value-identical: for any pair, |{tok shared}| is the same count
    # either way, and every candidate shares ≥1 (prefix) token, so the
    # inner join to `cand` drops nothing a candidate needed. Hot-token
    # exposure (Σ df²) is the same quadratic the prefix self-join
    # above already has — and that one runs on the rarest tokens'
    # prefixes, which bounds this one too for any corpus where the
    # threshold keeps prefixes rare-first.
    shared = (
        t.alias("x")
        .join(t.alias("y"), "tok")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("da"), F.col("y.id").alias("db"))
    )
    inter = (
        shared.groupBy("da", "db").agg(F.count("*").alias("inter"))
        .join(cand, ["da", "db"])
        .select("da", "db", "la", "lb", "inter")
    )
    u = F.col("la") + F.col("lb") - F.col("inter")
    return (
        inter.withColumn("union_sz", u.cast("long"))
        .filter(F.lit(tau_den) * F.col("inter") >= F.lit(tau_num) * u)
        .select(
            "da", "db",
            F.col("inter").cast("long").alias("inter"),
            "union_sz",
            F.expr("(inter * 10000) div union_sz").cast("long")
            .alias("jacc_u"),
        )
    )


def intra_doc_repeat_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_span: int = 8,
) -> DataFrame:
    """Exact repeated token spans WITHIN a single document — the
    repeated-paragraph / copy-loop artifact screen for generated or
    template text (the intra-document half of ExactSubstr, which
    repetition_signals' ratio heuristics cannot localize): the
    document's k-gram hash table self-joins on hash with pa > pb, and
    maximal diagonal runs (pa - pb constant, consecutive pa) are spans
    occurring at BOTH positions. Returns (id, start_a, start_b,
    span_tokens) with start_a > start_b, spans >= min_span.

    Bound: pair count per doc is sum over gram values of freq^2 —
    proportional to actual repetition, not doc length^2; shard
    pathological docs upstream (the winnowing caveat).
    """
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    g = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(token_shingles(toks, k)).alias("pos", "gram"),
    )
    h40 = F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long")
    grams = g.select("id", "pos", h40.alias("h")).localCheckpoint(
        eager=False)
    ga = grams.select("id", F.col("pos").alias("pa"), F.col("h").alias("ha"))
    gb = grams.select(
        F.col("id").alias("idb"), F.col("pos").alias("pb"),
        F.col("h").alias("hb"))
    m = (
        ga.join(gb, (F.col("id") == F.col("idb"))
                & (F.col("ha") == F.col("hb"))
                & (F.col("pa") > F.col("pb")))
        .select("id", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    wisl = Window.partitionBy("id", "diag").orderBy("pa")
    runs = (
        m.withColumn("isl", F.col("pa") - F.row_number().over(wisl))
        .groupBy("id", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count("*") + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
    )
    return runs.filter(F.col("span_tokens") >= min_span).select(
        F.col("id").alias(id_col),
        F.col("start_a").cast("long").alias("start_a"),
        F.col("start_b").cast("long").alias("start_b"),
        "span_tokens",
    )


def containment_prefix_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_num: int = 4,
    tau_den: int = 5,
    shingle_k: int = 3,
    partition_col: str | None = None,
) -> DataFrame:
    """Exact containment-threshold join via prefix filtering — the
    ASYMMETRIC sibling of `jaccard_prefix_join` for quote / excerpt /
    sub-document detection:

        c(a → b) = |Sa ∩ Sb| / |Sa| >= tau     (a's shingles inside b)

    Jaccard misses exactly this case: a 50-token quote inside a
    5000-token article has J ~ 0.01 but containment 1.0. Candidate
    completeness is one-sided pigeonhole: order a's distinct shingles
    by global rarity (df asc, shingle asc) and keep the first
    |Sa| - ceil(tau*|Sa|) + 1 as a's prefix; if c(a->b) >= tau then at
    least one of a's prefix shingles is in Sb (fewer than
    ceil(tau*|Sa|) of a's shingles can be missing from b), so joining
    a-prefixes against b's FULL shingle table cannot drop a qualifying
    pair. The threshold test is pure integers (den*inter >= num*|Sa|).

    `partition_col` (e.g. lang) confines pairs to equal values —
    riding the candidate equi-join key, not a post-filter.

    Returns (da, db, la, inter, containment_bp), da != db — asymmetric:
    (a contained-in b) and (b contained-in a) are distinct findings.

    Scale shape mirrors PPJoin: one tokenize scan (checkpointed once
    for its four consumers), candidates ∝ prefix-token collisions
    (rarest-first ordering keeps fan-out near true matches), every
    join equi-keyed on (token[, partition]) then (pair) — never
    |docs|^2; the b side carries no prefix because containment has no
    lower bound on |Sb|.
    """
    from pyspark.sql.window import Window

    units = (
        tokens(F.col(text_col)) if shingle_k == 1
        else token_shingles(tokens(F.col(text_col)), shingle_k)
    )
    part = [partition_col] if partition_col else []
    t = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in part],
        F.explode(F.array_distinct(units)).alias("__s"),
    ).select(
        "id", *part,
        F.conv(F.substring(F.md5("__s"), 1, 15), 16, 10).cast("long")
        .alias("tok"),
    ).localCheckpoint(eager=False)
    sz = t.groupBy("id").agg(F.count("*").alias("len"))
    dfreq = t.groupBy("tok").agg(F.count("*").alias("df"))
    # prefix length |Sa| - ceil(tau*|Sa|) + 1, ceil in exact integers
    p_len = (
        F.col("len")
        - F.expr(f"({tau_num} * len + {tau_den} - 1) div {tau_den}")
        + F.lit(1)
    )
    prefix = (
        t.join(dfreq, "tok")
        .join(sz, "id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "tok")),
        )
        .filter(F.col("rn") <= p_len)
        .select("id", *part, "tok", "len")
        .localCheckpoint(eager=False)
    )
    full_b = t.select(
        F.col("id").alias("db"),
        *[F.col(c).alias(f"__pb_{c}") for c in part],
        "tok",
    )
    join_cond = [F.col("a.tok") == full_b["tok"]]
    for c in part:
        join_cond.append(F.col(f"a.{c}") == full_b[f"__pb_{c}"])
    cand = (
        prefix.alias("a")
        .join(full_b, join_cond[0] if len(join_cond) == 1
              else join_cond[0] & join_cond[1])
        .filter(F.col("a.id") != F.col("db"))
        .select(F.col("a.id").alias("da"), "db", F.col("a.len").alias("la"))
        .distinct()
    )
    # Verify stays the per-candidate token fanout. The shared-token
    # enumeration that won 2.2× in jaccard_prefix_join was measured
    # HERE and rejected: containment's rarest-40% prefixes yield few
    # candidates, so Σ_cand(la) is small, while the t⋈t enumeration
    # pays the global Σ_tok df·(df-1)/2 (plus a both-orientations
    # explode for the asymmetric pair) regardless of candidate count —
    # paired fresh-session A/B at sf0.1: 3.00/3.33 s (this shape) vs
    # 4.07/4.30 s (enumeration).
    ta = t.select(F.col("id").alias("da"), "tok")
    tb = t.select(F.col("id").alias("db"), F.col("tok").alias("tok_b"))
    inter = (
        cand.join(ta, "da")
        .join(tb, ["db"])
        .filter(F.col("tok") == F.col("tok_b"))
        .groupBy("da", "db", "la")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.filter(
            F.lit(tau_den) * F.col("inter") >= F.lit(tau_num) * F.col("la"))
        .select(
            "da", "db", F.col("la").cast("long").alias("la"),
            F.col("inter").cast("long").alias("inter"),
            F.expr("(inter * 10000) div la").cast("long")
            .alias("containment_bp"),
        )
    )
