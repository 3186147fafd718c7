"""Similarity search over embedding columns (`array<float>`).

Two paths:
- `cosine_topk`: brute-force exact top-k — the baseline. Query set is
  broadcast; the corpus never shuffles. At 100 TB the corpus side stays
  partition-parallel and each task scores its slice (this is how exact
  kNN scales: it's embarrassingly parallel, the only reduction is top-k).
- `lsh_ann_topk`: random-hyperplane LSH bucketing — the scale path. Each
  vector gets a small integer bucket; candidates are same-bucket only, so
  the self-join is a hash join on `bucket`, never a cross join.

Planes are integer-valued and generated from a closed-form formula, so
the oracle (DuckDB) reproduces them exactly — no RNG, no libm.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_spark.functions.text_functions import cosine_similarity, dot_product, round4

# plane[j][d] = ((j*131 + d*37) % 17) - 8  — integers in [-8, 8], exact in
# binary floating point, reproducible in any engine. Materialized as a
# LITERAL array (not a transform(sequence(...)) expression): higher-order
# functions are interpreted per row and Catalyst does not constant-fold
# them — the literal is ~5x faster at sf0.1 and identical in value.


def _planes_col(planes: int, dim: int):
    return F.lit(
        [[float(((j * 131 + d * 37) % 17) - 8) for d in range(dim)] for j in range(planes)]
    )


def with_hyperplane_bucket(
    df: DataFrame, vec_col: str = "embedding", planes: int = 8, dim: int = 64
) -> DataFrame:
    """Add `bucket` (int in [0, 2^planes)) = sign pattern of the vector
    against `planes` fixed hyperplanes, plus `<vec>_d` (double-cast).

    Measured r08 (paired fresh-session A/B, min-of-6): replacing this
    unrolled HOF chain with an Arrow bucket kernel REGRESSED
    embedding_cosine_dupes 1.01→1.69 s and ann_recall_eval 2.62→3.12 s
    (flat on embedding_ann_lsh) — at fixture candidate volumes the
    Python round-trip outweighs the interpreted fold, and the bucketed
    self-joins lose the shared-exchange shape. Kept interpreted; the
    vectorized form lives in git history should corpus-scale volumes
    ever make it pay."""
    v = F.col(vec_col).cast("array<double>")
    planes_arr = _planes_col(planes, dim)
    bucket = F.lit(0).cast("long")
    for j in range(planes):  # fixed small constant → Python-unrolled
        bucket = bucket + F.when(
            dot_product(F.get(planes_arr, j), v) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return df.withColumn(f"{vec_col}_d", v).withColumn("bucket", bucket)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_same: str | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (self excluded). `queries` is broadcast — the
    corpus is scored in place, partition-parallel.

    `exclude_same`: optionally a column present on both sides (e.g. a
    class label); candidates sharing the query's value are skipped —
    the HARD-NEGATIVE MINING shape for contrastive/retrieval training:
    "the most similar items that are NOT the same class" are exactly
    the negatives that teach a ranker the decision boundary. Same cost
    and plan as the plain top-k (the label filter rides the scored
    stream before the rank window)."""
    qcols = [F.col(id_col).alias("query_id"),
             F.col(vec_col).cast("array<double>").alias("qv")]
    ccols = [F.col(id_col).alias("neighbor_id"),
             F.col(vec_col).cast("array<double>").alias("cv")]
    if exclude_same is not None:
        qcols.append(F.col(exclude_same).alias("q_ex"))
        ccols.append(F.col(exclude_same).alias("c_ex"))
    q = queries.select(*qcols)
    c = corpus.select(*ccols)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    if exclude_same is not None:
        # null-safe inequality: a NULL label is a DISTINCT class, not a
        # wildcard — plain `!=` evaluates to NULL against a NULL label
        # and would silently drop every pair touching an unlabeled row
        scored = scored.filter(~F.col("q_ex").eqNullSafe(F.col("c_ex")))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        # the corpus×queries crossJoin is a HIGH-VOLUME pair frame
        # (n·|queries| rows): the Arrow kernel replaces ~200 interpreted
        # lambda steps per pair, bit-identical by the left-fold parity
        # argument (see cosine_similarity_vec; pinned by
        # test_vec_kernel_parity)
        cosine_similarity_vec(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round4("sim").alias("sim"))
    )


def ivf_ann_topk(
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    `n_cells` Voronoi cells; each query searches its `nprobe` nearest
    cells (nprobe=1 ⇒ the classic own-cell search; raising it is the
    standard recall/fan-out knob — candidates ∝ nprobe·n/n_cells).

    Centroids here are the first `n_cells` vectors by id — deterministic
    (so any engine reproduces the assignment) and refreshable by swapping
    in k-means centroids without touching the plan. Scale shape: the
    centroid table is tiny and broadcast; assignment is one pass over the
    corpus (argmin over n_cells distances); the candidate join is a hash
    join on `cell`. A corpus vector lives in exactly one home cell and a
    query probes `nprobe` DISTINCT cells, so no candidate pair repeats —
    no post-join dedup needed.
    """
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # .limit() after the id filter is a row-wise no-op (ids are unique)
    # but makes the bound STRUCTURAL: the broadcast build side carries a
    # GlobalLimit node, so plan audits can prove the frame is bounded
    # and a fixture change can never silently widen the broadcast.
    cents = v.filter(F.col("vid") < n_cells).limit(int(n_cells)).select(
        F.col("vid").alias("cell_id"), F.col("vec").alias("cvec")
    )
    # assign: nearest centroid(s) by squared L2 (monotone with L2; cosine
    # assignment would normalize first); row_number over (d2, cell_id)
    # gives a deterministic ranking in any engine
    d2 = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        v.crossJoin(F.broadcast(cents))
        .select("vid", "vec", "cell_id", d2.alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vid").orderBy("d2", "cell_id")
            ),
        )
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vid", "vec", F.col("cell_id").alias("cell")
    )
    q = ranked.filter(F.col("rn") <= nprobe).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("cell_id").alias("cell"),
    )
    if query_filter:
        q = q.filter(query_filter.replace(id_col, "query_id"))
    c = assigned.select(
        F.col("vid").alias("neighbor_id"), F.col("vec").alias("cv"), "cell"
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round4("sim").alias("sim"))
    )


def embedding_cosine_dupes(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with cosine ≥ threshold.

    Scale path: hyperplane-bucket blocking (same deterministic planes as
    `lsh_ann_topk`) so the self-join is a hash join on `bucket` — near-dups
    have near-parallel vectors, which land in the same sign pattern with
    high probability. Candidate count ∝ Σ bucket² ≪ n², never a cross join.
    """
    bucketed = with_hyperplane_bucket(corpus, vec_col=vec_col, planes=planes, dim=dim)
    a = bucketed.select(
        F.col(id_col).alias("dup_a"), F.col(f"{vec_col}_d").alias("av"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("dup_b"), F.col(f"{vec_col}_d").alias("bv"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("dup_a") < F.col("dup_b"))
        .select(
            "dup_a",
            "dup_b",
            round4(cosine_similarity(F.col("av"), F.col("bv"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_ann_topk(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
    query_filter: str | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket the corpus once, then rank
    candidates within each query's bucket. Join key = bucket (hash join);
    recall trades off against `planes`. `query_filter` restricts which
    vectors act as queries (all corpus vectors remain candidates)."""
    bucketed = with_hyperplane_bucket(corpus, vec_col=vec_col, planes=planes, dim=dim)
    q = bucketed.select(
        F.col(id_col).alias("query_id"),
        F.col(f"{vec_col}_d").alias("qv"),
        F.col("bucket"),
    )
    if query_filter:
        q = q.filter(query_filter.replace(id_col, "query_id"))
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(f"{vec_col}_d").alias("cv"), F.col("bucket")
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round4("sim").alias("sim"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column — the IVF centroid
    refresh (`ivf_ann_topk` accepts any centroid set; first-K is the
    deterministic default, this trains a better one).

    Distributed shape per iteration: centroids ride as a broadcast
    literal; assignment is one partition-parallel pass (argmin over k
    distances); the update is posexplode→groupBy(cell, dim)→avg — one
    narrow shuffle of (cell, dim, partial sums). Only the k×dim centroid
    table (a few KB) ever reaches the driver, so the loop costs
    `iterations` jobs regardless of corpus size. Deterministic: first-K
    init, stable argmin tiebreak on cell id.
    """
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    cents = [
        r["vec"]
        for r in v.orderBy("vid").limit(k).collect()
    ]
    for _ in range(iterations):
        carr = F.lit(cents)
        # argmin via array_min + array_position (first match = smallest cell
        # id, the deterministic tiebreak). A nested when-chain here embeds
        # the running `best` in every new branch — 3^k expression nodes at
        # k=16, which stack-overflows the analyzer; the array form is O(k).
        # transform over ONE centroid literal instead of k separate
        # aggregate exprs each inlining F.get(carr, j): the k×dim literal
        # appeared k times per round in the analyzed plan (k²·dim doubles
        # for the analyzer/optimizer to walk every iteration) and cost
        # ~10 py4j calls per cell to build. Same element order, same
        # zip_with/left-fold arithmetic — values bit-identical.
        dists = F.transform(
            carr,
            lambda c: F.aggregate(
                F.zip_with(F.col("vec"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        with_d = v.select("vid", "vec", dists.alias("__d"))
        cell = (
            F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1
        ).cast("int")
        assigned = with_d.select("vid", "vec", cell.alias("cell"))
        new = (
            assigned.select("cell", F.posexplode("vec").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell", F.col("dm.m").alias("centroid"))
            .collect()
        )
        by_cell = {r["cell"]: list(r["centroid"]) for r in new}
        cents = [by_cell.get(j, cents[j]) for j in range(k)]  # empty cell keeps old
    return cents


def quantize_int8(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 scalar quantization: q_i = min(255,
    floor((x_i - min) * 255 / (max - min))), the storage-reduction step
    before ANN indexing (4x smaller than float32, 8x than float64).

    Pure per-row array expression — rides the scan, no shuffle, no UDF;
    at 100 TB this is a map-only rewrite job. Constant vectors (max ==
    min) quantize to all-zeros. Outputs stay exact integers, so the
    DuckDB oracle hash-matches bit-for-bit (the scale arithmetic is the
    same IEEE expression in both engines)."""
    v = F.col(vec_col).cast("array<double>")
    # min/max are materialized as columns BEFORE the transform — HOF
    # lambdas are interpreted with no subexpression elimination, so
    # referencing array_min(v) inside the lambda would rescan the array
    # per element (O(d²) per row; measured ~2× slower at 64 dims)
    base = corpus.select(
        F.col(id_col),
        v.alias("__v"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
    )
    mn, mx = F.col("vmin"), F.col("vmax")
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(mx == mn, F.lit(0)).otherwise(
            F.least(F.lit(255.0), F.floor((x - mn) * 255.0 / (mx - mn)))
        ).cast("long"),
    )
    return base.select(F.col(id_col), q.alias("q"), "vmin", "vmax")


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split each vector into `m`
    subvectors and train an independent k-means codebook per subspace
    (`codebooks[s][j]` = centroid j of subspace s, dim/m floats).

    Memory math that makes PQ the 100 TB ANN storage path: m=4 codes of
    1 byte replace dim×4 bytes of float32 — 64× smaller than the raw
    vectors, and ADC scoring needs only the m×k LUT per query. Training
    reuses the Lloyd loop (broadcast centroids, partition-parallel
    argmin, narrow (cell,dim) update shuffle) once per subspace; the
    driver only ever holds m×k×(dim/m) floats."""
    sub = dim // m
    books = []
    for s in range(m):
        sliced = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub).alias(
                "embedding"
            ),
        )
        books.append(
            kmeans_centroids(sliced, k=k, iterations=iterations, id_col=id_col)
        )
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against trained codebooks → (id, codes ARRAY<LONG>)
    with codes[s] = argmin_j ||subvec_s − codebooks[s][j]||².

    Vectorized Arrow-batched kernel (pandas_udf + numpy), not column
    expressions: the m×k×(dim/m) distance computation unrolled as SQL
    expressions blows the JVM's 64 KB generated-method limit (repeated
    Janino compile failures cost ~10 s before the interpreted fallback),
    and the HOF aggregate/zip_with form runs interpreted per element
    (~1.5 ms/row). The numpy form is the textbook justified-UDF case:
    one batched matrix computation, ~100× faster, map-only, no shuffle.

    Engine parity is preserved exactly: the distance accumulates with an
    explicit sequential loop over elements (acc += diff² one element at
    a time), reproducing the left-fold rounding of both the previous SQL
    form and the DuckDB oracle's list_aggregate; numpy argmin takes the
    first minimum, matching ROW_NUMBER() ... ORDER BY d2, j."""
    import numpy as np

    m, k = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @F.pandas_udf("array<long>")
    def encode_udf(embs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(e, dtype=np.float64) for e in embs])
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            x = mat[:, s * sub : (s + 1) * sub]  # (n, sub)
            c = books[s]  # (k, sub)
            d = np.zeros((n, k), dtype=np.float64)
            for i in range(sub):  # sequential: left-fold rounding parity
                diff = x[:, i, None] - c[None, :, i]
                d += diff * diff
            codes[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return corpus.select(
        F.col(id_col),
        encode_udf(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query, build the
    m×k lookup table ||q_s − c_sj||² (computed once on the tiny broadcast
    query frame), then score every corpus code with m array lookups —
    the corpus side never touches a float vector again.

    Scale shape mirrors cosine_topk: queries broadcast, codes scored in
    place partition-parallel, one top-k window at the end — but each
    corpus row costs m gets instead of dim multiplies, and the scan reads
    the 64×-smaller codes column."""
    m = len(codebooks)
    n_cent = len(codebooks[0])
    sub = len(codebooks[0][0])
    qv = F.col(vec_col).cast("array<double>")
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        *[F.slice(qv, s * sub + 1, sub).alias(f"__q{s}") for s in range(m)],
    )
    luts = []
    for s in range(m):
        # HOF form on purpose: the query side is a handful of rows, so
        # interpretation cost is nil — while the flat unrolled form makes
        # this stage's generated method blow the JVM 64 KB limit and pay
        # repeated Janino compile failures (~10 s) before falling back.
        # transform over ONE codebook literal (was n_cent separate
        # aggregate exprs each inlining the k×sub literal — same element
        # order and left-fold arithmetic, n_cent× smaller plan).
        sv = F.col(f"__q{s}")
        # single-parameter lambda only: transform() treats a 2-arg
        # lambda as (element, index). It also invokes the lambda
        # EAGERLY while building the expression, so capturing the loop's
        # current `sv` is safe.
        luts.append(
            F.transform(
                F.lit(codebooks[s]),
                lambda c: F.aggregate(
                    F.zip_with(sv, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
    qlut = qbase.select("query_id", F.array(*luts).alias("lut"))
    scored = (
        codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(qlut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    dist = F.lit(0.0)
    for s in range(m):
        dist = dist + F.get(
            F.get(F.col("lut"), s), F.get(F.col("codes"), s).cast("int")
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", dist.alias("d"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round4("d").alias("adc_dist"))
    )


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Scale each vector to unit L2 norm (zero vectors pass through).
    On unit vectors, L2 distance is monotone in cosine similarity
    (||a−b||² = 2−2·cos), so L2-trained PQ/IVF codes rank exactly like
    cosine — normalize once at ingest, not per query. Map-only; the norm
    is hoisted to a column so the HOF lambda never rescans the array."""
    v = F.col(vec_col).cast("array<double>")
    base = df.withColumn("__norm", F.sqrt(F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x
    )))
    scaled = F.when(F.col("__norm") == 0.0, v).otherwise(
        F.transform(v, lambda x: x / F.col("__norm"))
    )
    return base.withColumn(out_col or vec_col, scaled).drop("__norm")


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    pool: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: ADC over compressed codes retrieves a `pool`-sized
    candidate set, exact cosine re-ranks only those — the standard
    IVF-PQ serving shape. The expensive float read is proportional to
    pool × queries, never the corpus; the corpus-wide pass touches only
    the 64×-smaller code column. Measured on the fixture (m=8, k=16,
    pool=100): recall@10 ≈ 0.88 vs 0.28 for raw ADC."""
    # Materialize the codes once: encoding is the write-path artifact (you
    # encode at ingest and store the 64×-smaller codes), and leaving the
    # unrolled encode expressions inline would replicate a huge expression
    # tree through the ADC join branches — optimizer cost blows up.
    # LAZY checkpoint: plan truncation + compute-once are preserved (the
    # single final action materializes it), but there is no up-front
    # driver-blocking job barrier (the NB/jaccard convention).
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col).localCheckpoint(
        eager=False
    )
    cand = pq_adc_topk(
        codes, queries, codebooks, k=pool, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", round4("sim").alias("sim"))
    )


def cosine_similarity_vec(a, b):
    """Arrow-batched vectorized cosine — bit-identical to
    `cosine_similarity` (and to the oracle SQL's explicit formula): the
    dot and both norms accumulate with an explicit sequential loop over
    dimensions, reproducing the left-fold rounding of aggregate/zip_with;
    sqrt and division are correctly-rounded IEEE ops in both numpy and
    the JVM. Use on HIGH-VOLUME pair frames (candidate self-joins): the
    interpreted HOF form costs ~200 interpreted lambda steps per pair,
    this runs as batched numpy — same values. For low-volume sides (a
    handful of query rows) the HOF form avoids the Python-worker
    round-trip."""
    import numpy as np

    @F.pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        av = np.asarray([np.asarray(x, dtype=np.float64) for x in xs])
        bv = np.asarray([np.asarray(y, dtype=np.float64) for y in ys])
        n = av.shape[0]
        if n == 0:
            return pd.Series([], dtype="float64")
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(av.shape[1]):  # sequential: left-fold rounding parity
            dot += av[:, i] * bv[:, i]
            na += av[:, i] * av[:, i]
            nb += bv[:, i] * bv[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return _cos(a, b)


def l2_distance_vec(a, b):
    """Arrow-batched vectorized squared-L2 distance — bit-identical to
    the HOF `aggregate(zip_with(a, b, (x,y)->(x-y)²), 0.0, +)` form (and
    to the oracle SQL's list_aggregate): the accumulation is an explicit
    sequential loop over dimensions, reproducing the left-fold rounding;
    subtraction/multiplication/addition are correctly-rounded IEEE ops
    in both numpy and the JVM. Use on HIGH-VOLUME pair frames (a
    corpus×queries crossJoin) where the interpreted HOF pays ~2·dim
    lambda steps per pair; for a handful of rows the HOF form avoids the
    Python-worker round-trip (same guidance as cosine_similarity_vec)."""
    import numpy as np

    @F.pandas_udf("double")
    def _d2(xs: pd.Series, ys: pd.Series) -> pd.Series:
        av = np.asarray([np.asarray(x, dtype=np.float64) for x in xs])
        bv = np.asarray([np.asarray(y, dtype=np.float64) for y in ys])
        n = av.shape[0]
        if n == 0:
            return pd.Series([], dtype="float64")
        d = np.zeros(n)
        for i in range(av.shape[1]):  # sequential: left-fold rounding parity
            diff = av[:, i] - bv[:, i]
            d += diff * diff
        return pd.Series(d)

    return _d2(a, b)


def maxsim_vec(qv, cv, sub_vectors: int = 4, sub_dim: int = 16):
    """Arrow-batched ColBERT MaxSim over integer-quantized multi-vectors:
    score = Σ_i max_j (q_sub_i · c_sub_j) with the 64-dim array sliced
    into `sub_vectors`×`sub_dim` bags. Bit-identical to the unrolled
    `greatest(aggregate(zip_with(slice, slice, *), 0L, +))` HOF form BY
    CONSTRUCTION: every operand is int64 (round(x*1000) quantization), so
    sums are associative and max/Σ order cannot change the value — no
    float-rounding parity argument needed. The HOF form pays
    sub_vectors²·(2·sub_dim+1) interpreted lambda steps per pair (~528
    for 4×16); this is one einsum per batch. |v| ≤ ~10³ ⇒ dots ≤ ~10⁷,
    far from int64 overflow."""
    import numpy as np

    @F.pandas_udf("long")
    def _ms(qs: pd.Series, cs: pd.Series) -> pd.Series:
        q = np.asarray([np.asarray(x, dtype=np.int64) for x in qs])
        c = np.asarray([np.asarray(x, dtype=np.int64) for x in cs])
        n = q.shape[0]
        if n == 0:
            return pd.Series([], dtype="int64")
        qr = q.reshape(n, sub_vectors, sub_dim)
        cr = c.reshape(n, sub_vectors, sub_dim)
        dots = np.einsum("nik,njk->nij", qr, cr)  # (n, i=query, j=doc)
        return pd.Series(dots.max(axis=2).sum(axis=1))

    return _ms(qv, cv)


def assign_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_rows: int | None = None,
    max_cells: int = 4096,
) -> DataFrame:
    """Assign each vector to its nearest deterministic centroid (the first
    `n_cells` vectors by id — same convention as `ivf_ann_topk`, so any
    engine reproduces the partition). Returns (vid, vec, cell, d2) where
    d2 is the squared L2 distance to the home centroid.

    With `target_cell_rows` set, the cell count ADAPTS to corpus size:
    n_cells = least(greatest(n_cells, count div target_cell_rows),
    max_cells) — the SemDeDup scale path. A pinned cell count makes any
    downstream same-cell pairwise pass quadratic (cell_size ∝ n ⇒ pairs
    ∝ n²; measured: slope 1.32 on the tiled sf1 fixture); holding
    cell_size ≈ target keeps it linear. The count attaches as a one-row
    broadcast (no driver action), and the centroid frame keeps a
    structural .limit(max_cells) so the broadcast build side stays
    provably bounded.

    Scale shape: centroids are broadcast (n_cells × dim doubles); the
    assignment is one partition-parallel pass with an argmin over
    n_cells distances — no shuffle of the corpus."""
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    # .limit() after the id filter is a row-wise no-op (ids are unique)
    # but makes the bound STRUCTURAL: the broadcast build side carries a
    # GlobalLimit node, so plan audits can prove the frame is bounded
    # and a fixture change can never silently widen the broadcast.
    if target_cell_rows is None:
        cents = v.filter(F.col("vid") < n_cells).limit(int(n_cells)).select(
            F.col("vid").alias("cell_id"), F.col("vec").alias("cvec")
        )
    else:
        nc = v.agg(
            F.least(
                F.greatest(F.lit(n_cells),
                           F.expr(f"count(*) div {int(target_cell_rows)}")),
                F.lit(int(max_cells)),
            ).cast("long").alias("__nc"))
        # lazy-checkpoint the (≤max_cells)-row centroid frame: consumers
        # self-join on the assignment, and without the cut the
        # count-agg + crossJoin subtree replays once PER SIDE
        # (measured: semdedup 12 → 19 exchanges)
        cents = (
            v.crossJoin(F.broadcast(nc))
            .filter(F.col("vid") < F.col("__nc"))
            .limit(int(max_cells))
            .select(F.col("vid").alias("cell_id"), F.col("vec").alias("cvec"))
            .localCheckpoint(eager=False)
        )
    d2 = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ranked = (
        v.crossJoin(F.broadcast(cents))
        .select("vid", "vec", "cell_id", d2.alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("vid").orderBy("d2", "cell_id")),
        )
    )
    return ranked.filter(F.col("rn") == 1).select(
        "vid", "vec", F.col("cell_id").alias("cell"), "d2"
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.8,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering.

    Cluster the corpus into `n_cells` Voronoi cells, then — within each
    cell only — drop any vector that has a lower-id neighbor with cosine
    ≥ `threshold` (keep-lowest-id, the deterministic analog of the
    paper's keep-one-per-near-dup-group). Returns the DROPPED rows as
    (vec_id, cell, dup_of, sim) where dup_of is the kept lower-id
    neighbor with the highest cosine (ties → smallest id).

    Scale shape: the pairwise pass is confined to same-cell pairs — a
    hash join on `cell`, candidates ∝ Σ cell_size², never n². Cells cap
    the quadratic term exactly the way the paper shards by k-means
    cluster; pass `target_cell_rows` to hold cell_size constant as the
    corpus grows (see assign_cells — pinned cells measured quadratic).
    """
    # Checkpoint the assignment: the same-cell self-join below evaluates
    # `assigned` once per side (the two sides are not the same exchange
    # — verified: two full crossJoin+window subtrees in the committed
    # plan), so without the cut the corpus×centroid distance pass and
    # its per-vid window shuffle run twice.
    assigned = assign_cells(corpus, n_cells=n_cells, id_col=id_col,
                            vec_col=vec_col,
                            target_cell_rows=target_cell_rows
                            ).localCheckpoint(eager=False)
    a = assigned.select(F.col("vid").alias("dup_id"), F.col("vec").alias("av"), "cell")
    b = assigned.select(F.col("vid").alias("keep_id"), F.col("vec").alias("bv"), "cell")
    pairs = (
        a.join(b, "cell")
        .filter(F.col("keep_id") < F.col("dup_id"))
        .select(
            "dup_id", "keep_id", "cell",
            # vectorized kernel: the pair frame is the high-volume side
            # (Σ cell² candidates) — same values as the HOF cosine
            cosine_similarity_vec(F.col("av"), F.col("bv")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    w = Window.partitionBy("dup_id").orderBy(F.desc("sim"), F.asc("keep_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("dup_id").alias(id_col), "cell",
            F.col("keep_id").alias("dup_of"), round4("sim").alias("sim"),
        )
    )


def coreset_sample(
    corpus: DataFrame,
    per_cell: int = 4,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving corpus sample: the `per_cell` vectors closest
    to each cell centroid (a k-medoids-style coreset — every region of
    embedding space keeps representatives, unlike uniform sampling which
    oversamples dense regions). Returns (cell, vec_id, cell_rank, d2)
    with d2 floor-quantized to 1e-4 for engine-exact comparison.

    One broadcast-assignment pass + one per-cell top-k (single shuffle on
    `cell`); output is n_cells × per_cell rows regardless of corpus size.
    """
    assigned = assign_cells(corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("cell").orderBy(F.asc("d2"), F.asc("vid"))
    return (
        assigned.withColumn("cell_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("cell_rank") <= per_cell)
        .select(
            "cell", F.col("vid").alias(id_col), "cell_rank",
            (F.floor(F.col("d2") * 10000) / 10000).alias("d2"),
        )
    )


def mmr_rerank(
    cand: DataFrame,
    vectors: DataFrame,
    k_sel: int = 5,
    rel_w: int = 7,
    div_w: int = 3,
) -> DataFrame:
    """Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998)
    of a bounded candidate frame: greedily pick `k_sel` of each query's
    candidates maximizing rel_w*relevance - div_w*max-sim-to-selected.

    `cand`: (qid, cid, qrel) with qrel the micro-unit-quantized cosine
    relevance; `vectors`: (vec_id, e double[]). Candidate-pair
    similarities are quantized the same way, so the greedy argmax is
    pure integer arithmetic (lowest-id tie-break) — bit-deterministic
    across engines, which is what lets a recursive-CTE oracle replay
    the selection exactly. Cost: k_sel * |candidates|² per query,
    independent of corpus size — MMR composes behind any candidate
    generator (exact top-k or an ANN entry)."""
    # the candidate frame feeds BOTH sides of the pair join — checkpoint
    # it so the (possibly expensive: full ANN pipeline) candidate stage
    # runs once, not twice, and the pair plan restarts from a tiny
    # materialized frame
    cand = cand.localCheckpoint(eager=False)
    ca = cand.select("qid", F.col("cid").alias("aid"), "qrel")
    cb = cand.select(F.col("qid").alias("qid2"), F.col("cid").alias("bid"))
    v = vectors
    pair_keys = ca.join(
        F.broadcast(cb), (ca.qid == cb.qid2) & (F.col("aid") != F.col("bid"))
    ).select("qid", "aid", "qrel", "bid")
    # candidates are bounded (queries × top-k), so the pair frame is the
    # broadcast side and the corpus is streamed — no corpus shuffle.
    # with_a's bound is a JOIN bound (≤ |pair_keys| rows) that a plan
    # audit cannot prove structurally, so no explicit hint on it: AQE's
    # measured-size check converts the join to broadcast at runtime —
    # the policy SCALE.md prescribes for every non-provably-bounded side.
    with_a = v.select(F.col("vec_id").alias("aid"), F.col("e").alias("ae")) \
        .join(F.broadcast(pair_keys), "aid")
    pairs = (
        v.select(F.col("vec_id").alias("bid"), F.col("e").alias("be"))
        .join(with_a, "bid")
        .select("qid", "aid", "qrel", "bid",
                F.floor(cosine_similarity(F.col("ae"), F.col("be")) * 1000000)
                 .cast("long").alias("qsim"))
    )

    def greedy(pdf):
        qid = int(pdf["qid"].iloc[0])
        rel: dict[int, int] = {}
        simm: dict[tuple[int, int], int] = {}
        for r in pdf.itertuples():
            rel[int(r.aid)] = int(r.qrel)
            simm[(int(r.aid), int(r.bid))] = int(r.qsim)
        picked: list[int] = []
        rows = []
        while len(picked) < k_sel and len(picked) < len(rel):
            chosen = None
            for a in sorted(rel):
                if a in picked:
                    continue
                ms = max((simm.get((a, b), 0) for b in picked), default=0)
                sc = rel_w * rel[a] - div_w * ms
                if chosen is None or sc > chosen[0]:
                    chosen = (sc, a)
            picked.append(chosen[1])
            rows.append((qid, len(picked), chosen[1], rel[chosen[1]]))
        return pd.DataFrame(
            rows, columns=["query_id", "rank", "vec_id", "qrel"])

    return pairs.groupBy("qid").applyInPandas(
        greedy, "query_id bigint, rank int, vec_id bigint, qrel bigint")


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack et al.
    2009) — the standard hybrid-search combiner: each list contributes
    1/(k + rank) for the documents it ranked, summed across lists.

    Here the contribution is the INTEGER 10^12 DIV (k + rank) so the
    fused score is an exact BIGINT sum — bit-identical in any engine
    (float reciprocals would make cross-engine tie behavior depend on
    summation order). Output: one row per candidate with its per-list
    ranks (NULL where a list missed it), the fused score `rrf_u`, and
    the fused `rank` (score desc, id asc).

    Scale: the inputs are top-k lists — bounded by construction (k per
    ranker), so the union + one aggregation + the global rank window all
    operate on O(N x k) rows regardless of corpus size. The expensive
    part of hybrid search is producing the lists (BM25 posting lists,
    ANN buckets — both scale paths elsewhere in this package); fusion
    itself is deliberately tiny.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be a non-empty dict")
    tagged = None
    for name, df in rankings.items():
        t = df.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias("_r"),
            F.lit(name).alias("_src"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    agg = tagged.groupBy(id_col).agg(
        F.sum(F.expr(f"{10**12}L DIV ({k_rrf} + _r)")).cast("long").alias("rrf_u"),
        *[
            F.min(F.when(F.col("_src") == name, F.col("_r")))
            .cast("long")
            .alias(f"{name}_rank")
            for name in rankings
        ],
    )
    # TopK via orderBy().limit() (distributed TakeOrderedAndProject),
    # THEN rank the ≤top_n-row frame — makes the O(N x k) boundedness
    # structural so plan_audit's global-window rule can verify it
    # instead of trusting the prose above.
    topk = agg.orderBy(F.desc("rrf_u"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("rrf_u"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def kmeans_lloyd_integer(
    corpus: DataFrame,
    k: int = 8,
    rounds: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-round Lloyd k-means, fully in-engine and integer-exact.

    Unlike `kmeans_centroids` (float avg, centroids collected to the
    driver each round), every step here stays a DataFrame op and every
    number is a 64-bit integer, so a SQL oracle can replay the rounds
    bit-for-bit: vectors are quantized to round(x * scale) longs,
    assignment is argmin of the integer squared L2 distance (ties to the
    lower cell id), and the centroid update is the per-dimension integer
    mean sum div count. The quantization error vs float Lloyd is
    O(1/scale) per coordinate — irrelevant for clustering, decisive for
    cross-engine verification.

    Distributed shape per round: the centroid frame is k rows (bounded by
    construction — init carries a structural limit(k)), broadcast into a
    crossJoin, so assignment is one partition-parallel pass; the update
    aggregates dim per-dimension sums map-side-combinably in ONE groupBy
    (no posexplode — the shuffle carries k rows x dim columns, not
    n x dim rows). `rounds` is fixed ⇒ zero driver actions; each round's
    k-row centroid frame is cut by a LAZY localCheckpoint (the
    iterative-graph convention — connected_components/graph_kcore do the
    same) so plan depth and exchange counts stay bounded per round
    instead of compounding across the unroll. An empty cell simply
    drops out of the centroid frame (documented determinism, mirrored
    by the oracle's GROUP BY).

    Measured alternative (r08, rejected): a map-only numpy assignment
    against driver-collected centroids removes the per-round crossJoin
    and min-struct shuffle, but needs a driver collect per round —
    5 actions vs this form's single action — and benched 3.50 s vs
    2.57 s isolated at sf0.1. The zero-action unroll wins; at cluster
    scale the k-row broadcast + map-side-combinable update keeps the
    same shape (nothing here is proportional to corpus size but the
    one partition-parallel pass per round).

    Returns per-cell stats of the final assignment: (cell, n_members,
    inertia) where inertia is the summed integer squared distance.
    """
    q = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("q"),
    )
    cent = (
        q.filter(F.col("vec_id") < k)
        .limit(k)  # structural bound: the broadcast side can never grow
        .select(F.col("vec_id").cast("long").alias("cell"), F.col("q").alias("c"))
    )

    def d2_col():
        return F.aggregate(
            F.zip_with(F.col("q"), F.col("c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    for _ in range(rounds):
        assigned = (
            q.crossJoin(F.broadcast(cent))
            .withColumn("__d2", d2_col())
            .groupBy("vec_id")
            .agg(F.min(F.struct("__d2", "cell", "q")).alias("m"))
            .select("vec_id", F.col("m.cell").alias("cell"), F.col("m.q").alias("q"))
        )
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("q").getItem(i)).alias(f"s{i}") for i in range(dim)],
        )
        cent = sums.select(
            "cell",
            F.array(*[F.expr(f"s{i} div n") for i in range(dim)]).alias("c"),
        ).localCheckpoint(eager=False)
    final = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__d2", d2_col())
        .groupBy("vec_id")
        .agg(F.min(F.struct("__d2", "cell")).alias("m"))
        .select(F.col("m.cell").alias("cell"), F.col("m.__d2").alias("d2"))
    )
    return (
        final.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("d2").cast("long").alias("inertia"),
        )
        .orderBy("cell")
    )
