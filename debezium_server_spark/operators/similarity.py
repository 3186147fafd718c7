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
    against `planes` fixed hyperplanes, plus `<vec>_d` (double-cast)."""
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
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (self excluded). `queries` is broadcast — the
    corpus is scored in place, partition-parallel."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
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


def ivf_ann_topk(
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    `n_cells` Voronoi cells and search only the query's own cell.

    Centroids here are the first `n_cells` vectors by id — deterministic
    (so any engine reproduces the assignment) and refreshable by swapping
    in k-means centroids without touching the plan. Scale shape: the
    centroid table is tiny and broadcast; assignment is one pass over the
    corpus (argmin over n_cells distances); the candidate join is a hash
    join on `cell`, candidates ∝ n/n_cells per query — the classic IVF
    trade of recall for fan-out.
    """
    v = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    cents = v.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cell_id"), F.col("vec").alias("cvec")
    )
    # assign: nearest centroid by squared L2 (monotone with L2; cosine
    # assignment would normalize first) — min_by struct gives argmin with
    # an id tiebreak, deterministic in any engine
    d2 = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .select("vid", "vec", "cell_id", d2.alias("d2"))
        .groupBy("vid")
        .agg(
            F.min_by(F.col("cell_id"), F.struct(F.col("d2"), F.col("cell_id"))).alias("cell"),
            F.first("vec").alias("vec"),
        )
    )
    q = assigned.select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qv"), "cell"
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
        d2 = lambda j: F.aggregate(  # noqa: E731
            F.zip_with(F.col("vec"), F.get(carr, j), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cell = F.lit(0)
        best = d2(0)
        for j in range(1, k):
            dj = d2(j)
            cell = F.when(dj < best, F.lit(j)).otherwise(cell)
            best = F.when(dj < best, dj).otherwise(best)
        assigned = v.select("vid", "vec", cell.alias("cell"))
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
