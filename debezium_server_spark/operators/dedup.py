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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.functions.text_functions import (
    band_keys,
    minhash_signature,
    simhash16,
    token_shingles,
    tokens,
)


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


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash.

    Docs sharing ≥1 of `bands` band keys become a candidate pair. The
    self-join is on the band key — shuffle is proportional to docs×bands,
    never docs², which is what keeps this viable at 100 TB (hot buckets
    are the skew risk; AQE skew-join handles moderate skew, salting the
    band key handles the pathological case).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(
        F.array_distinct(token_shingles(tokens(F.col(text_col)), shingle_k)), num_hashes
    )
    banded = df.select(
        F.col(id_col),
        F.posexplode(band_keys(sig, bands, rows_per_band)).alias("band_id", "band_hash"),
    )
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
) -> DataFrame:
    """Exact n-gram Jaccard on blocked candidates.

    Candidates = pairs sharing `block_cols` (cheap blocking key); exact
    Jaccard = |A∩B| / |A∪B| over distinct k-token shingles. Blocking keeps
    the join linear-ish in block sizes; at scale the block key should be a
    band/bucket (compose with minhash_lsh_pairs for the full pipeline).
    """
    shingled = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.array_distinct(token_shingles(tokens(F.col(text_col)), shingle_k)).alias("sh"),
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash signature per document; docs with equal signatures
    are near-duplicates. Scale: signature is a narrow groupable int —
    dedup becomes the exact-dedup shape on `simhash`."""
    return df.select(
        F.col(id_col),
        simhash16(tokens(F.col(text_col))).alias("simhash"),
    )


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
            F.round(sim, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
