"""Bloom-filter membership pre-filtering — the classic shuffle-avoidance
primitive for very large semi joins.

At 100 TB the expensive pattern is `big_fact SEMI JOIN medium_dim`: the
fact side must shuffle on the join key. A Bloom filter built over the dim
keys is a few KB (m_bits/8 bytes packed into 64-bit words), broadcasts to
every task, and filters the fact scan in place — only the (small) set of
bloom-positive rows proceeds to the exact join. False positives cost one
extra row through the join; false negatives are impossible.

Everything is engine-exact: hash positions come from md5 prefixes
(identical hex in Spark and DuckDB), so an oracle can replay membership
bit-for-bit. No RNG, no murmur. Spark's own `bloom_filter_agg` is not
used because its serialized form is opaque to other engines; the packed
long[] built here is portable by construction.

Reference anchor: Debezium's sinks dedup/filter by key set per batch
(e.g. RedisMemoryThreshold / FIFO dedup ids); this is the
scale-generalized form of "is this key in the interesting set".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of `k_hashes` bit positions in [0, m_bits): the 60-bit md5
    prefix of `key || '#' || i`, mod m_bits. Deterministic and
    reproducible in any engine with md5."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 15),
                16,
                10,
            )
            .cast("bigint")
            .__mod__(F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 3
) -> DataFrame:
    """Build the packed filter: (word_idx, word) rows, word = OR of
    1<<bit for every key hash landing in that 64-bit word. At most
    m_bits/64 rows regardless of build-side cardinality — one shuffle of
    ≤ m_bits/64 groups."""
    pos = (
        df.select(F.explode(_positions(F.col(key_col), m_bits, k_hashes)).alias("pos"))
        .select(
            F.expr("pos div 64").cast("bigint").alias("word_idx"),
            F.expr("pos % 64").cast("int").alias("bit"),
        )
    )
    return pos.groupBy("word_idx").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word")
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Add `bloom_hit` (boolean): true iff ALL k hash bits of the row's
    key are set. The filter table is broadcast (≤ m_bits/64 rows); the
    probe is explode → broadcast hash join → all-bits-set rollup, no
    shuffle of `df` itself beyond the per-key rollup."""
    keyed = df.select(
        F.col(key_col),
        F.posexplode(_positions(F.col(key_col), m_bits, k_hashes)).alias("i", "pos"),
    ).select(
        key_col,
        "i",
        F.expr("pos div 64").cast("bigint").alias("word_idx"),
        F.expr("pos % 64").cast("int").alias("bit"),
    )
    hit = (
        keyed.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            key_col,
            "i",
            F.coalesce(
                F.expr("(shiftright(word, bit) % 2) != 0"), F.lit(False)
            ).alias("bit_set"),
        )
        .groupBy(key_col)
        .agg(F.min("bit_set").alias("bloom_hit"))
    )
    return hit


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-accelerated semi join: pre-filter `fact` by the dim-key
    bloom, then exact semi join only the survivors. Result rows are
    identical to the plain semi join (false positives are removed by the
    exact join); the win is that the fact-side shuffle carries only
    bloom-positive rows."""
    bloom = bloom_build(dim_keys, dim_key, m_bits=m_bits, k_hashes=k_hashes)
    probed = bloom_probe(
        fact.select(F.col(fact_key)).distinct(), bloom, fact_key, m_bits, k_hashes
    ).filter(F.col("bloom_hit"))
    survivors = fact.join(F.broadcast(probed.select(fact_key)), fact_key, "inner")
    return survivors.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)).distinct(), fact_key, "left_semi"
    )
