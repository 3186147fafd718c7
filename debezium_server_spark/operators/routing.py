"""Stream-name mapping and routing.

Reference: StreamNameMapper.map(String)->String (StreamNameMapper.java:14-16)
with sink-specific sanitization (MilvusChangeConsumer.java:115-117 dots →
underscores; FlussChangeConsumer.java:236-240 regex `[^a-zA-Z0-9_\\-]`→`_`)
and per-destination physical grouping before writes
(KinesisChangeConsumer.java:136, FlussChangeConsumer.java:137-138).

Spark-first: name mapping is a codegen'd `regexp_replace`; physical
grouping is `repartition(destination)` so each task writes one stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sanitize_stream_name(col: Column | str, allowed: str = r"a-zA-Z0-9_\-") -> Column:
    """Replace characters outside the allowed set with underscores
    (FlussChangeConsumer.java:236-240)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"[^{allowed}]", "_")


def dots_to_underscores(col: Column | str) -> Column:
    """Milvus/Qdrant collection-name sanitization
    (MilvusChangeConsumer.java:115-117)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\.", "_")


def map_stream_name(df: DataFrame, mapper: Column, out_col: str = "destination") -> DataFrame:
    """Apply a StreamNameMapper expression."""
    return df.withColumn(out_col, mapper)


def group_by_destination(df: DataFrame, destination_col: str = "destination",
                         num_partitions: int | None = None) -> DataFrame:
    """Hash-group a batch by destination before writing (the physical
    per-stream grouping all bulk sinks perform). One shuffle, after which
    every task owns whole destinations."""
    if num_partitions:
        return df.repartition(num_partitions, F.col(destination_col))
    return df.repartition(F.col(destination_col))


def with_partition_routing(df: DataFrame, num_partitions: int,
                           key_col: str = "key",
                           out_col: str = "partition") -> DataFrame:
    """Explicit hash-of-key partition routing
    (EventHubsChangeConsumer.java:177-222, RocketMqChangeConsumer.java:166):
    assigns a stable partition id; `pmod(hash(key), n)` matches the
    reference's hash-mod strategy with Spark's Murmur3."""
    return df.withColumn(out_col, F.pmod(F.hash(F.col(key_col)), F.lit(num_partitions)))


def ordered_within_key(df: DataFrame, key_col: str = "key",
                       order_col: str = "value.source.lsn") -> DataFrame:
    """Per-key ordered delivery (PubSubChangeConsumer.java:262-274):
    co-locate each key then sort within partitions; across micro-batches
    order is guaranteed by sequential epochs."""
    return df.repartition(F.col(key_col)).sortWithinPartitions(key_col, order_col)


def salt_key(df: DataFrame, key_col: str, buckets: int,
             out_col: str = "salted_key") -> DataFrame:
    """Skew salting: split each hot key into `buckets` sub-keys so one
    giant key (one celebrity user, one default tenant) cannot pin a whole
    shuffle partition. Deterministic per row (hash of the full row via
    monotonically-increasing-free columns is NOT used — a uniform random
    pick would break retry idempotence; instead rows round-robin by their
    source position when present, falling back to a hash of all columns).

    Two-phase aggregate pattern:
        df.transform(salt_key, "k", 32).groupBy("salted_key").agg(partial)
          .groupBy("k").agg(final)
    turns one skewed shuffle into two balanced ones. AQE's skew-join
    handles moderate skew automatically; salting is for the pathological
    case (single key >> one executor's memory).
    """
    cols = [F.col(c) for c in df.columns]
    spread = F.pmod(F.hash(*cols), F.lit(buckets))
    return df.withColumn(
        out_col, F.concat(F.col(key_col).cast("string"), F.lit("#"), spread)
    )


def salted_count(df: DataFrame, key_col: str, buckets: int = 32) -> DataFrame:
    """Reference shape for the two-phase skew-safe aggregate: count per
    key via salted partial counts. Value-identical to a direct
    groupBy(key).count() — only the physical plan differs."""
    return (
        salt_key(df, key_col, buckets)
        .groupBy("salted_key")
        .agg(F.first(key_col).alias(key_col), F.count("*").alias("partial_n"))
        .groupBy(key_col)
        .agg(F.sum("partial_n").alias("n"))
    )
