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
