"""Transaction metadata: the `provide.transaction.metadata` envelope surface.

When the reference pipeline runs with transaction metadata enabled, every
data event carries a `transaction` block — `{id, total_order,
data_collection_order}` — and a parallel `<prefix>.transaction` topic
carries BEGIN/END boundary events with per-collection event counts
(upstream Debezium envelope contract; the server's sinks forward these
streams unchanged — the envelope fields consumed sink-side are the same
`op/before/after/source` family described in SURVEY.md §1.2 /
FlussChangeConsumer.java:188-199).

Spark-first shape: both are pure window/group aggregations over the
ordered change stream —

- `total_order`        = row_number() over (partition by tx order by lsn)
- `data_collection_order` = row_number() over (partition by tx,
                            collection order by lsn)
- boundary events      = groupBy(tx).agg(count, min/max position,
                         per-collection counts)

All of it is shuffle-on-tx-id, map-side combinable, and scales linearly:
a transaction's events must be co-located anyway (the reference buffers
whole transactions in memory per tx id; we shuffle instead, which is the
distributed equivalent and bounded by the largest single transaction,
not the stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_transaction_metadata(
    events: DataFrame,
    tx_id: Column,
    order_by: list[Column],
    collection: Column,
) -> DataFrame:
    """Attach the `transaction` struct to every event.

    `tx_id` scopes a transaction, `order_by` is the total order within it
    (the log position — lsn / (ts, event_id)), `collection` is the table
    the event belongs to (`source.table` in a real envelope).
    """
    ev = (
        events.withColumn("_tx_id", tx_id)
        .withColumn("_collection", collection)
    )
    w_tx = Window.partitionBy("_tx_id").orderBy(*order_by)
    w_coll = Window.partitionBy("_tx_id", "_collection").orderBy(*order_by)
    return (
        ev.withColumn(
            "transaction",
            F.struct(
                F.col("_tx_id").alias("id"),
                F.row_number().over(w_tx).cast("long").alias("total_order"),
                F.row_number().over(w_coll).cast("long").alias("data_collection_order"),
            ),
        )
        .drop("_tx_id", "_collection")
    )


def transaction_boundaries(
    events: DataFrame,
    tx_id: Column,
    position: Column,
    collection: Column,
) -> DataFrame:
    """BEGIN/END boundary events for the `<prefix>.transaction` stream.

    One row per (transaction, status): BEGIN carries the first position,
    END additionally carries `event_count` and the per-collection counts
    (sorted by collection name for a deterministic array). Single
    aggregation pass; the BEGIN/END pair is a cheap 2× row expansion of
    the *aggregated* frame, never of the event stream itself.
    """
    ev = events.select(
        tx_id.alias("tx_id"), position.alias("pos"), collection.alias("collection")
    )
    per_coll = ev.groupBy("tx_id", "collection").agg(
        F.count("*").alias("n"), F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )
    agg = per_coll.groupBy("tx_id").agg(
        F.sum("n").alias("event_count"),
        F.min("first_pos").alias("first_pos"),
        F.max("last_pos").alias("last_pos"),
        F.array_sort(
            F.collect_list(F.struct("collection", "n"))
        ).alias("data_collections"),
    )
    begin = agg.select(
        "tx_id",
        F.lit("BEGIN").alias("status"),
        F.col("first_pos").alias("pos"),
        F.lit(None).cast("long").alias("event_count"),
        F.lit(None).cast(agg.schema["data_collections"].dataType).alias(
            "data_collections"
        ),
    )
    end = agg.select(
        "tx_id",
        F.lit("END").alias("status"),
        F.col("last_pos").alias("pos"),
        "event_count",
        "data_collections",
    )
    return begin.unionByName(end)
