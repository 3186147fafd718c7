"""Kafka transport adapter: Spark's Kafka frame ⇄ the engine's event frame.

The reference's primary transport is Kafka-shaped (`BatchEvent
{destination, key, value, headers, partition}` mirrors a Kafka record;
KafkaChangeConsumer.java:98-150). Spark's Kafka source/sink already speak
that shape — `readStream.format("kafka")` yields `topic/partition/offset/
key/value/headers/timestamp` — so the adapter is two pure projections:

- `kafka_frame_to_events`: inbound Kafka frame → typed event frame
  (key/value parsed from JSON with the row/key schemas; the topic is the
  destination; Kafka's (partition, offset) becomes the source position so
  per-key ordering survives the hop).
- `events_to_kafka_frame`: outbound typed frame → the column contract of
  `writeStream.format("kafka")` (`topic/key/value/headers`).

No broker is required to validate the logic — the projections are tested
on synthetic frames with the exact Kafka source schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.schema import envelope_schema

# Spark Kafka source columns (fixed contract of format("kafka")).
KAFKA_SOURCE_COLUMNS = (
    "key", "value", "topic", "partition", "offset", "timestamp", "headers",
)


def kafka_frame_to_events(
    kafka_df: DataFrame,
    row_schema: T.StructType,
    key_schema: T.StructType,
) -> DataFrame:
    """Kafka frame → event frame. JSON key/value (the default Debezium
    wire format) parsed with explicit schemas — no inference, so a
    malformed record yields nulls, not a failed query.

    The envelope's source.lsn is backfilled from the Kafka offset when
    the payload carries none (offset order IS the per-partition total
    order the reference relies on)."""
    env_schema = envelope_schema(row_schema)
    value = F.from_json(F.col("value").cast("string"), env_schema)
    # Rebuild the source struct field-by-field: a payload WITHOUT a source
    # block still gets lsn=offset (withField alone would propagate the
    # null struct). Tombstones stay null — withField on a null value is
    # null.
    src_type = env_schema["source"].dataType
    src_fields = [
        (
            F.coalesce(value["source"]["lsn"], F.col("offset")).alias("lsn")
            if f.name == "lsn"
            else value["source"][f.name].alias(f.name)
        )
        for f in src_type.fields
    ]
    backfilled = value.withField("source", F.struct(*src_fields))
    return kafka_df.select(
        F.col("topic").alias("destination"),
        F.from_json(F.col("key").cast("string"), key_schema).alias("key"),
        backfilled.alias("value"),
        F.transform(
            F.col("headers"),
            lambda h: F.struct(
                h["key"].alias("key"), h["value"].cast("string").alias("value")
            ),
        ).alias("headers"),
        F.col("partition").cast("int").alias("partition"),
    )


def events_to_kafka_frame(events: DataFrame) -> DataFrame:
    """Event frame → the Kafka sink column contract
    (`df.write.format("kafka")` consumes topic/key/value/headers;
    KafkaChangeConsumer.java:108-109 sends exactly these)."""
    return events.select(
        F.col("destination").alias("topic"),
        F.to_json("key").cast("binary").alias("key"),
        F.to_json("value").cast("binary").alias("value"),
        F.transform(
            F.col("headers"),
            lambda h: F.struct(
                h["key"].alias("key"), F.encode(h["value"], "UTF-8").alias("value")
            ),
        ).alias("headers"),
    )
