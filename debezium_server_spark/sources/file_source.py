"""File-backed change-event sources.

- `changelog_stream`: tail a directory of JSON change events in the
  event_schema frame — the engine's native test source, and the local
  stand-in for a Kafka/CDC feed (the reference's unit tests use the
  FileStreamSourceConnector the same way, TestConfigSource.java:66-70).
- `lines_stream`: one event per text line with a fixed destination —
  the exact FileStreamSourceConnector analog (fixture F4).

Both are real Structured Streaming sources (`spark.readStream`), so
checkpointing/offset tracking comes from Spark, replacing the reference's
offset store (TestConfigSource.java:37-38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.schema import event_schema


def changelog_stream(
    spark: SparkSession,
    path: str,
    row_schema: T.StructType,
    key_schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream JSON change events from a directory (schema enforced, no
    inference). `maxFilesPerTrigger` is the backpressure knob, standing in
    for the reference's bounded engine queue (DebeziumMetrics.java:106-144)."""
    reader = spark.readStream.schema(event_schema(row_schema, key_schema))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def changelog_batch(
    spark: SparkSession,
    path: str,
    row_schema: T.StructType,
    key_schema: T.StructType,
) -> DataFrame:
    """Batch read of the same change log (snapshot-phase replay)."""
    return spark.read.schema(event_schema(row_schema, key_schema)).json(path)


def lines_stream(
    spark: SparkSession,
    path: str,
    destination: str = "topicX",
) -> DataFrame:
    """FileStream source analog: one change event per text line, fixed
    destination, value = the raw line (fixture F4). The value rides as a
    plain string; SMTs like hoist_field wrap it downstream."""
    return (
        spark.readStream.text(path)
        .select(
            F.lit(destination).alias("destination"),
            F.lit(None).cast("string").alias("key"),
            F.col("value"),
            F.lit(None).cast("array<struct<key:string,value:string>>").alias("headers"),
            F.lit(None).cast("int").alias("partition"),
        )
    )


def heartbeat_stream(spark: SparkSession, interval_rows_per_sec: int = 1,
                     prefix: str = "__debezium-heartbeat",
                     source_name: str = "default") -> DataFrame:
    """Periodic liveness events (topic.heartbeat.prefix semantics,
    RedisStreamChangeConsumer.java:67-68) from the rate source."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", interval_rows_per_sec)
        .load()
        .select(
            F.concat(F.lit(prefix + "."), F.lit(source_name)).alias("destination"),
            F.lit(None).cast("string").alias("key"),
            F.to_json(F.struct(F.col("timestamp"), F.col("value"))).alias("value"),
            F.lit(None).cast("array<struct<key:string,value:string>>").alias("headers"),
            F.lit(None).cast("int").alias("partition"),
        )
    )
