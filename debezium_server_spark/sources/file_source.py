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


DEAD_LETTER_DESTINATION = "__dead_letter"


def changelog_stream(
    spark: SparkSession,
    path: str,
    row_schema: T.StructType,
    key_schema: T.StructType,
    max_files_per_trigger: int | None = None,
    quarantine_corrupt: bool = False,
) -> DataFrame:
    """Stream JSON change events from a directory (schema enforced, no
    inference). `maxFilesPerTrigger` is the backpressure knob, standing in
    for the reference's bounded engine queue (DebeziumMetrics.java:106-144).

    With `quarantine_corrupt`, malformed lines are not silently nulled:
    they route to `DEAD_LETTER_DESTINATION` with the raw line preserved
    in a `__raw` header — the dead-letter pattern (one poison message
    must neither kill the stream, as the reference's engine-stop default
    does, nor vanish). Point a routed append sink at that destination to
    materialize the DLQ for replay-after-fix."""
    schema = event_schema(row_schema, key_schema)
    if not quarantine_corrupt:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.json(path)

    with_corrupt = T.StructType(
        [*schema.fields, T.StructField("__corrupt", T.StringType())]
    )
    reader = (
        spark.readStream.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "__corrupt")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(path)
    bad = F.col("__corrupt").isNotNull()
    # dead-letter rows carry an all-null-FIELDS value struct, not a null
    # value: a null value is the tombstone encoding and sinks drop it
    value_type = schema["value"].dataType
    empty_value = F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in value_type.fields]
    )
    return raw.select(
        F.when(bad, F.lit(DEAD_LETTER_DESTINATION))
        .otherwise(F.col("destination"))
        .alias("destination"),
        F.when(bad, F.lit(None)).otherwise(F.col("key")).alias("key"),
        F.when(bad, empty_value).otherwise(F.col("value")).alias("value"),
        F.when(
            bad,
            F.array(F.struct(F.lit("__raw").alias("key"),
                             F.col("__corrupt").alias("value"))),
        )
        .otherwise(F.col("headers"))
        .alias("headers"),
        "partition",
    )


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


def raw_changelog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """ONE stream carrying MANY tables with different schemas — the
    reference's normal operating mode (a connector emits every captured
    table through one engine; schemas are per-event, SURVEY.md §1.5).

    A static-schema stream can't type such a feed, so the envelope is
    parsed only enough to ROUTE: `destination`/`partition` typed,
    `key`/`value`/`headers` kept as raw JSON text. Routing, filtering
    and fanout run on this frame (predicates on destination push into
    the scan); each destination group is then typed by `parse_events`
    with ITS schema at materialization — SURVEY.md §7.3 hard-part (b).
    """
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(path)
    g = lambda p: F.get_json_object(F.col("value"), p)  # noqa: E731
    return raw.select(
        g("$.destination").alias("destination"),
        g("$.key").alias("key_raw"),
        g("$.value").alias("value_raw"),
        g("$.headers").alias("headers_raw"),
        g("$.partition").cast("int").alias("partition"),
    )


def parse_events(
    df: DataFrame,
    row_schema: T.StructType,
    key_schema: T.StructType,
    destination: str | None = None,
) -> DataFrame:
    """Type one destination group of a raw multi-table stream with that
    table's schemas → the standard event frame (batch or streaming)."""
    if destination is not None:
        df = df.filter(F.col("destination") == destination)
    full = event_schema(row_schema, key_schema)
    return df.select(
        "destination",
        F.from_json("key_raw", key_schema).alias("key"),
        F.from_json("value_raw", full["value"].dataType).alias("value"),
        F.from_json("headers_raw", full["headers"].dataType).alias("headers"),
        "partition",
    )
