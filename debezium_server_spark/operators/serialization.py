"""Serialization formats for the outbound event frame.

Reference: `debezium.format.{key,value,header}` with formats `json`,
`jsonbytearray`, `cloudevents`, `avro`, `protobuf`, `binary`,
`simplestring`, `connect` (DebeziumSerializationProducer.java:60-68,
103-135; headers restricted to json/jsonbytearray/connect, :137-154).

Spark-first mapping — each format is a column projection over the typed
event frame (the `connect` format IS our native typed frame):

| format       | here                                             |
|--------------|--------------------------------------------------|
| connect      | the typed frame itself (no-op)                   |
| json         | `to_json(key/value)` strings                     |
| jsonbytearray| json cast to binary (UTF-8)                      |
| binary       | raw bytes of the serialized value                |
| simplestring | value rendered as a plain string                 |
| cloudevents  | CloudEvents v1.0 JSON envelope around the value  |
| avro/protobuf| registry-backed; out of scope in this container  |

Avro/Protobuf need a schema registry client (wire format prefixes a
registry id); the functions raise with that explanation rather than
pretending (`DebeziumProperties.java:49-53` — Apicurio/Confluent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEADER_FORMATS = ("json", "jsonbytearray", "connect")


def headers_as_map(headers_col: str = "headers") -> Column:
    """Headers list → string map (BaseChangeConsumer.convertHeaders,
    BaseChangeConsumer.java:101-108)."""
    return F.map_from_entries(F.col(headers_col))


def serialize_json(df: DataFrame) -> DataFrame:
    """Typed frame → json format: key/value as JSON strings."""
    return df.select(
        "destination",
        F.to_json("key").alias("key"),
        F.to_json("value").alias("value"),
        "headers",
        "partition",
    )


def serialize_json_bytes(df: DataFrame) -> DataFrame:
    """jsonbytearray format: json, transported as UTF-8 bytes."""
    j = serialize_json(df)
    return j.select(
        "destination",
        F.encode(F.col("key"), "UTF-8").alias("key"),
        F.encode(F.col("value"), "UTF-8").alias("value"),
        "headers",
        "partition",
    )


def serialize_simplestring(df: DataFrame, value_expr: str = "value.after") -> DataFrame:
    """simplestring format: the value rendered as one plain string (the
    reference uses the record's string form; we render the row image)."""
    return df.select(
        "destination",
        F.col("key").cast("string").alias("key"),
        F.to_json(F.expr(value_expr)).alias("value"),
        "headers",
        "partition",
    )


def serialize_binary(df: DataFrame) -> DataFrame:
    """binary format: opaque bytes (serialized json as the byte source —
    the reference hands through whatever the converter produced)."""
    return serialize_json_bytes(df)


def cloudevents_value(
    source_uri: str = "/debezium/spark",
    event_type: str = "io.debezium.connector.spark.DataChangeEvent",
    id_col: Column | None = None,
    value_col: str = "value",
    ts_col: str = "value.ts_ms",
) -> Column:
    """CloudEvents v1.0 JSON envelope (ce fields + data payload).

    Built with format_string over to_json parts, so the field order is
    pinned by construction — reproducible in any engine, including a SQL
    oracle building the same string."""
    event_id = id_col if id_col is not None else F.concat(
        F.col("destination"), F.lit(":"), F.col(ts_col).cast("string")
    )
    return F.format_string(
        '{"specversion":"1.0","id":"%s","source":"%s","type":"%s",'
        '"datacontenttype":"application/json","time":"%s","data":%s}',
        event_id,
        F.lit(source_uri),
        F.lit(event_type),
        F.date_format(
            F.timestamp_millis(F.col(ts_col)), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        ),
        F.to_json(F.col(value_col)),
    )


def serialize_cloudevents(df: DataFrame, **kwargs) -> DataFrame:
    return df.select(
        "destination",
        F.to_json("key").alias("key"),
        cloudevents_value(**kwargs).alias("value"),
        "headers",
        "partition",
    )


def serialize_avro(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    raise NotImplementedError(
        "avro format needs a schema-registry client (wire format embeds a "
        "registry id — DebeziumProperties.java:49-53); wire via "
        "spark-avro's to_avro + a registry client when available"
    )


def serialize_protobuf(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    raise NotImplementedError(
        "protobuf format needs compiled descriptors + registry; wire via "
        "spark-protobuf's to_protobuf when available"
    )


FORMATS = {
    "connect": lambda df: df,
    "json": serialize_json,
    "jsonbytearray": serialize_json_bytes,
    "binary": serialize_binary,
    "simplestring": serialize_simplestring,
    "cloudevents": serialize_cloudevents,
    "avro": serialize_avro,
    "protobuf": serialize_protobuf,
}


def serialize(df: DataFrame, fmt: str = "json", **kwargs) -> DataFrame:
    """Apply a named format (the DebeziumSerializationProducer dispatch)."""
    try:
        fn = FORMATS[fmt]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; one of {sorted(FORMATS)}") from None
    return fn(df, **kwargs) if kwargs else fn(df)
