"""Change-event data model.

The unit of data is a change event: ``{destination, key, value, headers,
partition}`` where ``value`` is the Debezium-style envelope ``{op, before,
after, source, ts_ms}`` (reference surface: BatchEvent accessors, SURVEY.md
§1.1, debezium-server-core/src/main/java/io/debezium/server/
DefaultChangeConsumer.java:86, BaseChangeConsumer.java:101-108; envelope
fields FlussChangeConsumer.java:188-193).

Spark-first: one StructType for the transport frame, parameterized by the
row schema of the captured table — mirrors how Spark's Kafka source exposes
``topic/key/value/headers/partition`` columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Operation codes (reference: Envelope.Operation, dispatched at
# MilvusChangeConsumer.java:133-146).
OP_CREATE = "c"
OP_READ = "r"  # snapshot read
OP_UPDATE = "u"
OP_DELETE = "d"
UPSERT_OPS = (OP_CREATE, OP_READ, OP_UPDATE)

# Source-position block: enough to totally order events from one source
# partition (lsn ~ log sequence number / offset).
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("snapshot", T.StringType()),
    ]
)

HEADER_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.StringType()),
        ]
    )
)


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Envelope struct `{op, before, after, source, ts_ms}` for a row type."""
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", SOURCE_SCHEMA),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def event_schema(row_schema: T.StructType, key_schema: T.StructType) -> T.StructType:
    """Full transport frame for a change-event stream.

    ``value`` is nullable: a null value is a tombstone (reference:
    TombstoneSupportProducer.java:37-42).
    """
    return T.StructType(
        [
            T.StructField("destination", T.StringType(), False),
            T.StructField("key", key_schema),
            T.StructField("value", envelope_schema(row_schema)),
            T.StructField("headers", HEADER_SCHEMA),
            T.StructField("partition", T.IntegerType()),
        ]
    )


# ---------------------------------------------------------------------------
# Semantic type system (reference matrix: FlussTypeConverter.java:131-237;
# SURVEY.md §1.4/§1.6). Maps Debezium/Connect semantic type names to Spark
# types. Values already arrive converted in parquet test fixtures; this map
# is the contract for source connectors and the JSON/Avro decode path.
# ---------------------------------------------------------------------------

SEMANTIC_TYPE_MAP: dict[str, T.DataType] = {
    # Connect primitives (FlussTypeConverter.java:166-177)
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    # Temporal logical types (FlussTypeConverter.java:53-57,88-93,147-165)
    "io.debezium.time.Date": T.DateType(),
    "org.apache.kafka.connect.data.Date": T.DateType(),
    "io.debezium.time.Time": T.IntegerType(),  # millis of day
    "io.debezium.time.MicroTime": T.LongType(),  # micros of day
    "io.debezium.time.NanoTime": T.LongType(),
    "org.apache.kafka.connect.data.Time": T.IntegerType(),
    "io.debezium.time.Timestamp": T.TimestampNTZType(),  # ms
    "io.debezium.time.MicroTimestamp": T.TimestampNTZType(),
    "io.debezium.time.NanoTimestamp": T.TimestampNTZType(),
    "org.apache.kafka.connect.data.Timestamp": T.TimestampNTZType(),
    "io.debezium.time.ZonedTimestamp": T.TimestampType(),  # zone-aware
    "io.debezium.time.ZonedTime": T.StringType(),
    # String logical types (FlussTypeConverter.java:70-76)
    "io.debezium.data.Json": T.StringType(),
    "io.debezium.data.Uuid": T.StringType(),
    "io.debezium.data.Xml": T.StringType(),
    "io.debezium.data.TsVector": T.StringType(),
    "io.debezium.data.Enum": T.StringType(),
    "io.debezium.data.EnumSet": T.StringType(),
    # Binary logical types (FlussTypeConverter.java:83-86,210-211)
    "io.debezium.data.Bits": T.BinaryType(),
    "io.debezium.data.geometry.Geometry": T.BinaryType(),  # WKB
    "io.debezium.data.geometry.Geography": T.BinaryType(),
    "io.debezium.data.geometry.Point": T.BinaryType(),
    # Vector logical types (FlussTypeConverter.java:78-81; Qdrant mapping
    # QdrantMessageFactory.java:144-176)
    "io.debezium.data.vector.FloatVector": T.ArrayType(T.FloatType()),
    "io.debezium.data.vector.DoubleVector": T.ArrayType(T.DoubleType()),
    "io.debezium.data.vector.SparseDoubleVector": T.MapType(T.IntegerType(), T.DoubleType()),
}


def decimal_type(precision: int = 38, scale: int = 18) -> T.DecimalType:
    """Connect ``Decimal(p,s)``; VariableScaleDecimal callers pass defaults
    (FlussTypeConverter.java:95-103,134-143)."""
    return T.DecimalType(precision, scale)


def spark_type_for(semantic_name: str, parameters: dict[str, str] | None = None) -> T.DataType:
    """Resolve a Connect/Debezium semantic type name to a Spark type."""
    if semantic_name == "org.apache.kafka.connect.data.Decimal":
        params = parameters or {}
        return decimal_type(
            int(params.get("connect.decimal.precision", 38)), int(params.get("scale", 18))
        )
    if semantic_name == "io.debezium.data.VariableScaleDecimal":
        return decimal_type(38, 18)
    try:
        return SEMANTIC_TYPE_MAP[semantic_name]
    except KeyError:
        raise ValueError(f"unknown semantic type: {semantic_name}") from None
