"""Vector-collection sinks (reference: Milvus/Qdrant consumers).

Re-expressed behaviors:
- upsert on c/r/u, delete by PK on d (MilvusChangeConsumer.java:108-186),
- single-field key struct, per-store type restriction — Milvus allows
  INT64 or any STRING (MilvusSchema.java:150-168); Qdrant only INT64 or
  UUID-string (QdrantMessageFactory.java:108-138),
- one vector field per collection, configurable per collection for
  Qdrant (`vector.fields` = "collection:field,...", duplicate collection
  config is an error — QdrantMessageFactory.java:47-76,
  QdrantChangeConsumer VECTOR_FIELDS),
- remaining non-key non-vector fields become the payload, optionally
  narrowed by a per-collection include-list
  (QdrantMessageFactory.java:144-176 `fieldNamesPerCollection`),
- collection name = destination with dots sanitized
  (MilvusChangeConsumer.java:115-117),
- schema validation before write (MilvusSchema.java:27-63).

The collection itself is a versioned parquet table (same machinery as the
correctness-bearing upsert sink) holding (id, vector, payload-json) —
swap VersionedParquetTable for a pymilvus/qdrant client upsert on a real
deployment; the pipeline-side semantics are identical.
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.operators.materialize import merge_state
from debezium_server_spark.sinks.base import BaseSink, register_sink
from debezium_server_spark.sinks.parquet_sink import SEQ_COL, VersionedParquetTable

_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

_INT_TYPES = ("bigint", "int", "smallint", "tinyint")


def validate_single_field_key(df: DataFrame, key_field: str) -> None:
    """The key must be a struct with exactly one field (both stores:
    MilvusSchema.java:150-160, QdrantMessageFactory.java:116-124)."""
    key_type = df.schema["key"].dataType
    if not isinstance(key_type, T.StructType):
        raise ValueError("only structs are supported as the key")
    if len(key_type.fields) != 1:
        raise ValueError("vector collection key must have exactly one field")
    if key_type.fields[0].name != key_field:
        raise ValueError(
            f"configured key field {key_field!r} != key struct field "
            f"{key_type.fields[0].name!r}"
        )


def validate_key_type(df: DataFrame, key_field: str,
                      allow_any_string: bool = False) -> None:
    """Qdrant: keys must be INT64 or UUID strings
    (QdrantMessageFactory.java:108-138). Milvus (`allow_any_string`):
    INT64 or any STRING (MilvusSchema.java:162-168)."""
    dtype = dict(df.select(F.col(f"key.{key_field}")).dtypes)[key_field]
    if dtype in _INT_TYPES:
        return
    if dtype == "string":
        if allow_any_string:
            return
        bad = df.filter(
            F.col(f"key.{key_field}").isNotNull()
            & ~F.col(f"key.{key_field}").rlike(_UUID_RE)
        ).limit(1).count()
        if bad:
            raise ValueError(f"string key {key_field!r} must be a UUID")
        return
    kinds = "INT64 or STRING" if allow_any_string else "INT64 or UUID"
    raise ValueError(f"vector collection key must be {kinds}, got {dtype}")


def parse_vector_fields(spec: str | dict[str, str] | None) -> dict[str, str]:
    """Parse Qdrant's `vector.fields` = "collection:field,..." config;
    duplicate collection entries are an error
    (QdrantMessageFactory.java:47-76)."""
    if not spec:
        return {}
    if isinstance(spec, dict):
        return dict(spec)
    out: dict[str, str] = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        parts = item.split(":")
        if len(parts) != 2 or not parts[0].strip() or not parts[1].strip():
            raise ValueError(f"invalid vector field format: {item!r}")
        collection, field = parts[0].strip(), parts[1].strip()
        if collection in out:
            raise ValueError(
                f"multiple vector fields requested for collection "
                f"{collection!r}: {out[collection]!r} and {field!r}"
            )
        out[collection] = field
    return out


@register_sink
class VectorCollectionSink(BaseSink):
    """Generic vector sink; `milvus`/`qdrant` below specialize key rules
    and per-collection config. Registered as `vector` for back-compat."""

    name = "vector"
    tombstone_support = False
    #: subclasses: False restricts string keys to UUID shape (Qdrant)
    allow_any_string_key = True

    def __init__(self, root_path: str, key_field: str = "id",
                 vector_field: str = "embedding",
                 vector_fields: str | dict[str, str] | None = None,
                 payload_fields: dict[str, list[str]] | None = None,
                 **kwargs: Any):
        super().__init__(**kwargs)
        self.root_path = root_path
        self.key_field = self.config.get("key.field", key_field)
        # default vector field + per-collection overrides (Qdrant surface)
        self.vector_field = self.config.get("vector.field", vector_field)
        self.vector_fields = parse_vector_fields(
            self.config.get("vector.fields", vector_fields)
        )
        # per-collection payload include-list (fieldNamesPerCollection)
        self.payload_fields = {
            k: list(v) for k, v in (payload_fields or {}).items()
        }

    def collection_name(self, destination: str) -> str:
        return re.sub(r"[^a-zA-Z0-9_]", "_", destination)

    def vector_field_for(self, collection: str) -> str:
        return self.vector_fields.get(collection, self.vector_field)

    def payload_fields_for(self, collection: str, fields: list[str]) -> list[str]:
        include = self.payload_fields.get(collection)
        if include is None:
            return fields
        return [f for f in fields if f in include]

    def _table(self, destination: str) -> VersionedParquetTable:
        return VersionedParquetTable(
            os.path.join(self.root_path, self.collection_name(destination))
        )

    def validate_schema(self, df: DataFrame, vector_field: str) -> None:
        after_type = df.schema["value"].dataType["after"].dataType
        if not isinstance(after_type, T.StructType):
            raise ValueError("envelope `after` must be a struct")
        names = after_type.fieldNames()
        if vector_field not in names:
            raise ValueError(f"vector field {vector_field!r} missing from schema")
        vec_type = after_type[vector_field].dataType
        if not isinstance(vec_type, T.ArrayType) or not isinstance(
            vec_type.elementType, (T.FloatType, T.DoubleType)
        ):
            raise ValueError(
                f"vector field {vector_field!r} must be array<float|double>"
            )

    def validate_key(self, df: DataFrame) -> None:
        validate_single_field_key(df, self.key_field)
        validate_key_type(df, self.key_field,
                          allow_any_string=self.allow_any_string_key)

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        self.validate_key(df)
        destinations = [r[0] for r in df.select("destination").distinct().collect()]
        for dest in destinations:
            collection = self.collection_name(dest)
            vector_field = self.vector_field_for(collection)
            self.validate_schema(df, vector_field)
            table = self._table(dest)
            if table.last_epoch() == epoch_id:
                continue
            events = df.filter(F.col("destination") == dest).filter(
                F.col("value").isNotNull()
            )
            after_fields = [
                f.name
                for f in events.schema["value"].dataType["after"].dataType.fields
            ]
            payload_fields = self.payload_fields_for(
                collection,
                [f for f in after_fields if f not in (self.key_field, vector_field)],
            )
            # latest-wins per key, then split: points (id, vector, payload)
            reduced = (
                events.select(
                    F.col(f"key.{self.key_field}").alias("__pk"),
                    F.struct(
                        F.col("value.op").alias("op"), F.col("value.after").alias("after")
                    ).alias("p"),
                    F.struct(
                        F.col("value.source.lsn"), F.col("value.ts_ms")
                    ).alias("__ord"),
                )
                .groupBy("__pk")
                .agg(F.max_by("p", F.col("__ord")).alias("__latest"))
            )
            batch = reduced.select(
                F.col("__pk").alias(self.key_field),
                F.col(f"__latest.after.{vector_field}").alias(vector_field),
                F.to_json(
                    F.struct(*[F.col(f"__latest.after.{p}") for p in payload_fields])
                ).alias("payload"),
                F.col("__latest.op").alias("op"),
                F.lit(epoch_id).cast("long").alias(SEQ_COL),
            )
            current = table.read(spark)
            if current is None:
                merged = batch.filter(F.col("op") != "d").drop("op")
            else:
                merged = merge_state(current, batch, key_cols=(self.key_field,), seq_col=SEQ_COL)
            table.commit(merged, epoch_id)

    def read_collection(self, spark: SparkSession, destination: str) -> DataFrame | None:
        df = self._table(destination).read(spark)
        return df.drop(SEQ_COL) if df is not None else None


@register_sink
class MilvusSink(VectorCollectionSink):
    """Named `milvus` sink: INT64 or any-STRING single-field keys
    (MilvusSchema.java:150-168)."""

    name = "milvus"
    allow_any_string_key = True


@register_sink
class QdrantSink(VectorCollectionSink):
    """Named `qdrant` sink: INT64/UUID key restriction and per-collection
    vector-field + payload include-list config
    (QdrantMessageFactory.java:47-176)."""

    name = "qdrant"
    allow_any_string_key = False
