"""Vector-collection sink (reference: Milvus/Qdrant consumers).

Re-expressed behaviors:
- upsert on c/r/u, delete by PK on d (MilvusChangeConsumer.java:108-186),
- single-field key restricted to INT64 or UUID-string
  (QdrantMessageFactory.java:108-138),
- one vector field per collection; remaining non-key fields become the
  payload (QdrantMessageFactory.java:144-176; fixture F6),
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


def validate_key_type(df: DataFrame, key_field: str) -> None:
    """Keys must be INT64 or UUID strings (QdrantMessageFactory.java:108-138)."""
    dtype = dict(df.select(F.col(f"key.{key_field}")).dtypes)[key_field]
    if dtype in ("bigint", "int", "smallint", "tinyint"):
        return
    if dtype == "string":
        bad = df.filter(
            F.col(f"key.{key_field}").isNotNull()
            & ~F.col(f"key.{key_field}").rlike(_UUID_RE)
        ).limit(1).count()
        if bad:
            raise ValueError(f"string key {key_field!r} must be a UUID")
        return
    raise ValueError(f"vector collection key must be INT64 or UUID, got {dtype}")


@register_sink
class VectorCollectionSink(BaseSink):
    name = "vector"
    tombstone_support = False

    def __init__(self, root_path: str, key_field: str = "id",
                 vector_field: str = "embedding", **kwargs: Any):
        super().__init__(**kwargs)
        self.root_path = root_path
        self.key_field = self.config.get("key.field", key_field)
        # configurable vector field per collection (QdrantChangeConsumer)
        self.vector_field = self.config.get("vector.field", vector_field)

    def collection_name(self, destination: str) -> str:
        return re.sub(r"[^a-zA-Z0-9_]", "_", destination)

    def _table(self, destination: str) -> VersionedParquetTable:
        return VersionedParquetTable(
            os.path.join(self.root_path, self.collection_name(destination))
        )

    def validate_schema(self, df: DataFrame) -> None:
        after_type = df.schema["value"].dataType["after"].dataType
        if not isinstance(after_type, T.StructType):
            raise ValueError("envelope `after` must be a struct")
        names = after_type.fieldNames()
        if self.vector_field not in names:
            raise ValueError(f"vector field {self.vector_field!r} missing from schema")
        vec_type = after_type[self.vector_field].dataType
        if not isinstance(vec_type, T.ArrayType) or not isinstance(
            vec_type.elementType, (T.FloatType, T.DoubleType)
        ):
            raise ValueError(
                f"vector field {self.vector_field!r} must be array<float|double>"
            )

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        self.validate_schema(df)
        validate_key_type(df, self.key_field)
        destinations = [r[0] for r in df.select("destination").distinct().collect()]
        for dest in destinations:
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
            payload_fields = [
                f for f in after_fields if f not in (self.key_field, self.vector_field)
            ]
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
                F.col(f"__latest.after.{self.vector_field}").alias(self.vector_field),
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
