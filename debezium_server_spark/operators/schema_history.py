"""Schema history: per-destination schema versions as a table.

Reference (§1.5): source DDL history rides a pluggable schema-history
store (RedisSchemaHistory.java:17-27); schemas otherwise travel with
every event and sinks evolve on drift (MilvusSchema.java:27-63, JDBC
`schema.evolution`, Fluss auto-create FlussChangeConsumer.java:284-313).

Spark-first: the history is a small parquet table `_schema_history`
derived FROM the stream — one row per (destination, schema_fingerprint)
with first/last-seen positions. Deriving it is a pure aggregation (one
shuffle of (destination, fingerprint) pairs — tiny at any scale since
distinct schemas are rare); appending per batch keeps an auditable DDL
log exactly like the reference's history topic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HISTORY_TABLE = "_schema_history"


def schema_fingerprint(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Add `schema_fingerprint`: md5 of the value's AFTER-image field
    names+types. For the typed frame the schema is frame-wide, but the
    fingerprint is computed per row from the JSON shape so serialized
    (per-event-schema) streams work identically."""
    after = F.col(f"{value_col}.after")
    # canonical shape string: sorted field names of the after image
    shape = F.to_json(after)
    names = F.array_sort(F.json_object_keys(shape))
    return df.withColumn(
        "schema_fingerprint", F.md5(F.concat_ws(",", names))
    )


def schema_versions(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Distinct schema versions per destination with first/last positions:
    the queryable history table."""
    with_fp = schema_fingerprint(df, value_col)
    return (
        with_fp.groupBy("destination", "schema_fingerprint")
        .agg(
            F.min(F.col(f"{value_col}.source.lsn")).alias("first_lsn"),
            F.max(F.col(f"{value_col}.source.lsn")).alias("last_lsn"),
            F.min(F.col(f"{value_col}.ts_ms")).alias("first_ts_ms"),
            F.max(F.col(f"{value_col}.ts_ms")).alias("last_ts_ms"),
            F.count("*").alias("n_events"),
        )
    )


class SchemaHistory:
    """Parquet-backed history store (the RedisSchemaHistory analog):
    append per batch, read back for audit/evolution decisions."""

    def __init__(self, root_path: str) -> None:
        self.path = os.path.join(root_path, HISTORY_TABLE)

    def record(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        (
            schema_versions(batch_df)
            .withColumn("epoch_id", F.lit(epoch_id).cast("long"))
            .write.mode("append")
            .parquet(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Consolidated view: one row per (destination, fingerprint)."""
        raw = spark.read.parquet(self.path)
        return raw.groupBy("destination", "schema_fingerprint").agg(
            F.min("first_lsn").alias("first_lsn"),
            F.max("last_lsn").alias("last_lsn"),
            F.min("first_ts_ms").alias("first_ts_ms"),
            F.max("last_ts_ms").alias("last_ts_ms"),
            F.sum("n_events").alias("n_events"),
        )

    def drifted_destinations(self, spark: SparkSession) -> DataFrame:
        """Destinations that have seen more than one schema version —
        the evolution-needed signal sinks react to."""
        return (
            self.read(spark)
            .groupBy("destination")
            .agg(F.countDistinct("schema_fingerprint").alias("n_versions"))
            .filter(F.col("n_versions") > 1)
        )
