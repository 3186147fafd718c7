"""JDBC snapshot source (reference: the snapshot phase of the CDC
connectors — per-table SELECT overrides `snapshot.select.statement.
overrides.<table>` TestConfigSource.java:90; include lists
`schema.include.list`/`table.include.list` TestConfigSource.java:40-41).

Spark-first: `spark.read.jdbc` IS the snapshot reader — predicate
pushdown, column pruning, and parallel partitioned reads are built in.
This module contributes the config surface: include-list filtering,
per-table query overrides, and the partitioning options that make a
snapshot scale (one JDBC connection per partition; without
partition_column a 100 TB table would read through a single connection).
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_spark.schema import SOURCE_SCHEMA


@dataclass
class SnapshotConfig:
    url: str
    tables: list[str] = field(default_factory=list)  # schema.table names
    table_include: list[str] = field(default_factory=list)  # glob patterns
    select_overrides: dict[str, str] = field(default_factory=dict)
    key_columns: dict[str, tuple[str, ...]] = field(default_factory=dict)
    partition_column: dict[str, str] = field(default_factory=dict)
    num_partitions: int = 8
    properties: dict[str, str] = field(default_factory=dict)
    topic_prefix: str = "cdc"

    def included_tables(self) -> list[str]:
        """Apply include-list filters (config-time pruning — tables never
        touched are never read)."""
        if not self.table_include:
            return list(self.tables)
        return [
            t for t in self.tables
            if any(fnmatch.fnmatch(t, pat) for pat in self.table_include)
        ]

    def reader_options(self, table: str) -> dict[str, str]:
        """Options for one table's snapshot read. A select override maps to
        the `query` option — the WHERE clause executes IN the database
        (source-side predicate pushdown, TestConfigSource.java:90)."""
        opts = {"url": self.url, **self.properties}
        override = self.select_overrides.get(table)
        if override:
            opts["query"] = override
        else:
            opts["dbtable"] = table
        pc = self.partition_column.get(table)
        if pc and not override:
            opts["partitionColumn"] = pc
            opts["numPartitions"] = str(self.num_partitions)
            # caller must provide bounds via properties or we probe min/max
        return opts


def snapshot_table(spark: SparkSession, cfg: SnapshotConfig, table: str) -> DataFrame:
    """Read one table's snapshot rows (raw row images)."""
    opts = cfg.reader_options(table)
    reader = spark.read.format("jdbc")
    for k, v in opts.items():
        reader = reader.option(k, v)
    if "partitionColumn" in opts and "lowerBound" not in opts:
        # probe bounds with a pushed-down min/max query (tiny result)
        probe = (
            spark.read.format("jdbc")
            .option("url", cfg.url)
            .option(
                "query",
                f"SELECT MIN({opts['partitionColumn']}) lo, "
                f"MAX({opts['partitionColumn']}) hi FROM {table}",
            )
            .load()
            .first()
        )
        reader = reader.option("lowerBound", str(probe["lo"])).option(
            "upperBound", str(probe["hi"])
        )
    return reader.load()


def rows_to_snapshot_events(
    rows: DataFrame, table: str, key_columns: tuple[str, ...],
    topic_prefix: str = "cdc", lsn: int = 0,
) -> DataFrame:
    """Wrap raw row images as op='r' envelope events (the snapshot phase
    emits READ events; MilvusChangeConsumer.java:133-146 treats them as
    upserts). Works for any row source — JDBC, parquet, CSV."""
    destination = f"{topic_prefix}.{table}"
    key = F.struct(*[F.col(c) for c in key_columns])
    after = F.struct(*[F.col(c) for c in rows.columns])
    source = F.struct(
        F.lit("1.0").alias("version"),
        F.lit("spark-jdbc").alias("connector"),
        F.lit(topic_prefix).alias("name"),
        (F.unix_millis(F.current_timestamp())).alias("ts_ms"),
        F.lit(None).cast("string").alias("db"),
        F.lit(table.split(".")[0] if "." in table else None).alias("schema"),
        F.lit(table.split(".")[-1]).alias("table"),
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit("true").alias("snapshot"),
    ).cast(SOURCE_SCHEMA)
    # `before` is NULL for READ events — typed null via a never-true when
    value = F.struct(
        F.lit("r").alias("op"),
        F.when(F.lit(False), after).alias("before"),
        after.alias("after"),
        source.alias("source"),
        F.unix_millis(F.current_timestamp()).alias("ts_ms"),
    )
    return rows.select(
        F.lit(destination).alias("destination"),
        key.alias("key"),
        value.alias("value"),
        F.lit(None).cast("array<struct<key:string,value:string>>").alias("headers"),
        F.lit(None).cast("int").alias("partition"),
    )


def serialize_events(events: DataFrame) -> DataFrame:
    """Typed envelope frame → serialized frame (key/value as JSON strings).

    This is the reference's `debezium.format.key/value=json` path
    (DebeziumSerializationProducer.java:60-68): once serialized, events
    from tables with different row schemas share one transport schema and
    can ride a single union/stream, exactly like serialized BatchEvents."""
    return events.select(
        "destination",
        F.to_json("key").alias("key"),
        F.to_json("value").alias("value"),
        "headers",
        "partition",
    )


def snapshot_events(spark: SparkSession, cfg: SnapshotConfig) -> DataFrame:
    """Full snapshot phase: every included table as one unioned event
    stream (per-table frames stay independent partitions — no shuffle).

    Heterogeneous row schemas cannot share one typed envelope column, so
    the union rides the serialized (JSON key/value) frame. For a single
    table, prefer `rows_to_snapshot_events` directly to stay typed."""
    frames = []
    for table in cfg.included_tables():
        rows = snapshot_table(spark, cfg, table)
        frames.append(
            serialize_events(
                rows_to_snapshot_events(
                    rows, table, cfg.key_columns.get(table, ("id",)), cfg.topic_prefix
                )
            )
        )
    if not frames:
        raise ValueError("no tables selected for snapshot")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=False)
    return out
