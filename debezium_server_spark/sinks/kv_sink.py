"""Keyed KV sink (reference: InfinispanSinkConsumer.java:44-121 — cache
putAll, last-write-wins upsert) and the JDBC/Fluss table-sink aliases.

Infinispan's putAll is exactly the PK-upsert shape with arrival-order
LWW; JDBC (insert/upsert modes, JdbcChangeConsumer.java:102-172) and
Fluss (PK upsert/append modes, FlussChangeConsumer.java:256-282) share
the same semantics with different targets. All three ride the versioned-
parquet materializer; a real deployment swaps the table for hotrod/
Hibernate/Fluss clients with identical pipeline-side behavior. JDBC can
also target a live database via Spark's built-in `df.write.jdbc`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.sinks.base import register_sink
from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink


@register_sink
class KvSink(ParquetUpsertSink):
    name = "infinispan"


@register_sink
class FlussSink(ParquetUpsertSink):
    """Fluss PK modes: auto (PK table → upsert, else append) / upsert /
    append (FlussChangeConsumer.java:256-282)."""

    name = "fluss"

    def __init__(self, root_path: str, primary_key_mode: str = "auto", **kwargs: Any):
        super().__init__(root_path, **kwargs)
        self.primary_key_mode = primary_key_mode

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        mode = self.primary_key_mode
        if mode == "auto":
            mode = "append" if not self.key_fields else "upsert"
        if mode == "append":
            from debezium_server_spark.sinks.parquet_sink import ParquetAppendSink

            ParquetAppendSink(self.root_path).handle(df, epoch_id)
        else:
            super().handle(df, epoch_id)


@register_sink
class JdbcSink(ParquetUpsertSink):
    """JDBC sink: local materialization by default; `jdbc_url` switches to
    Spark's built-in JDBC writer (append mode; upsert needs a MERGE-
    capable target — documented limitation, as in the reference's
    insert-mode matrix)."""

    name = "jdbc"

    def __init__(self, root_path: str, jdbc_url: str | None = None,
                 jdbc_table: str | None = None, **kwargs: Any):
        super().__init__(root_path, **kwargs)
        self.jdbc_url = jdbc_url
        self.jdbc_table = jdbc_table

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        if self.jdbc_url:
            flat = df.filter(F.col("value").isNotNull()).select(F.col("value.after.*"))
            flat.write.mode("append").jdbc(self.jdbc_url, self.jdbc_table or "events")
            return
        super().handle(df, epoch_id)
