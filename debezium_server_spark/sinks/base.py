"""BaseSink: shared sink behaviors + the sink registry.

Reference surface:
- sink selection by name from `debezium.sink.type`
  (ChangeConsumerProducer.java:61-90) → a plain registry dict here,
- stream-name mapping injection (BaseChangeConsumer.java:35-46),
- header list → string map (BaseChangeConsumer.java:101-108),
- null key/value defaulting (RedisStreamChangeConsumer.java:100-101,
  KinesisChangeConsumer.java:151-156),
- tombstone capability (api/DebeziumServerConsumer.java:33-35),
- heartbeat skip (RedisStreamChangeConsumer.java:199-204),
- connection validation (api/DebeziumServerSink.java:83-86),
- lifecycle handle per batch (DefaultChangeConsumer.java:58-78).

Each sink is a `handle(df, epoch_id)` callable used inside
`writeStream.foreachBatch`; all row-level shaping stays declarative
(Column expressions) so it runs JVM-side.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.operators.envelope import drop_heartbeats, drop_tombstones

LOG = logging.getLogger(__name__)


class ConnectionValidationResult:
    def __init__(self, ok: bool, message: str = ""):
        self.ok = ok
        self.message = message


class BaseSink:
    """Lifecycle: validate_connection → configure → handle* → close."""

    name = "base"
    tombstone_support = False

    def __init__(self, config: dict[str, Any] | None = None,
                 stream_name_mapper: Callable[[Column], Column] | None = None):
        self.config = config or {}
        self.stream_name_mapper = stream_name_mapper
        self.heartbeat_prefix = self.config.get("heartbeat.prefix", "__debezium-heartbeat")
        self.null_key = self.config.get("null.key", "default")
        self.null_value = self.config.get("null.value")

    # -- lifecycle ---------------------------------------------------------
    def validate_connection(self) -> ConnectionValidationResult:
        return ConnectionValidationResult(True)

    def configure(self) -> None:
        pass

    def close(self) -> None:
        pass

    # -- shared row shaping (declarative, codegen'd) -------------------------
    def prepare(self, df: DataFrame) -> DataFrame:
        df = drop_heartbeats(df, self.heartbeat_prefix)
        if not self.tombstone_support:
            df = drop_tombstones(df)
        if self.stream_name_mapper is not None:
            df = df.withColumn("destination", self.stream_name_mapper(F.col("destination")))
        return df

    @staticmethod
    def headers_as_map(df: DataFrame, headers_col: str = "headers") -> DataFrame:
        """Header list → map (BaseChangeConsumer.java:101-108)."""
        return df.withColumn(
            headers_col + "_map",
            F.when(F.col(headers_col).isNotNull(), F.map_from_entries(F.col(headers_col))),
        )

    def with_null_defaults(self, df: DataFrame, key_col: str = "key") -> DataFrame:
        """Substitute configured defaults for null keys."""
        if self.null_key is None:
            return df
        return df.withColumn(
            key_col + "_str",
            F.coalesce(F.to_json(F.col(key_col)), F.lit(self.null_key)),
        )

    # -- per-batch delivery --------------------------------------------------
    def handle(self, df: DataFrame, epoch_id: int) -> None:
        raise NotImplementedError

    def __call__(self, df: DataFrame, epoch_id: int) -> None:
        self.handle(self.prepare(df), epoch_id)


SINK_REGISTRY: dict[str, type[BaseSink]] = {}


def register_sink(cls: type[BaseSink]) -> type[BaseSink]:
    SINK_REGISTRY[cls.name] = cls
    return cls


def get_sink(name: str, **kwargs: Any) -> BaseSink:
    """Resolve by name (`debezium.sink.type`), like
    ChangeConsumerProducer.produces() (ChangeConsumerProducer.java:61-90)."""
    try:
        cls = SINK_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown sink type {name!r}; available: {sorted(SINK_REGISTRY)}"
        ) from None
    return cls(**kwargs)


class FanoutSink(BaseSink):
    """Deliver each micro-batch to SEVERAL sinks from one source read.

    The reference runs one consumer per server instance; fanning out
    means re-reading the change stream once per destination system.
    Spark-first: persist the batch frame once, hand it to every child
    sink (each applies its own prepare(), so tombstone/heartbeat policy
    stays per-sink), unpersist. One scan + one cache write per batch,
    N deliveries. Delivery is sequential per batch — a child failure
    aborts the epoch BEFORE later sinks commit it, and the retry replays
    all children (each must stay idempotent, which epoch-keyed sinks
    are). At 100 TB the cache spills per-executor and never touches the
    driver."""

    name = "fanout"
    tombstone_support = True  # children decide; fanout must not pre-drop

    def __init__(self, sinks: list[BaseSink], **kwargs: Any):
        super().__init__(**kwargs)
        self.sinks = list(sinks)

    def validate_connection(self) -> ConnectionValidationResult:
        for s in self.sinks:
            res = s.validate_connection()
            if not res.ok:
                return res
        return ConnectionValidationResult(True)

    def prepare(self, df: DataFrame) -> DataFrame:
        return df  # children prepare themselves

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        df.persist()
        try:
            for sink in self.sinks:
                sink(df, epoch_id)
        finally:
            df.unpersist()

    def close(self) -> None:
        for s in self.sinks:
            s.close()
