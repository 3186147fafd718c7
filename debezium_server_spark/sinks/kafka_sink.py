"""Kafka sink (reference: KafkaChangeConsumer.java:46-150).

Spark-first: Kafka is a BUILT-IN structured sink — the entire async-send
+ await-futures machinery of the reference (:101-149) is the Kafka
producer inside Spark's sink. Our job is only the frame mapping
(`topic/key/value/headers` columns) and config passthrough
(`debezium.sink.kafka.producer.*` → `kafka.*` options).

Requires the spark-sql-kafka package on the classpath; `validate_connection`
reports absence instead of failing mid-stream.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_server_spark.sinks.base import BaseSink, ConnectionValidationResult, register_sink


def to_kafka_frame(df: DataFrame) -> DataFrame:
    """Map the change-event frame to Spark's Kafka sink columns. The
    `headers` column maps 1:1 (same array<struct<key,value>> shape, value
    as binary); partition hint passes through."""
    return df.select(
        F.col("destination").alias("topic"),
        F.to_json(F.col("key")).cast("binary").alias("key"),
        F.to_json(F.col("value")).cast("binary").alias("value"),
        F.when(
            F.col("headers").isNotNull(),
            F.transform(
                F.col("headers"),
                lambda h: F.struct(
                    h["key"].alias("key"), h["value"].cast("binary").alias("value")
                ),
            ),
        ).alias("headers"),
        F.col("partition"),
    )


@register_sink
class KafkaSink(BaseSink):
    name = "kafka"
    tombstone_support = True  # tombstones are meaningful in compacted topics

    def __init__(self, bootstrap_servers: str = "localhost:9092", **kwargs: Any):
        super().__init__(**kwargs)
        self.bootstrap_servers = self.config.get("bootstrap.servers", bootstrap_servers)

    def producer_options(self) -> dict[str, str]:
        """`debezium.sink.kafka.producer.*` → `kafka.*` options
        (KafkaChangeConsumer.java config remap)."""
        opts = {"kafka.bootstrap.servers": self.bootstrap_servers}
        for k, v in self.config.items():
            if k.startswith("producer."):
                opts["kafka." + k.removeprefix("producer.")] = v
        return opts

    def validate_connection(self) -> ConnectionValidationResult:
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            # probe for the kafka sink provider without starting a write
            spark._jvm.Class.forName(  # type: ignore[union-attr]
                "org.apache.spark.sql.kafka010.KafkaSourceProvider"
            )
            return ConnectionValidationResult(True)
        except Exception as exc:  # noqa: BLE001
            return ConnectionValidationResult(
                False, f"spark-sql-kafka not on classpath: {exc}"
            )

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        frame = to_kafka_frame(df)
        writer = frame.write.format("kafka")
        for k, v in self.producer_options().items():
            writer = writer.option(k, v)
        writer.save()
