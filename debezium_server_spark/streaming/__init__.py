from debezium_server_spark.streaming.metrics import PipelineMetricsListener
from debezium_server_spark.streaming.pipeline import Pipeline
from debezium_server_spark.streaming.signals import Signal, SignalChannel
from debezium_server_spark.streaming.stateful import (
    exactly_once_dedup,
    running_key_stats,
    windowed_event_counts,
)

__all__ = [
    "Pipeline",
    "PipelineMetricsListener",
    "Signal",
    "SignalChannel",
    "exactly_once_dedup",
    "running_key_stats",
    "windowed_event_counts",
]
