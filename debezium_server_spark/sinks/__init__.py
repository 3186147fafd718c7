"""Sink framework: BaseSink lifecycle + registry, mirroring the reference's
DebeziumServerConsumer surface (validateConnection → configure → handle* →
close, api/DebeziumServerSink.java:22-28) re-expressed as foreachBatch
writers."""

from debezium_server_spark.sinks.base import BaseSink, SINK_REGISTRY, register_sink, get_sink  # noqa: F401

# Import sink modules for their @register_sink side effects so
# `get_sink(name)` resolves every built-in (the reference's CDI @Named
# discovery analog, ChangeConsumerProducer.java:61-90).
from debezium_server_spark.sinks import (  # noqa: E402,F401
    aws_sinks as _aws_sinks,
    corpus_sink as _corpus_sink,
    dbapi_sink as _dbapi_sink,
    http_sink as _http_sink,
    instructlab_sink as _instructlab_sink,
    kafka_sink as _kafka_sink,
    kv_sink as _kv_sink,
    messaging_sinks as _messaging_sinks,
    parquet_sink as _parquet_sink,
    redis_sink as _redis_sink,
    vector_sink as _vector_sink,
)
