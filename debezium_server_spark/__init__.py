"""PySpark-native CDC pipeline engine.

A brand-new engine with the query and data-processing capabilities of
Debezium Server (see SURVEY.md for the structural analysis of the
reference): keyed change-event streams with `{op, before, after, source}`
envelopes, declaratively configured single-message transforms, predicates
and content-based routing, and pluggable sinks with at-least-once delivery
made idempotent via checkpointed micro-batch merges.

Everything is expressed Spark-first: DataFrames + Catalyst for the
pipeline algebra, Structured Streaming for the stream runtime, and
built-in `pyspark.sql.functions` (JVM-side, codegen'd) for the hot path.
"""

__version__ = "0.1.0"

from debezium_server_spark.session import get_spark  # noqa: F401
