"""Pipeline runtime: source → SMT chain → route → foreachBatch sink.

The Spark shape of the reference's event path (SURVEY.md §3.2):
`readStream (CDC source) → select/withColumn chain (SMTs) → router →
writeStream.foreachBatch(sink).option("checkpointLocation", ...)`. The
foreachBatch epoch id replaces per-record `record.commit()`
(KafkaChangeConsumer.java:144): checkpointed offsets give at-least-once,
and idempotent sinks (parquet/Delta merge keyed by epoch) upgrade it to
effectively-once.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

SinkFn = Callable[[DataFrame, int], None]
Stage = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """A configured pipeline: composable stages over a streaming frame."""

    source: DataFrame  # streaming DataFrame in event_schema shape
    stages: list[Stage] = field(default_factory=list)

    def transform(self, stage: Stage) -> "Pipeline":
        return Pipeline(self.source, [*self.stages, stage])

    def plan(self) -> DataFrame:
        df = self.source
        for stage in self.stages:
            df = stage(df)
        return df

    def start(
        self,
        sink: SinkFn,
        checkpoint_location: str,
        trigger_available_now: bool = True,
        query_name: str = "cdc-pipeline",
        signal_channel=None,
        lineage_emitter=None,
    ) -> StreamingQuery:
        """`signal_channel` (streaming.signals.SignalChannel) is polled
        between micro-batches — the reference's control path (§3.3) with
        the query itself as handler context, so a `stop` signal lands at
        the next batch boundary. `lineage_emitter`
        (streaming.lineage.LineageEmitter) emits an OpenLineage RunEvent
        per successful epoch (DefaultChangeConsumer.java:71-93 analog)."""
        if lineage_emitter is not None:
            from debezium_server_spark.streaming.lineage import with_lineage

            sink = with_lineage(sink, lineage_emitter)
        if signal_channel is None:
            batch_fn = sink
        else:
            query_ref: list[StreamingQuery] = []

            def batch_fn(df: DataFrame, epoch_id: int) -> None:
                signal_channel.poll(query_ref[0] if query_ref else None)
                sink(df, epoch_id)

        plan = self.plan()
        plan = self._with_observation(plan)
        writer = (
            plan.writeStream.queryName(query_name)
            .foreachBatch(batch_fn)
            .option("checkpointLocation", checkpoint_location)
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        if signal_channel is not None:
            query_ref.append(query)
        return query

    @staticmethod
    def _with_observation(df: DataFrame) -> DataFrame:
        """Free per-batch counters via `df.observe` — computed inside the
        batch job itself (no second pass, no driver loop) and surfaced
        through StreamingQueryProgress.observedMetrics →
        PipelineMetricsListener. Mirrors the reference's queue/han-
        dled-event counters (DebeziumMetrics.java:106-144). Op-level
        counts only exist while the frame still carries the typed value
        struct (i.e. before a binary serialization stage)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        exprs = [F.count(F.lit(1)).alias("rows")]
        try:
            value_type = df.schema["value"].dataType
        except KeyError:
            value_type = None
        if isinstance(value_type, T.StructType) and "op" in value_type.names:
            exprs += [
                F.sum(F.col("value").isNull().cast("long")).alias("tombstones"),
                F.sum((F.col("value.op") == "d").cast("long")).alias("deletes"),
                F.sum((F.col("value.op") == "r").cast("long")).alias("snapshot_reads"),
            ]
        return df.observe("cdc_pipeline", *exprs)

    def run_batch(self, sink: SinkFn, epoch_id: int = 0) -> None:
        """Run the same pipeline over a batch (non-streaming) frame — the
        snapshot phase uses this before switching to streaming."""
        sink(self.plan(), epoch_id)
