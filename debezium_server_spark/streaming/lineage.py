"""OpenLineage-shaped dataset emit per sink epoch.

Reference: DefaultChangeConsumer.java:71-93 — after a batch is handed to
the sink, emit one OUTPUT DatasetMetadata per delivered record (dataset
name = mapped destination, field definitions from the record schema).

Spark-first reshaping: per-record emit is redundant (every record of a
destination shares name + schema) and would be a driver-side loop over
the batch; the equivalent signal at micro-batch granularity is one
RunEvent per epoch listing each distinct destination as an output
dataset with its schema facet. Destinations come from one distinct()
over the batch (bounded by |destinations|, the same driver-side set the
routing sinks already collect); the schema facet comes from the static
frame schema (no data pass at all).

Events append to a lineage "table": one JSON file per (job, epoch)
written atomically — readable back as a DataFrame via `read_lineage`,
and line-compatible with an OpenLineage HTTP transport (each file is one
RunEvent document).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PRODUCER = "debezium-server-spark"
#: OpenLineage spec version the event shape follows (public spec).
SCHEMA_URL = "https://openlineage.io/spec/1-0-5/OpenLineage.json"


def field_definitions(schema: T.StructType) -> list[dict[str, str]]:
    """Schema facet fields from the envelope's `value.after` struct (the
    reference's datasetDataExtractor reads the record value schema)."""
    try:
        value_type = schema["value"].dataType
        after_type = value_type["after"].dataType
    except KeyError:
        return []
    if not isinstance(after_type, T.StructType):
        return []
    return [
        {"name": f.name, "type": f.dataType.simpleString()}
        for f in after_type.fields
    ]


@dataclass
class LineageEmitter:
    """Writes one OpenLineage RunEvent per epoch after the sink commits.

    `run_id` is deterministic on (job_name, epoch): a replayed epoch
    overwrites its own event instead of double-reporting (the lineage
    analog of the sinks' epoch idempotence).
    """

    root: str
    job_name: str = "cdc-pipeline"
    namespace: str = "debezium-server-spark"
    clock: "callable" = field(default=time.time)

    def emit_batch(self, df: DataFrame, epoch_id: int, sink_name: str) -> dict:
        destinations = sorted(
            r[0] for r in df.select("destination").distinct().collect()
        )
        fields = field_definitions(df.schema)
        event = {
            "eventType": "COMPLETE",
            "eventTime": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(self.clock())
            ),
            "producer": PRODUCER,
            "schemaURL": SCHEMA_URL,
            "run": {
                "runId": str(
                    uuid.uuid5(uuid.NAMESPACE_URL,
                               f"{self.namespace}/{self.job_name}/{epoch_id}")
                )
            },
            "job": {"namespace": self.namespace, "name": self.job_name},
            "inputs": [],
            "outputs": [
                {
                    "namespace": sink_name,
                    "name": dest,
                    "facets": {"schema": {"fields": fields}},
                }
                for dest in destinations
            ],
        }
        os.makedirs(self.root, exist_ok=True)
        final = os.path.join(self.root, f"{self.job_name}-{epoch_id}.json")
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(event, f)
        os.replace(tmp, final)
        return event


def with_lineage(sink, emitter: LineageEmitter):
    """Wrap a SinkFn so every successful epoch emits its lineage event —
    emit happens AFTER the sink handles the batch, never on failure
    (DefaultChangeConsumer.java:64-77: handle first, lineage second)."""
    sink_name = getattr(sink, "name", type(sink).__name__)

    def wrapped(df: DataFrame, epoch_id: int) -> None:
        sink(df, epoch_id)
        emitter.emit_batch(df, epoch_id, sink_name)

    return wrapped


def read_lineage(spark: SparkSession, root: str) -> DataFrame | None:
    """The lineage table: one row per (run, output dataset)."""
    if not os.path.isdir(root):
        return None
    files = [
        os.path.join(root, n)
        for n in sorted(os.listdir(root))
        if n.endswith(".json") and not n.endswith(".tmp")
    ]
    if not files:
        return None
    rows = []
    for p in files:
        with open(p) as f:
            ev = json.load(f)
        for out in ev["outputs"]:
            rows.append(
                (
                    ev["job"]["name"],
                    ev["run"]["runId"],
                    ev["eventTime"],
                    out["namespace"],
                    out["name"],
                    json.dumps(out["facets"]["schema"]["fields"]),
                )
            )
    return spark.createDataFrame(
        rows,
        "job string, run_id string, event_time string, "
        "sink string, dataset string, schema_fields string",
    )
