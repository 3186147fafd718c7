"""Runtime control signals.

Reference: `POST /api/signals` with `{id, type, data}` → engine signal
(SignalResource.java:32-43, DSSignal.java:10); used for `log` lines and
incremental-snapshot triggers; gated by `debezium.api.enabled`
(DebeziumServerConfig.java:12-18).

Spark-first mapping (SURVEY.md §3.3): signals land as JSON files in a
control directory (one file per signal — any REST sidecar or operator
`echo > dir` can produce them); the driver polls the directory between
micro-batches (`Pipeline` wires `poll()` into `foreachBatch`). Control
data is tiny by construction, so driver-side handling is correct here —
this is the one place a driver loop is the right design.

Built-in signal types:
- `log`      — log `data["message"]`
- `stop`     — graceful `query.stop()`
- `snapshot` — re-run a snapshot callback (incremental-snapshot analog)
Custom types via `register(type, handler)`.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

log = logging.getLogger(__name__)

Handler = Callable[["Signal", Any], None]


@dataclass
class Signal:
    id: str
    type: str
    data: dict = field(default_factory=dict)


class SignalChannel:
    """File-backed signal channel with at-most-once dispatch per signal id
    (processed ids are remembered; re-posting a new id re-triggers)."""

    def __init__(self, signal_dir: str, enabled: bool = True) -> None:
        self.signal_dir = signal_dir
        self.enabled = enabled  # debezium.api.enabled analog
        self._seen: set[str] = set()
        self._handlers: dict[str, Handler] = {
            "log": self._handle_log,
            "stop": self._handle_stop,
        }

    def register(self, signal_type: str, handler: Handler) -> None:
        self._handlers[signal_type] = handler

    @staticmethod
    def post(signal_dir: str, signal: Signal) -> str:
        """Producer side (what the REST sidecar would do)."""
        os.makedirs(signal_dir, exist_ok=True)
        path = os.path.join(signal_dir, f"{signal.id}.json")
        with open(path, "w") as f:
            json.dump({"id": signal.id, "type": signal.type, "data": signal.data}, f)
        return path

    def poll(self, context: Any = None) -> list[Signal]:
        """Read new signals and dispatch them. `context` is passed to the
        handlers (a StreamingQuery for stop, anything for custom types).
        Returns the signals dispatched this call."""
        if not self.enabled or not os.path.isdir(self.signal_dir):
            return []
        dispatched: list[Signal] = []
        for name in sorted(os.listdir(self.signal_dir)):
            if not name.endswith(".json"):
                continue
            path = os.path.join(self.signal_dir, name)
            try:
                with open(path) as f:
                    raw = json.load(f)
                sig = Signal(
                    id=str(raw.get("id", name)),
                    type=str(raw.get("type", "")),
                    data=raw.get("data") or {},
                )
            except (json.JSONDecodeError, OSError) as e:
                log.warning("signals: unreadable %s: %s", path, e)
                continue
            if sig.id in self._seen:
                continue
            self._seen.add(sig.id)
            handler = self._handlers.get(sig.type)
            if handler is None:
                log.warning("signals: no handler for type %r (id=%s)", sig.type, sig.id)
                continue
            handler(sig, context)
            dispatched.append(sig)
        return dispatched

    @staticmethod
    def _handle_log(sig: Signal, _context: Any) -> None:
        log.info("signal[%s]: %s", sig.id, sig.data.get("message", ""))

    @staticmethod
    def _handle_stop(sig: Signal, context: Any) -> None:
        if context is not None and hasattr(context, "stop"):
            log.info("signal[%s]: stopping query", sig.id)
            context.stop()
