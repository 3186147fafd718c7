"""REST control sidecar: the reference's HTTP surface on the driver.

Reference endpoints:
- `POST /api/signals` `{id,type,data}` → engine signal
  (SignalResource.java:32-43, DSSignal.java:10), 404/503 when disabled
  (DebeziumServerConfig.java:15-18).
- `GET /q/health` → liveness (CI smoke, cross-maven.yml:152-153).

Spark-first: the sidecar is a tiny stdlib `http.server` thread on the
driver that (a) writes posted signals into the `SignalChannel` directory
— the pipeline consumes them at the next micro-batch boundary — and
(b) serves health/metrics from the `PipelineMetricsListener`. Pure
control plane: no event data flows through it, so driver-side is the
right place at any scale.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from debezium_server_spark.streaming.signals import Signal, SignalChannel


class ControlSidecar:
    def __init__(
        self,
        signal_dir: str,
        metrics_listener=None,
        host: str = "127.0.0.1",
        port: int = 0,
        api_enabled: bool = True,
    ) -> None:
        self.signal_dir = signal_dir
        self.metrics_listener = metrics_listener
        self.api_enabled = api_enabled
        sidecar = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                if self.path == "/q/health":
                    self._send(200, {"status": "UP"})
                elif self.path == "/q/metrics":
                    m = sidecar.metrics_listener
                    if m is None:
                        self._send(200, {"queries": {}})
                    else:
                        self._send(
                            200,
                            {
                                "queries": {
                                    qid: {
                                        "name": q.name,
                                        "active": q.active,
                                        "snapshot_completed": q.snapshot_completed,
                                        "n_batches": q.n_batches,
                                        "total_input_rows": q.total_input_rows,
                                        "ms_behind_source": q.ms_behind_source,
                                    }
                                    for qid, q in m.all().items()
                                }
                            },
                        )
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self) -> None:
                if self.path != "/api/signals":
                    self._send(404, {"error": "not found"})
                    return
                if not sidecar.api_enabled:
                    # the reference 404s when the API is disabled
                    self._send(404, {"error": "api disabled"})
                    return
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    raw = json.loads(self.rfile.read(n) or b"{}")
                    sig = Signal(
                        id=str(raw["id"]), type=str(raw["type"]),
                        data=raw.get("data") or {},
                    )
                except (json.JSONDecodeError, KeyError):
                    self._send(400, {"error": "signal needs id and type"})
                    return
                SignalChannel.post(sidecar.signal_dir, sig)
                self._send(202, {"accepted": sig.id})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "ControlSidecar":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
