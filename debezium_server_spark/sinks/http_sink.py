"""HTTP webhook sink (reference: HttpChangeConsumer.java, 1748 LoC).

Behaviors re-expressed:
- individual POST per event or aggregated JSON-array batches
  (HttpChangeConsumer.java:133-199, JSON aggregation :174-180),
- chunking by `batch.max.size` (:170-172),
- retries with interval (HttpChangeConsumerConfig.java:38,46),
- headers forwarded base64-encoded under an `X-DEBEZIUM-` prefix
  (HttpChangeConsumerConfig.java:54-62),
- pluggable auth: static bearer / JWT-style / none
  (HttpChangeConsumer.java:237-300).

The HTTP I/O itself rides the RemoteBulkSink partition/chunk/retry frame.
"""

from __future__ import annotations

import base64
import json
from typing import Any

from debezium_server_spark.sinks.base import register_sink
from debezium_server_spark.sinks.remote import RemoteBulkSink

CONTENT_TYPES = {  # by serialization format (HttpChangeConsumer.java:104-110)
    "json": "application/json",
    "avro": "application/avro",
    "protobuf": "application/octet-stream",
    "jsonbytearray": "application/json",
}


class AuthProvider:
    def headers(self) -> dict[str, str]:
        return {}


class StaticTokenAuth(AuthProvider):
    def __init__(self, token: str):
        self.token = token

    def headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token}"}


class JwtAuth(AuthProvider):
    """JWT auth shape (JWTAuthenticatorTest analog): token minted from
    (url, username, password) and refreshed when expired. The mint step
    is delegated so tests can inject a fake token service."""

    def __init__(self, token_fn):
        self.token_fn = token_fn
        self._token: str | None = None

    def headers(self) -> dict[str, str]:
        if self._token is None:
            self._token = self.token_fn()
        return {"Authorization": f"Bearer {self._token}"}


@register_sink
class HttpSink(RemoteBulkSink):
    name = "http"
    batch_size = 500

    def __init__(self, url: str = "", mode: str = "aggregated",
                 value_format: str = "json", auth: AuthProvider | None = None,
                 timeout_s: float = 60.0, **kwargs: Any):
        super().__init__(**kwargs)
        self.url = self.config.get("url", url)  # Knative K_SINK analog
        self.mode = mode  # "individual" | "aggregated"
        self.value_format = value_format
        self.auth = auth or AuthProvider()
        self.timeout_s = float(self.config.get("timeout.s", timeout_s))
        if self.mode == "aggregated":
            self.batch_size = int(self.config.get("batch.max.size", self.batch_size))
        else:
            self.batch_size = 1

    def make_client(self) -> Any:
        import requests

        s = requests.Session()
        s.headers["Content-Type"] = CONTENT_TYPES.get(self.value_format, "application/json")
        s.headers.update(self.auth.headers())
        return s

    @staticmethod
    def debezium_headers(headers_map: dict[str, str] | None) -> dict[str, str]:
        """Event headers → base64-encoded X-DEBEZIUM-* HTTP headers
        (HttpChangeConsumerConfig.java:54-62)."""
        out = {}
        for k, v in (headers_map or {}).items():
            out[f"X-DEBEZIUM-{k.upper()}"] = base64.b64encode(
                (v or "").encode()
            ).decode()
        return out

    def send_chunk(self, client: Any, records: list[dict[str, Any]]) -> list[int]:
        if self.mode == "aggregated":
            # one JSON array body for the whole chunk (:174-180)
            body = "[" + ",".join(r["value_json"] or "null" for r in records) + "]"
            resp = client.post(self.url, data=body, timeout=self.timeout_s,
                               headers=self.debezium_headers(records[0].get("headers_map")))
            return [] if resp.ok else list(range(len(records)))
        failed = []
        for i, r in enumerate(records):
            resp = client.post(self.url, data=r["value_json"] or "null",
                               timeout=self.timeout_s,
                               headers=self.debezium_headers(r.get("headers_map")))
            if not resp.ok:
                failed.append(i)
        return failed
