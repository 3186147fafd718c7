"""HTTP webhook sink (reference: HttpChangeConsumer.java, 1748 LoC).

Behaviors re-expressed:
- individual POST per event or aggregated JSON-array batches
  (HttpChangeConsumer.java:133-199, JSON aggregation :174-180),
- chunking by `batch.max.size` (:170-172),
- retries with interval (HttpChangeConsumerConfig.java:38,46),
- headers forwarded base64-encoded under an `X-DEBEZIUM-` prefix
  (HttpChangeConsumerConfig.java:54-62),
- pluggable auth: static bearer / JWT-style / OAuth2 client-credentials
  / Standard-Webhooks HMAC / none (HttpChangeConsumer.java:201-310,
  OAuth2Authenticator.java, StandardWebhooksAuthenticator.java).

Auth protocol (the reference's Authenticator interface re-expressed):
`authenticate()` acquires/refreshes credentials before a send;
`headers(body, message_id)` contributes per-request headers (webhook
signing needs the exact body bytes and a fresh message id);
`on_unauthorized()` reacts to a 401 — OAuth2 drops its cached token so
the retry re-fetches (the refresh-on-expiry path plus server-side
revocation).

The HTTP I/O itself rides the RemoteBulkSink partition/chunk/retry frame.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import uuid as uuid_mod
from typing import Any
from urllib.parse import urlencode

from debezium_server_spark.sinks.base import register_sink
from debezium_server_spark.sinks.remote import RemoteBulkSink

CONTENT_TYPES = {  # by serialization format (HttpChangeConsumer.java:104-110)
    "json": "application/json",
    "avro": "application/avro",
    "protobuf": "application/octet-stream",
    "jsonbytearray": "application/json",
}


class AuthProvider:
    def authenticate(self) -> None:
        """Acquire/refresh credentials; called before every send."""

    def headers(self, body: str = "", message_id: str | None = None) -> dict[str, str]:
        return {}

    def on_unauthorized(self) -> bool:
        """React to a 401. Return True if a retry could now succeed."""
        return False


class StaticTokenAuth(AuthProvider):
    def __init__(self, token: str):
        self.token = token

    def headers(self, body: str = "", message_id: str | None = None) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token}"}


class JwtAuth(AuthProvider):
    """JWT auth shape (JWTAuthenticatorTest analog): token minted from
    (url, username, password) and refreshed when expired. The mint step
    is delegated so tests can inject a fake token service."""

    def __init__(self, token_fn):
        self.token_fn = token_fn
        self._token: str | None = None

    def headers(self, body: str = "", message_id: str | None = None) -> dict[str, str]:
        if self._token is None:
            self._token = self.token_fn()
        return {"Authorization": f"Bearer {self._token}"}

    def on_unauthorized(self) -> bool:
        self._token = None  # re-mint on the retry
        return True


class OAuth2Auth(AuthProvider):
    """OAuth2 client_credentials grant (RFC 6749 §4.4), matching
    OAuth2Authenticator.java semantics:

    - token cached until 0.9 × expires_in elapses (expiration buffer),
    - client auth via `client_secret_basic` (Basic header, default) or
      `client_secret_post` (credentials in the form body),
    - standard POST form-urlencoded body `grant_type=client_credentials`
      (+ optional scope + additional params); non-standard GET mode
      sends Basic credentials with no body,
    - a 401 from the data endpoint drops the cached token so the retry
      re-fetches.

    `transport(method, url, headers, body, timeout_s) -> (status, text)`
    is injectable for tests; the default uses `requests`.
    """

    EXPIRATION_BUFFER = 0.9

    def __init__(self, token_url: str, client_id: str, client_secret: str,
                 scope: str | None = None,
                 additional_params: dict[str, str] | None = None,
                 client_auth_method: str = "client_secret_basic",
                 token_http_method: str = "POST",
                 timeout_s: float = 60.0,
                 clock=time.time, transport=None):
        if client_auth_method not in ("client_secret_basic", "client_secret_post"):
            raise ValueError(f"unknown client_auth_method: {client_auth_method}")
        if token_http_method not in ("POST", "GET"):
            raise ValueError(f"unknown token_http_method: {token_http_method}")
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.additional_params = dict(additional_params or {})
        self.client_auth_method = client_auth_method
        self.token_http_method = token_http_method
        self.timeout_s = timeout_s
        self.clock = clock
        self.transport = transport or self._requests_transport
        self._token: str | None = None
        self._expires_at: float = 0.0

    def _requests_transport(self, method, url, headers, body, timeout_s):
        import requests

        resp = requests.request(method, url, headers=headers, data=body,
                                timeout=timeout_s)
        return resp.status_code, resp.text

    def _basic_credentials(self) -> str:
        raw = f"{self.client_id}:{self.client_secret}".encode()
        return "Basic " + base64.b64encode(raw).decode()

    def authenticate(self) -> None:
        if self._token is not None and self.clock() < self._expires_at:
            return
        headers: dict[str, str] = {}
        body = None
        if self.token_http_method == "GET":
            headers["Authorization"] = self._basic_credentials()
        else:
            form = [("grant_type", "client_credentials")]
            if self.scope:
                form.append(("scope", self.scope))
            if self.client_auth_method == "client_secret_post":
                form.append(("client_id", self.client_id))
                form.append(("client_secret", self.client_secret))
            form.extend(self.additional_params.items())
            body = urlencode(form)
            headers["Content-Type"] = "application/x-www-form-urlencoded"
            if self.client_auth_method == "client_secret_basic":
                headers["Authorization"] = self._basic_credentials()
        status, text = self.transport(
            self.token_http_method, self.token_url, headers, body, self.timeout_s
        )
        if not 200 <= status < 300:
            raise RuntimeError(
                f"OAuth2 token request failed with status {status}: {text}"
            )
        payload = json.loads(text)
        token = payload.get("access_token")
        if not token:
            raise RuntimeError("OAuth2 token response did not contain an access_token")
        self._token = token
        expires_in = float(payload.get("expires_in", 0))
        self._expires_at = self.clock() + self.EXPIRATION_BUFFER * expires_in

    def headers(self, body: str = "", message_id: str | None = None) -> dict[str, str]:
        if self._token is None:
            raise RuntimeError("must authenticate before setting authorization header")
        return {"Authorization": f"Bearer {self._token}"}

    def on_unauthorized(self) -> bool:
        self._token = None
        self._expires_at = 0.0
        return True


class StandardWebhooksAuth(AuthProvider):
    """Standard-Webhooks HMAC signing (StandardWebhooksAuthenticator.java;
    spec: standard-webhooks.md#signature-scheme):

    - secret is base64 after an optional `whsec_` prefix; the decoded
      key must be 24..64 bytes,
    - per request: `webhook-id` = msg_<uuid>, `webhook-timestamp` =
      epoch seconds, `webhook-signature` = `v1,` +
      base64(HMAC-SHA256(key, "{id}.{ts}.{body}")).
    """

    SECRET_PREFIX = "whsec_"

    def __init__(self, secret: str, clock=time.time):
        sec = secret
        if sec.startswith(self.SECRET_PREFIX):
            sec = sec[len(self.SECRET_PREFIX):]
        self.key = base64.b64decode(sec)
        if not 24 <= len(self.key) <= 64:
            raise ValueError("Webhook secret must be between 24 and 64 bytes")
        self.clock = clock

    def sign(self, msg_id: str, timestamp: int, payload: str) -> str:
        to_sign = f"{msg_id}.{timestamp}.{payload}".encode()
        mac = hmac.new(self.key, to_sign, hashlib.sha256).digest()
        return "v1," + base64.b64encode(mac).decode()

    def headers(self, body: str = "", message_id: str | None = None) -> dict[str, str]:
        ts = int(self.clock())
        msg_id = f"msg_{message_id or uuid_mod.uuid4()}"
        return {
            "webhook-id": msg_id,
            "webhook-timestamp": str(ts),
            "webhook-signature": self.sign(msg_id, ts, body),
        }


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
        return s

    def _post(self, client: Any, body: str, event_headers: dict[str, str]) -> bool:
        """One POST with the full auth protocol: authenticate → sign with
        the body + a fresh message id (HttpChangeConsumer.java:138,214-215)
        → on 401, let the provider invalidate and retry once."""
        for attempt in (0, 1):
            self.auth.authenticate()
            headers = dict(event_headers)
            headers.update(self.auth.headers(body, str(uuid_mod.uuid4())))
            resp = client.post(self.url, data=body, timeout=self.timeout_s,
                               headers=headers)
            if resp.status_code == 401 and attempt == 0 and self.auth.on_unauthorized():
                continue
            return resp.ok
        return False

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
            ok = self._post(client, body,
                            self.debezium_headers(records[0].get("headers_map")))
            return [] if ok else list(range(len(records)))
        failed = []
        for i, r in enumerate(records):
            ok = self._post(client, r["value_json"] or "null",
                            self.debezium_headers(r.get("headers_map")))
            if not ok:
                failed.append(i)
        return failed
