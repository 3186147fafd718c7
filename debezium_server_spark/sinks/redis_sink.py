"""Redis Streams sink (reference: RedisStreamChangeConsumer.java, 653 LoC).

Re-expressed behaviors:
- XADD per event into a stream named by destination, pipelined per chunk
  (:158-276; batch 500 RedisStreamChangeConsumerConfig.java:21-23),
- compact `{key: value}` vs extended `{key,value,headers...}` message
  formats (:100-135, config :33-37),
- null key/value defaulting (:100-101,114-115),
- OOM partial retry: failed XADDs retried alone (:228-260),
- memory-threshold backpressure: pause before writing while used_memory
  is above the limit (RedisMemoryThreshold.java:57-88).

redis-py is not in this container → `make_client` raises unless dry-run;
the message-format shaping and backpressure logic are plain Python and
fully tested.
"""

from __future__ import annotations

import time
from typing import Any

from debezium_server_spark.sinks.base import register_sink
from debezium_server_spark.sinks.remote import RemoteBulkSink


def build_message(record: dict[str, Any], message_format: str = "compact",
                  null_key: str = "default", null_value: str = "{}") -> dict[str, str]:
    """Shape one XADD field map (compact vs extended)."""
    key = record.get("key_json") or null_key
    value = record.get("value_json") or null_value
    if message_format == "compact":
        return {key: value}
    fields = {"key": key, "value": value}
    for hk, hv in (record.get("headers_map") or {}).items():
        fields[f"header.{hk}"] = hv or ""
    return fields


class MemoryThreshold:
    """Backpressure: wait until used memory is below the limit
    (RedisMemoryThreshold.java:57-88). `info_fn` returns (used, max)."""

    def __init__(self, info_fn, limit_mb: int = 0, wait_s: float = 1.0, max_checks: int = 30):
        self.info_fn = info_fn
        self.limit_bytes = limit_mb * 1024 * 1024
        self.wait_s = wait_s
        self.max_checks = max_checks

    def wait_until_writable(self, sleep=time.sleep) -> bool:
        if self.limit_bytes <= 0:
            return True  # disabled (default limit 0, config :39-45)
        for _ in range(self.max_checks):
            used, _maxmem = self.info_fn()
            if used < self.limit_bytes:
                return True
            sleep(self.wait_s)
        return False


@register_sink
class RedisStreamSink(RemoteBulkSink):
    name = "redis"
    batch_size = 500

    def __init__(self, address: str = "localhost:6379", message_format: str = "compact",
                 memory_limit_mb: int = 0, **kwargs: Any):
        super().__init__(**kwargs)
        self.address = self.config.get("address", address)
        self.message_format = self.config.get("message.format", message_format)
        self.memory_limit_mb = int(self.config.get("memory.limit.mb", memory_limit_mb))

    def make_client(self) -> Any:
        try:
            import redis  # noqa: F401
        except ImportError as exc:
            raise RuntimeError(
                "redis-py not installed; use dry_run_dir for offline runs"
            ) from exc
        host, _, port = self.address.partition(":")
        return redis.Redis(host=host, port=int(port or 6379))

    def send_chunk(self, client: Any, records: list[dict[str, Any]]) -> list[int]:
        if self.memory_limit_mb > 0:
            info = client.info("memory")
            threshold = MemoryThreshold(
                lambda: (info["used_memory"], info.get("maxmemory", 0)),
                self.memory_limit_mb,
            )
            threshold.wait_until_writable()
        pipe = client.pipeline(transaction=False)
        for r in records:
            pipe.xadd(r["destination"], build_message(r, self.message_format,
                                                      self.null_key, self.null_value or "{}"))
        results = pipe.execute(raise_on_error=False)
        return [i for i, res in enumerate(results) if isinstance(res, Exception)]
