"""Configuration layer with debezium.*-style namespace semantics.

Reference behaviors (DebeziumServerConfigSourceFactory.java:73-155):
- `debezium.source.*` remapped into the engine namespace,
- sink properties reused as defaults for offset/schema-history storage
  (:89-104),
- env-var normalization `A_B_C` → `a.b.c` (:161-169),
- empty-string sentinel preserved (:152, EmptyStringConverter.java:19-28),
- prefix subsetting for per-component views (BaseChangeConsumer.java:57-68).

Plain Python — no Spark analog needed (SURVEY.md §2.2).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

EMPTY_SENTINEL = "__EMPTY_STRING__"


class PipelineConfig:
    """Flat dotted-key config with namespace remapping."""

    def __init__(self, props: Mapping[str, str] | None = None, env: Mapping[str, str] | None = None):
        self._props: dict[str, str] = {}
        for k, v in (env if env is not None else os.environ).items():
            if k.startswith("DEBEZIUM_"):
                self._props[self.normalize_env_key(k)] = v
        for k, v in (props or {}).items():
            self._props[k] = v

    @staticmethod
    def normalize_env_key(key: str) -> str:
        """`DEBEZIUM_SINK_TYPE` → `debezium.sink.type`."""
        return key.lower().replace("_", ".")

    def get(self, key: str, default: str | None = None) -> str | None:
        v = self._props.get(key, default)
        return "" if v == EMPTY_SENTINEL else v

    def require(self, key: str) -> str:
        v = self.get(key)
        if v is None:
            # Reference exits when debezium.sink.type is missing
            # (DebeziumConfiguration.java:24-43).
            raise KeyError(f"missing required config: {key}")
        return v

    def subset(self, prefix: str, strip: bool = True) -> dict[str, str]:
        """Per-component view (BaseChangeConsumer.java:57-68): all keys
        under `prefix.`, optionally with the prefix stripped."""
        out: dict[str, str] = {}
        p = prefix.rstrip(".") + "."
        for k, v in self._props.items():
            if k.startswith(p):
                out[k[len(p):] if strip else k] = "" if v == EMPTY_SENTINEL else v
        return out

    def with_storage_defaults(self) -> "PipelineConfig":
        """Reuse sink props for offset/schema-history storage namespaces
        when those are not explicitly configured
        (DebeziumServerConfigSourceFactory.java:89-104)."""
        sink_type = self.get("debezium.sink.type")
        if not sink_type:
            return self
        sink_props = self.subset(f"debezium.sink.{sink_type}")
        merged = dict(self._props)
        for ns in ("debezium.source.offset.storage", "debezium.source.schema.history.internal"):
            for k, v in sink_props.items():
                merged.setdefault(f"{ns}.{sink_type}.{k}", v)
        return PipelineConfig(merged, env={})

    def as_dict(self) -> dict[str, str]:
        return dict(self._props)
