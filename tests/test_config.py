"""Config layer: namespace remapping semantics."""

import pytest

from debezium_server_spark.config import EMPTY_SENTINEL, PipelineConfig


def test_env_normalization():
    cfg = PipelineConfig(env={"DEBEZIUM_SINK_TYPE": "kafka", "PATH": "/bin"})
    assert cfg.get("debezium.sink.type") == "kafka"
    assert cfg.get("path") is None  # only DEBEZIUM_ vars are lifted


def test_props_override_env():
    cfg = PipelineConfig(
        {"debezium.sink.type": "redis"}, env={"DEBEZIUM_SINK_TYPE": "kafka"}
    )
    assert cfg.get("debezium.sink.type") == "redis"


def test_empty_sentinel_preserved():
    cfg = PipelineConfig({"debezium.format.value": EMPTY_SENTINEL}, env={})
    assert cfg.get("debezium.format.value") == ""


def test_require_missing_sink_type_raises():
    with pytest.raises(KeyError, match="debezium.sink.type"):
        PipelineConfig({}, env={}).require("debezium.sink.type")


def test_prefix_subset():
    cfg = PipelineConfig(
        {
            "debezium.sink.redis.address": "h:6379",
            "debezium.sink.redis.batch.size": "500",
            "debezium.sink.kafka.topic": "t",
        },
        env={},
    )
    assert cfg.subset("debezium.sink.redis") == {
        "address": "h:6379",
        "batch.size": "500",
    }
    assert cfg.subset("debezium.sink.redis", strip=False) == {
        "debezium.sink.redis.address": "h:6379",
        "debezium.sink.redis.batch.size": "500",
    }


def test_sink_props_reused_for_storage():
    cfg = PipelineConfig(
        {
            "debezium.sink.type": "redis",
            "debezium.sink.redis.address": "h:6379",
            # explicit storage prop must NOT be overwritten
            "debezium.source.offset.storage.redis.address": "other:1",
        },
        env={},
    ).with_storage_defaults()
    assert cfg.get("debezium.source.offset.storage.redis.address") == "other:1"
    assert (
        cfg.get("debezium.source.schema.history.internal.redis.address") == "h:6379"
    )
