"""Fuzz-pins the key-bucketed SCD2 stream fold to per-key grouping:
identical closed intervals and identical carried state for randomized
multi-batch replays, including no-op updates (equal consecutive
values), single-event keys, and cross-batch runs.
"""
from __future__ import annotations

import datetime
import random

from debezium_server_spark.streaming.replay import replay_stream
from debezium_server_spark.streaming.stateful import scd2_stream


def _random_changes(seed: int, n_keys: int = 15, per_key: int = 25):
    rng = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)
    states = ["new", "active", "idle", "churned"]
    rows = []
    eid = 0
    for u in range(n_keys):
        for _ in range(rng.randrange(1, per_key)):
            eid += 1
            rows.append(
                (u, eid,
                 t0 + datetime.timedelta(
                     seconds=rng.randrange(0, 4 * 86400)),
                 rng.choice(states)))
    return rows


def _run(spark, rows, buckets):
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, state string")
    out = replay_stream(
        spark, df,
        lambda s: scd2_stream(
            s, key_col="user_id", value_col="state",
            ts_col="ts", id_col="event_id", key_buckets=buckets),
    )
    return sorted(
        (r.key, r.state, r.valid_from, r.valid_to) for r in out.collect())


def test_scd2_bucketed_equals_per_key(spark):
    for seed in (5, 19, 31):
        rows = _random_changes(seed)
        assert _run(spark, rows, buckets=4) == _run(spark, rows, buckets=0), (
            f"seed={seed}: bucketed scd2 diverged from per-key")


def test_scd2_default_buckets_match(spark):
    rows = _random_changes(77)
    assert _run(spark, rows, buckets=None) == _run(spark, rows, buckets=0)
