"""Fuzz-pins the key-bucketed running_key_stats / exactly_once_dedup
folds to per-key grouping over randomized multi-batch replays."""
from __future__ import annotations

import datetime
import random

from debezium_server_spark.streaming.replay import replay_stream
from debezium_server_spark.streaming.stateful import (
    exactly_once_dedup,
    running_key_stats,
)


def _events(seed: int, n_keys: int = 20, n_rows: int = 400):
    rng = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)
    return [
        (rng.randrange(n_keys), i,
         t0 + datetime.timedelta(seconds=rng.randrange(0, 3 * 86400)),
         rng.randrange(0, 10_000))
        for i in range(n_rows)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, cents long")


def test_running_stats_bucketed_equals_per_key(spark):
    for seed in (2, 9):
        rows = _events(seed)
        def run(buckets):
            out = replay_stream(
                spark, _df(spark, rows),
                lambda s: running_key_stats(
                    s, key_col="user_id", value_col="cents",
                    key_buckets=buckets),
                output_mode="update",
            )
            return sorted(
                (r.key, r.n_events, r.total, r.peak) for r in out.collect())
        assert run(4) == run(0), f"seed={seed}"


def test_exactly_once_dedup_bucketed_equals_per_key(spark):
    for seed in (3, 13):
        rows = _events(seed)
        def run(buckets):
            out = replay_stream(
                spark, _df(spark, rows),
                lambda s: exactly_once_dedup(
                    s, ["user_id"], order_cols=["ts", "event_id"],
                    key_buckets=buckets),
            )
            return sorted(
                (r.user_id, r.event_id, r.ts, r.cents)
                for r in out.collect())
        assert run(4) == run(0), f"seed={seed}"
        assert run(None) == run(0), f"seed={seed} (default buckets)"
