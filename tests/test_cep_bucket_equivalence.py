"""Fuzz-pins the key-bucketed CEP automaton to per-key grouping.

`sequence_pattern_matches(key_buckets=B)` groups state by
pmod(xxhash64(key), B) and folds every key of a bucket in one
invocation; `key_buckets=0` forces the per-key grouping through the
SAME fold. The two must emit identical row sets for every combination
of after-match policy, negation, value guards and timeout emission,
over randomized multi-batch replays (cross-batch partials, watermark
expiry and in-batch expiry all in play).
"""
from __future__ import annotations

import datetime
import random

import pytest

from debezium_server_spark.streaming.replay import replay_stream
from debezium_server_spark.streaming.stateful import (
    PatternStep,
    sequence_pattern_matches,
)


def _random_events(seed: int, n_keys: int = 12, per_key: int = 30):
    rng = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "error", "noise"]
    return [
        (u,
         t0 + datetime.timedelta(seconds=rng.randrange(0, 5 * 86400)),
         rng.choice(types),
         float(rng.randrange(0, 100)))
        for u in range(n_keys)
        for _ in range(per_key)
    ]


def _run(spark, events, buckets: int, **kw):
    df = spark.createDataFrame(
        events, "user_id long, ts timestamp, event_type string, amount double")
    out = replay_stream(
        spark, df,
        lambda s: sequence_pattern_matches(
            s, key_buckets=buckets, value_col="amount", **kw),
    )
    return sorted(
        (r.key, r.start_ts, r.end_ts, r.duration_s, r.outcome)
        for r in out.collect()
    )


CASES = [
    dict(pattern=["view", "click", "purchase"], within="6 hours",
         watermark="1 hour", mode="skip_past_match"),
    dict(pattern=["view", "click", "purchase"], within="12 hours",
         watermark="2 hours", mode="every_start"),
    dict(pattern=["view", "purchase"], within="6 hours",
         watermark="1 hour", mode="contiguous"),
    dict(pattern=["view", PatternStep("error", negated=True), "purchase"],
         within="8 hours", watermark="1 hour", mode="skip_past_match"),
    dict(pattern=["view",
                  PatternStep("purchase", where=lambda v: v >= 50.0)],
         within="6 hours", watermark="1 hour", mode="skip_past_match"),
    dict(pattern=["view", "click", "purchase"], within="4 hours",
         watermark="1 hour", mode="skip_past_match", emit_timeouts=True),
    dict(pattern=["view", "click"], within="3 hours",
         watermark="30 minutes", mode="every_start", emit_timeouts=True),
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: (
    f"{c['mode']}{'-timeouts' if c.get('emit_timeouts') else ''}"
    f"{'-neg' if any(isinstance(p, PatternStep) and p.negated for p in c['pattern']) else ''}"
    f"{'-where' if any(isinstance(p, PatternStep) and p.where for p in c['pattern']) else ''}"))
def test_bucketed_equals_per_key(spark, case):
    for seed in (3, 11):
        events = _random_events(seed)
        per_key = _run(spark, events, buckets=0, **case)
        small_buckets = _run(spark, events, buckets=5, **case)
        assert small_buckets == per_key, (
            f"seed={seed} case={case}: bucketed(5) diverged from per-key")


def test_bucketed_default_matches_per_key(spark):
    """The derived default bucket count (16x shuffle partitions) also
    matches per-key output on a mixed case."""
    events = _random_events(42)
    case = dict(pattern=["view", "click", "purchase"], within="6 hours",
                watermark="1 hour", mode="skip_past_match",
                emit_timeouts=True)
    assert _run(spark, events, buckets=0, **case) == _run(
        spark, events, buckets=None, **case)
