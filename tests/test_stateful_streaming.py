"""Stateful streaming: cross-batch dedup state, running aggregates,
watermark late-data semantics.

Each test drives multiple micro-batches through one query run
(`maxFilesPerTrigger=1` + `availableNow`) so state genuinely crosses
batch boundaries — the property the checkpoint must carry at scale.
"""

import json

import pytest

from pyspark.sql import functions as F

from debezium_server_spark.streaming.stateful import (
    exactly_once_dedup,
    running_key_stats,
    windowed_event_counts,
)

SCHEMA = "dedup_id string, payload string, seq long"


def _write(path, name, rows):
    with open(f"{path}/{name}", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, path, schema=SCHEMA):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(path))
    )


def _run_collect(out_stream, tmp_path, mode="update"):
    rows = []

    q = (
        out_stream.writeStream.outputMode(mode)
        .foreachBatch(lambda df, epoch: rows.extend((epoch, r) for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_exactly_once_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: A twice, B once; batch 2: A redelivered, C new
    _write(src, "b1.jsonl", [
        {"dedup_id": "A", "payload": "a1", "seq": 1},
        {"dedup_id": "A", "payload": "a2", "seq": 2},
        {"dedup_id": "B", "payload": "b1", "seq": 3},
    ])
    _write(src, "b2.jsonl", [
        {"dedup_id": "A", "payload": "a3", "seq": 4},
        {"dedup_id": "C", "payload": "c1", "seq": 5},
    ])
    out = exactly_once_dedup(_stream(spark, src), ["dedup_id"])
    rows = [r for _, r in _run_collect(out, tmp_path, mode="append")]
    by_id = {r["dedup_id"]: r for r in rows}
    assert len(rows) == 3  # one emission per distinct id, ever
    assert set(by_id) == {"A", "B", "C"}
    assert by_id["A"]["payload"] == "a1"  # first delivery wins


def test_running_key_stats_accumulate(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src, "b1.jsonl", [
        {"dedup_id": "k1", "payload": "x", "seq": 10},
        {"dedup_id": "k1", "payload": "x", "seq": 20},
    ])
    _write(src, "b2.jsonl", [
        {"dedup_id": "k1", "payload": "x", "seq": 5},
    ])
    out = running_key_stats(_stream(spark, src), "dedup_id", "seq")
    rows = _run_collect(out, tmp_path)
    k1 = [r for _, r in rows if r["key"] == "k1"]
    # emitted once per batch, accumulating: (2, 30, 20) then (3, 35, 20)
    assert (k1[-1]["n_events"], k1[-1]["total"], k1[-1]["peak"]) == (3, 35.0, 20.0)
    assert (k1[0]["n_events"], k1[0]["total"], k1[0]["peak"]) == (2, 30.0, 20.0)


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics as Spark actually implements them: the
    watermark advances at batch end (from the previous batch's max event
    time), evicting windows whose end is below it; a late row arriving
    AFTER its window's state was evicted is dropped, never re-opening the
    window. (A late row whose window state still exists merges — eviction
    and the drop filter are both watermark-driven but state-dependent.)"""
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    t0 = time.time() - 1000
    # batch order is mtime order — force it so each file is its own batch
    batches = [
        # batch 0: event time reaches 12:00 → wm becomes 11:30 at batch end
        [{"dedup_id": "e1", "payload": "2024-01-01 10:15:00", "seq": 1},
         {"dedup_id": "e2", "payload": "2024-01-01 12:00:00", "seq": 1}],
        # batch 1 (wm 11:30): window [10:00,11:00) evicted at this batch end
        [{"dedup_id": "e3", "payload": "2024-01-01 12:01:00", "seq": 1}],
        # batch 2 (wm 11:31): 10:20 is late AND its state is gone → dropped
        [{"dedup_id": "late", "payload": "2024-01-01 10:20:00", "seq": 1},
         {"dedup_id": "e4", "payload": "2024-01-01 12:30:00", "seq": 1}],
    ]
    for i, rows_ in enumerate(batches):
        _write(src, f"b{i}.jsonl", rows_)
        os.utime(src / f"b{i}.jsonl", (t0 + i * 10, t0 + i * 10))
    ev = _stream(spark, src).select(
        F.to_timestamp("payload").alias("ts"), "dedup_id"
    )
    out = windowed_event_counts(ev, ts_col="ts", window="1 hour", watermark="30 minutes")
    rows = _run_collect(out, tmp_path)
    by_epoch_window = {}
    for epoch, r in rows:
        by_epoch_window.setdefault(epoch, {})[str(r["window_start"])] = r["n_events"]
    assert by_epoch_window[0] == {
        "2024-01-01 10:00:00": 1,
        "2024-01-01 12:00:00": 1,
    }
    assert by_epoch_window[1] == {"2024-01-01 12:00:00": 2}
    # the late 10:20 event is dropped: only the 12:00 window updates
    assert by_epoch_window[2] == {"2024-01-01 12:00:00": 3}


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: each micro-batch enriches against a static
    dimension (broadcast — the dimension never shuffles the stream)."""
    src = tmp_path / "src"
    src.mkdir()
    _write(src, "b1.jsonl", [
        {"dedup_id": "u1", "payload": "click", "seq": 1},
        {"dedup_id": "u2", "payload": "view", "seq": 2},
        {"dedup_id": "u9", "payload": "click", "seq": 3},  # no dim row
    ])
    dim = spark.createDataFrame(
        [("u1", "pro"), ("u2", "free")], "dedup_id string, tier string"
    )
    from pyspark.sql import functions as F

    enriched = _stream(spark, src).join(F.broadcast(dim), "dedup_id", "left")
    rows = [r for _, r in _run_collect(enriched, tmp_path, mode="append")]
    tiers = {r["dedup_id"]: r["tier"] for r in rows}
    assert tiers == {"u1": "pro", "u2": "free", "u9": None}


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Spark-native streaming dedup with bounded state: duplicates inside
    the watermark window are dropped; state ages out beyond it (the
    built-in complement to exactly_once_dedup's unbounded state)."""
    import os
    import time

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    t0 = time.time() - 1000
    _write(src, "b1.jsonl", [
        {"dedup_id": "A", "payload": "2024-01-01 10:00:00", "seq": 1},
        {"dedup_id": "A", "payload": "2024-01-01 10:00:30", "seq": 2},  # dup in-window
        {"dedup_id": "B", "payload": "2024-01-01 10:01:00", "seq": 3},
    ])
    os.utime(src / "b1.jsonl", (t0, t0))
    _write(src, "b2.jsonl", [
        {"dedup_id": "A", "payload": "2024-01-01 10:02:00", "seq": 4},  # still in-window dup
        {"dedup_id": "C", "payload": "2024-01-01 10:02:30", "seq": 5},
    ])
    os.utime(src / "b2.jsonl", (t0 + 10, t0 + 10))
    ev = _stream(spark, src).select(
        "dedup_id", F.to_timestamp("payload").alias("ts"), "seq"
    )
    deduped = ev.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["dedup_id"])
    rows = [r for _, r in _run_collect(deduped, tmp_path, mode="append")]
    by_id = {}
    for r in rows:
        by_id.setdefault(r["dedup_id"], []).append(r["seq"])
    assert sorted(by_id) == ["A", "B", "C"]
    assert by_id["A"] == [1]  # both later A deliveries dropped


def test_session_windows_merge_and_close(spark, tmp_path):
    """Gap-based sessions with append output: a session only emits once
    the watermark conclusively passes its close (gap elapsed) — late
    events can no longer reopen it. Sessions still open stay in state."""
    import os
    import time

    from debezium_server_spark.streaming.stateful import session_windows

    src = tmp_path / "src"
    src.mkdir()
    t0 = time.time()
    # batch 1: u1 has two events 5 min apart (one session, gap 10 min)
    _write(src, "b1.jsonl", [
        {"dedup_id": "u1", "payload": "2024-01-01 10:00:00", "seq": 1},
        {"dedup_id": "u1", "payload": "2024-01-01 10:05:00", "seq": 2},
        {"dedup_id": "u2", "payload": "2024-01-01 10:00:00", "seq": 3},
    ])
    os.utime(src / "b1.jsonl", (t0, t0))
    # batch 2: u1 after a >gap quiet period -> second session opens
    _write(src, "b2.jsonl", [
        {"dedup_id": "u1", "payload": "2024-01-01 11:00:00", "seq": 4},
    ])
    os.utime(src / "b2.jsonl", (t0 + 10, t0 + 10))
    # batch 3: far-future event pushes the watermark to 11:30, sealing
    # u1's second session (ended 11:10); u3's own session stays open
    _write(src, "b3.jsonl", [
        {"dedup_id": "u3", "payload": "2024-01-01 12:00:00", "seq": 5},
    ])
    os.utime(src / "b3.jsonl", (t0 + 20, t0 + 20))
    ev = _stream(spark, src).select(
        "dedup_id", F.to_timestamp("payload").alias("ts")
    )
    out = session_windows(ev, ("dedup_id",), ts_col="ts",
                          gap="10 minutes", watermark="30 minutes")
    rows = _run_collect(out, tmp_path, mode="append")
    sessions = {
        (r["dedup_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for _, r in rows
    }
    assert sessions[("u1", "2024-01-01 10:00:00")] == ("2024-01-01 10:15:00", 2)
    assert sessions[("u2", "2024-01-01 10:00:00")] == ("2024-01-01 10:10:00", 1)
    assert sessions[("u1", "2024-01-01 11:00:00")] == ("2024-01-01 11:10:00", 1)
    assert ("u3", "2024-01-01 12:00:00") not in sessions, "still open"


def test_watermarked_dedup_bounds_state(spark, tmp_path):
    """Duplicates inside the watermark horizon are dropped; after the
    watermark frees the key, the same id passes again (bounded state —
    the retention contract, not a bug)."""
    import os
    import time

    from debezium_server_spark.streaming.stateful import watermarked_dedup

    src = tmp_path / "src"
    src.mkdir()
    t0 = time.time()
    _write(src, "b1.jsonl", [
        {"dedup_id": "A", "payload": "2024-01-01 10:00:00", "seq": 1},
        {"dedup_id": "A", "payload": "2024-01-01 10:01:00", "seq": 2},  # dup
        {"dedup_id": "B", "payload": "2024-01-01 10:00:00", "seq": 3},
    ])
    os.utime(src / "b1.jsonl", (t0, t0))
    _write(src, "b2.jsonl", [
        # watermark (10 min) has NOT passed A yet → still a dup
        {"dedup_id": "A", "payload": "2024-01-01 10:05:00", "seq": 4},
        # push event time far ahead → A's state evicted afterwards
        {"dedup_id": "Z", "payload": "2024-01-01 12:00:00", "seq": 5},
    ])
    os.utime(src / "b2.jsonl", (t0 + 10, t0 + 10))
    _write(src, "b3.jsonl", [
        # watermark is applied at batch boundaries and state is purged
        # AFTER a batch runs, so this A is still deduped in batch 3...
        {"dedup_id": "A", "payload": "2024-01-01 12:01:00", "seq": 6},
    ])
    os.utime(src / "b3.jsonl", (t0 + 20, t0 + 20))
    _write(src, "b4.jsonl", [
        # ...and re-admitted once the purge has actually run
        {"dedup_id": "A", "payload": "2024-01-01 12:02:00", "seq": 7},
    ])
    os.utime(src / "b4.jsonl", (t0 + 30, t0 + 30))

    ev = _stream(spark, src).select(
        "dedup_id", F.to_timestamp("payload").alias("ts"), "seq"
    )
    out = watermarked_dedup(ev, ["dedup_id"], ts_col="ts", watermark="10 minutes")
    rows = _run_collect(out, tmp_path, mode="append")
    seqs = sorted(r["seq"] for _, r in rows)
    assert seqs == [1, 3, 5, 7], (
        "first A kept, in-horizon dups dropped (incl. the one-batch "
        "eviction lag), post-purge A re-admitted"
    )


def test_trending_topk_emits_final_ranking_once(spark, tmp_path):
    """Top-k finalizes exactly once per window, when the watermark passes
    the window end; counts fold across micro-batches before that."""
    import os
    import time

    from debezium_server_spark.streaming.stateful import trending_topk

    src = tmp_path / "src"
    src.mkdir()
    t0 = time.time() - 1000
    batches = [
        # window [10:00, 11:00): a=2, b=1 across two batches
        [{"dedup_id": "a", "payload": "2024-01-01 10:05:00", "seq": 1},
         {"dedup_id": "b", "payload": "2024-01-01 10:10:00", "seq": 2}],
        [{"dedup_id": "a", "payload": "2024-01-01 10:20:00", "seq": 3}],
        # advance event time far enough that wm (10 min delay) > 11:00
        [{"dedup_id": "c", "payload": "2024-01-01 11:30:00", "seq": 4}],
        # one more batch so the timeout fires after wm advanced
        [{"dedup_id": "c", "payload": "2024-01-01 11:40:00", "seq": 5}],
    ]
    for i, rows_ in enumerate(batches):
        _write(src, f"b{i}.jsonl", rows_)
        os.utime(src / f"b{i}.jsonl", (t0 + i * 10, t0 + i * 10))
    ev = _stream(spark, src).select(
        F.to_timestamp("payload").alias("ts"),
        F.col("dedup_id").alias("event_type"),
    )
    out = trending_topk(ev, window="1 hour", watermark="10 minutes", k=2)
    rows = [r for _, r in _run_collect(out, tmp_path, mode="append")]
    finalized = [r for r in rows if str(r["window_start"]) == "2024-01-01 10:00:00"]
    # emitted once, ranked a(2) > b(1), never re-emitted
    assert [(r["item"], r["n"], r["rank"]) for r in finalized] == [("a", 2, 1), ("b", 1, 2)]


def test_trending_topk_timeout_strictness_at_exact_boundary(spark):
    """EventTimeTimeout fires only when the watermark moves strictly PAST
    the timeout timestamp: a window whose end lands EXACTLY on the final
    watermark stays open (and is absent from the output), while one
    microsecond past it seals. The stream_trending_topk oracle's
    `window_end < max(ts) - watermark` strict filter encodes this."""
    import datetime as dt

    from debezium_server_spark.streaming.replay import replay_stream
    from debezium_server_spark.streaming.stateful import trending_topk

    base = [
        (dt.datetime(2024, 1, 1, 0, 5), "a"),
        (dt.datetime(2024, 1, 1, 0, 10), "b"),
        (dt.datetime(2024, 1, 1, 0, 10), "a"),
    ]

    def run(last_ts):
        df = spark.createDataFrame(
            base + [(last_ts, "c")], "ts timestamp, event_type string"
        )
        return replay_stream(
            spark,
            df,
            lambda s: trending_topk(
                s, ts_col="ts", key_col="event_type",
                window="1 hour", watermark="30 minutes", k=3,
            ),
            n_batches=2,
        ).collect()

    # max ts 01:30 -> final watermark 01:00 == window end -> NOT sealed
    assert run(dt.datetime(2024, 1, 1, 1, 30)) == []
    # one second past the boundary -> sealed, ranking emitted once
    sealed = run(dt.datetime(2024, 1, 1, 1, 30, 1))
    assert [(r["item"], r["n"], r["rank"]) for r in sealed
            if str(r["window_start"]) == "2024-01-01 00:00:00"] == [
        ("a", 2, 1), ("b", 1, 2)]


EV_SCHEMA = "user_id long, ts timestamp, event_type string"


def test_sequence_pattern_matches_cross_batch(spark, tmp_path):
    from debezium_server_spark.streaming.stateful import sequence_pattern_matches

    src = tmp_path / "cep"
    src.mkdir()
    # user 1: full match inside batch 1; user 3: starts in batch 1
    _write(src, "b1.jsonl", [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view"},
        {"user_id": 1, "ts": "2024-01-01 10:00:10", "event_type": "click"},
        {"user_id": 1, "ts": "2024-01-01 10:00:20", "event_type": "purchase"},
        {"user_id": 2, "ts": "2024-01-01 10:00:00", "event_type": "view"},
        {"user_id": 3, "ts": "2024-01-01 10:05:00", "event_type": "view"},
    ])
    # user 3 completes across the batch boundary (within 1h);
    # user 2's click arrives 2h after its view -> partial expired, and
    # click is not the first step so no new attempt starts;
    # user 1 starts and completes a SECOND, non-overlapping match
    _write(src, "b2.jsonl", [
        {"user_id": 3, "ts": "2024-01-01 10:06:00", "event_type": "click"},
        {"user_id": 3, "ts": "2024-01-01 10:07:00", "event_type": "purchase"},
        {"user_id": 2, "ts": "2024-01-01 12:00:01", "event_type": "click"},
        {"user_id": 2, "ts": "2024-01-01 12:00:02", "event_type": "purchase"},
        {"user_id": 1, "ts": "2024-01-01 10:10:00", "event_type": "view"},
        {"user_id": 1, "ts": "2024-01-01 10:10:05", "event_type": "purchase"},
        {"user_id": 1, "ts": "2024-01-01 10:10:04", "event_type": "click"},
    ])
    out = sequence_pattern_matches(
        _stream(spark, src, EV_SCHEMA),
        pattern=["view", "click", "purchase"],
        within="1 hour",
    )
    rows = [r for _, r in _run_collect(out, tmp_path, mode="append")]
    got = sorted((r.key, str(r.start_ts), str(r.end_ts), r.duration_s) for r in rows)
    assert got == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:00:20", 20.0),
        # intra-batch disorder (click written after purchase) repaired
        (1, "2024-01-01 10:10:00", "2024-01-01 10:10:05", 5.0),
        (3, "2024-01-01 10:05:00", "2024-01-01 10:07:00", 120.0),
    ]


def test_sequence_pattern_expired_partial_restarts(spark, tmp_path):
    from debezium_server_spark.streaming.stateful import sequence_pattern_matches

    src = tmp_path / "cep2"
    src.mkdir()
    # view at 10:00, click at 11:30 (past the 1h deadline -> reset),
    # then a FRESH view/click/purchase run completing at 11:35
    _write(src, "b1.jsonl", [
        {"user_id": 9, "ts": "2024-01-01 10:00:00", "event_type": "view"},
    ])
    _write(src, "b2.jsonl", [
        {"user_id": 9, "ts": "2024-01-01 11:30:00", "event_type": "click"},
        {"user_id": 9, "ts": "2024-01-01 11:33:00", "event_type": "view"},
        {"user_id": 9, "ts": "2024-01-01 11:34:00", "event_type": "click"},
        {"user_id": 9, "ts": "2024-01-01 11:35:00", "event_type": "purchase"},
    ])
    out = sequence_pattern_matches(
        _stream(spark, src, EV_SCHEMA),
        pattern=["view", "click", "purchase"],
        within="1 hour",
    )
    rows = [r for _, r in _run_collect(out, tmp_path, mode="append")]
    got = [(r.key, str(r.start_ts), str(r.end_ts)) for r in rows]
    assert got == [(9, "2024-01-01 11:33:00", "2024-01-01 11:35:00")]


def _offline_cep(events, pattern, within_s, mode):
    """Independent simulation of sequence_pattern_matches' per-mode
    semantics (type-only steps): the multi-partial automaton in plain
    Python over each key's time-sorted events."""
    per: dict[int, list] = {}
    for u, ts, et in sorted(events, key=lambda e: (e[0], e[1], e[2])):
        per.setdefault(u, []).append((ts, et))
    matches = []
    for u, evs in per.items():
        partials: list[list] = []  # [progress, first_ts]
        for ts, et in evs:
            partials = [p for p in partials
                        if (ts - p[1]).total_seconds() <= within_s]
            nxt, consumed = [], False
            for p in partials:
                if et == pattern[p[0]]:
                    p[0] += 1
                    if p[0] == len(pattern):
                        matches.append((u, p[1], ts))
                        consumed = True
                    else:
                        nxt.append(p)
                elif mode == "contiguous":
                    pass
                else:
                    nxt.append(p)
            partials = nxt
            if (mode == "every_start" or (not partials and not consumed)
                    ) and et == pattern[0]:
                partials.append([1, ts])
    return matches


@pytest.mark.parametrize("mode", ["skip_past_match", "every_start",
                                  "contiguous"])
def test_sequence_pattern_matches_randomized_vs_simulation(
        spark, tmp_path, mode):
    """Property-style check: the streaming automaton over a deterministic
    multi-batch replay must agree exactly with an independent offline
    simulation, for every after-match/contiguity policy."""
    import datetime
    import random

    from debezium_server_spark.streaming.replay import replay_stream
    from debezium_server_spark.streaming.stateful import sequence_pattern_matches

    rng = random.Random(7)
    t0 = datetime.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "error"]
    events = [
        (u, t0 + datetime.timedelta(seconds=rng.randrange(0, 5 * 86400)),
         rng.choice(types))
        for u in range(10)
        for _ in range(25)
    ]
    df = spark.createDataFrame(events, "user_id long, ts timestamp, event_type string")

    pattern, within_s = ["view", "click", "purchase"], 6 * 3600
    out = replay_stream(
        spark, df,
        lambda s: sequence_pattern_matches(
            s, pattern, within="6 hours", watermark="1 hour", mode=mode),
    )
    got = sorted((r.key, r.start_ts, r.end_ts) for r in out.collect())
    assert got == sorted(_offline_cep(events, pattern, within_s, mode))


def test_sequence_pattern_overlap_modes_diverge(spark, tmp_path):
    """One input, three policies, three different answers: the canonical
    view,view,purchase,purchase sequence."""
    import datetime

    from debezium_server_spark.streaming.replay import replay_stream
    from debezium_server_spark.streaming.stateful import sequence_pattern_matches

    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    events = [(1, at(0), "view"), (1, at(1), "view"),
              (1, at(2), "purchase"), (1, at(3), "purchase")]
    df = spark.createDataFrame(
        events, "user_id long, ts timestamp, event_type string")

    def run(mode):
        out = replay_stream(
            spark, df,
            lambda s: sequence_pattern_matches(
                s, ["view", "purchase"], within="1 hour", mode=mode),
            n_batches=2,
        )
        return sorted((r.start_ts, r.end_ts) for r in out.collect())

    # skip_past: one automaton slot — first view opens, first purchase
    # closes, second purchase has nothing to close and can't open.
    assert run("skip_past_match") == [(at(0), at(2))]
    # every_start: both views open partials, the first purchase closes
    # BOTH (overlapping matches).
    assert run("every_start") == [(at(0), at(2)), (at(1), at(2))]
    # contiguous: the second view kills the first partial and re-opens;
    # only the adjacent view->purchase pair survives.
    assert run("contiguous") == [(at(1), at(2))]


def test_sequence_pattern_checkpoint_recovery(spark, tmp_path):
    """Kill the stream between micro-batches and restart from the same
    checkpoint: automaton state must survive, and the combined output
    must equal an uninterrupted run (no lost or duplicated matches)."""
    from debezium_server_spark.streaming.stateful import sequence_pattern_matches

    src = tmp_path / "cep_rec"
    src.mkdir()
    _write(src, "b1.jsonl", [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view"},
        {"user_id": 1, "ts": "2024-01-01 10:01:00", "event_type": "click"},
        {"user_id": 2, "ts": "2024-01-01 10:02:00", "event_type": "view"},
    ])

    def run(rows):
        out = sequence_pattern_matches(
            _stream(spark, src, EV_SCHEMA),
            pattern=["view", "click", "purchase"], within="1 hour",
        )
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    first: list = []
    run(first)          # processes b1, then the query STOPS (availableNow)
    assert first == []  # both users mid-pattern, nothing emitted yet

    _write(src, "b2.jsonl", [
        {"user_id": 1, "ts": "2024-01-01 10:05:00", "event_type": "purchase"},
        {"user_id": 2, "ts": "2024-01-01 10:06:00", "event_type": "click"},
        {"user_id": 2, "ts": "2024-01-01 10:07:00", "event_type": "purchase"},
    ])
    second: list = []
    run(second)         # restart from checkpoint: partials must resume
    got = sorted((r.key, str(r.start_ts), str(r.end_ts)) for r in second)
    assert got == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00"),
        (2, "2024-01-01 10:02:00", "2024-01-01 10:07:00"),
    ]


def test_sequence_pattern_negation_and_predicate(spark, tmp_path):
    from debezium_server_spark.streaming.stateful import (
        PatternStep,
        sequence_pattern_matches,
    )

    src = tmp_path / "cep3"
    src.mkdir()
    _write(src, "b1.jsonl", [
        # user 1: view -> error -> purchase : killed by the negated step
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view", "value": 1.0},
        {"user_id": 1, "ts": "2024-01-01 10:01:00", "event_type": "error", "value": 0.0},
        {"user_id": 1, "ts": "2024-01-01 10:02:00", "event_type": "purchase", "value": 500.0},
        # user 2: view -> small purchase (ignored) -> big purchase (match)
        {"user_id": 2, "ts": "2024-01-01 10:00:00", "event_type": "view", "value": 1.0},
        {"user_id": 2, "ts": "2024-01-01 10:01:00", "event_type": "purchase", "value": 10.0},
        {"user_id": 2, "ts": "2024-01-01 10:03:00", "event_type": "purchase", "value": 250.0},
        # user 3: view -> purchase after an unrelated click (match — only
        # 'error' is forbidden, other types pass through)
        {"user_id": 3, "ts": "2024-01-01 10:00:00", "event_type": "view", "value": 1.0},
        {"user_id": 3, "ts": "2024-01-01 10:01:00", "event_type": "click", "value": 0.0},
        {"user_id": 3, "ts": "2024-01-01 10:02:00", "event_type": "purchase", "value": 120.0},
    ])
    out = sequence_pattern_matches(
        _stream(spark, src, EV_SCHEMA + ", value double"),
        pattern=[
            "view",
            PatternStep("error", negated=True),
            PatternStep("purchase", where=lambda v: v >= 100.0),
        ],
        value_col="value",
        within="1 hour",
    )
    rows = [r for _, r in _run_collect(out, tmp_path, mode="append")]
    got = sorted((r.key, str(r.end_ts)) for r in rows)
    assert got == [
        (2, "2024-01-01 10:03:00"),
        (3, "2024-01-01 10:02:00"),
    ]


def test_ddww_eviction_contract(spark):
    """Pins dropDuplicatesWithinWatermark's eviction contract, which the
    stream_dedup_watermark oracle replays declaratively:
    - eviction runs at END of batch N with batch N's OWN watermark
      (computed from data through N-1), not the freshly advanced one;
    - the boundary is NON-strict: expiry == watermark evicts;
    - a dropped duplicate does NOT extend the stored expiry.
    """
    from datetime import datetime, timedelta

    from debezium_server_spark.streaming.replay import replay_stream

    M = lambda m: datetime(2024, 1, 1) + timedelta(minutes=m)
    rows = [
        ("A", M(0), 0), ("F", M(100), 0),   # wm_1 = 90
        ("A", M(95), 1),                    # hit: state not yet evicted
        ("B", M(80), 0),                    # expiry 90 == wm_1 -> evicts
        ("B", M(99), 1),                    # hit (eviction is end-of-batch)
        ("C", M(85), 0),                    # expiry 95 > wm_1 -> survives
        ("F2", M(150), 1),                  # post-b1 wm = 140
        ("A", M(200), 2), ("B", M(200), 2),  # both evicted end-of-b1
        ("C", M(160), 2),                   # still in state: end-of-b1 used wm_1=90
        ("A", M(205), 3),                   # expiry 210 > wm_3=190 -> hit
        ("C", M(300), 3),                   # evicted end-of-b2 (wm_2=140)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, b int")
    out = replay_stream(
        spark, df,
        lambda s: s.withWatermark("ts", "10 minutes")
                   .dropDuplicatesWithinWatermark(["k"]),
        batch_col="b",
    )
    got = sorted((r["k"], int((r["ts"] - M(0)).total_seconds()) // 60)
                 for r in out.collect())
    assert got == [("A", 0), ("A", 200), ("B", 80), ("B", 200),
                   ("C", 85), ("C", 300), ("F", 100), ("F2", 150)]


def test_cep_emit_timeouts_proof_paths(spark):
    """Abandoned partials emit only when expiry is PROVEN: by a later
    same-key event past the deadline (even if the watermark never gets
    there), or by the watermark passing the deadline; a partial with
    neither proof stays unemitted."""
    from datetime import datetime, timedelta

    from debezium_server_spark.streaming.replay import replay_stream
    from debezium_server_spark.streaming.stateful import (
        sequence_pattern_matches,
    )

    M = lambda m: datetime(2024, 1, 1) + timedelta(minutes=m)
    rows = [
        # key 1: view@0, next event at 70 > deadline 60 -> in-batch proof
        (1, M(0), "view", 0), (1, M(70), "click", 1),
        # key 2: view@0, purchase@30 -> match, no timeout
        (2, M(0), "view", 0), (2, M(30), "purchase", 0),
        # key 3: view@100 -> deadline 160; final wm = 200-10=190 > 160
        #        -> watermark proof (timeout fire), no later key event
        (3, M(100), "view", 1),
        # key 4: view@185 -> deadline 245 > wm 190 -> NEVER proven
        (4, M(185), "view", 2),
        # filler fixing batch maxes; b2 max = 200
        (9, M(60), "click", 0), (9, M(200), "click", 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, b int")
    out = replay_stream(
        spark, df.select("user_id", "ts", "event_type", "b"),
        lambda s: sequence_pattern_matches(
            s, ["view", "purchase"], within="60 minutes",
            watermark="10 minutes", emit_timeouts=True),
        batch_col="b",
    )
    got = sorted((r["key"], r["outcome"],
                  int((r["start_ts"] - M(0)).total_seconds()) // 60)
                 for r in out.collect())
    assert got == [(1, "timeout", 0), (2, "match", 0), (3, "timeout", 100)]
