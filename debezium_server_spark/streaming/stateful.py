"""Custom stateful streaming operators.

The reference is stateless per event (state lives in the sink), with two
exceptions this module makes first-class in Spark:

- FIFO dedup ids: SQS/SNS FIFO drop re-deliveries of the same dedup id
  (SqsChangeConsumer.java:87-88,133-136, SnsChangeConsumerConfig.java:69-96).
  Here: `exactly_once_dedup` — per-key seen-state across micro-batches via
  `applyInPandasWithState`, upgrading at-least-once replay to exactly-once
  emission without requiring an idempotent sink.
- ms-behind-source / queue metrics (DebeziumMetrics.java:106-153). Here:
  `running_key_stats` — per-key running counters that survive batches.

Watermark/event-time windowing is Spark-native (`withWatermark` +
`F.window`) and exposed as `windowed_event_counts` for the pipeline DSL.

Scale: state is per-key and partitioned by the grouping key — each
executor holds only its keys' state (RocksDB-backed state store in
production configs). No driver-side state, no collect.

Note: Spark 4.1's newer transformWithStateInPandas API (timers,
TTL, multiple state variables) requires the google-protobuf Python
package at runtime; this container lacks it, so the operators here
stay on applyInPandasWithState, which is dependency-free.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def exactly_once_dedup(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
    key_buckets: int | None = None,
) -> DataFrame:
    """Emit only the FIRST event ever seen for each key, across all
    micro-batches (state persists in the checkpoint). Rows must share the
    input schema; output schema == input schema.

    This is the streaming upgrade of `dropDuplicates` — which in Spark
    streaming also keeps state, but cannot bound emission to row-arrival
    order inside a batch. Without `order_cols` the first row of the
    first batch wins (arrival order). With `order_cols` the winner is
    the lexicographic minimum over those columns WITHIN the first batch
    the key appears in — fully deterministic when the replay is
    time-range batched and `order_cols` leads with the event-time column
    (the key's globally-minimal row is then guaranteed to live in its
    first batch, and equal order values never straddle a range split).

    With `order_cols`, `key_buckets` groups state by
    pmod(xxhash64(keys), B) instead of per key (0 forces per-key; None
    derives B = 16 × shuffle partitions at build time), amortizing the
    applyInPandasWithState per-group fixed cost across the bucket's
    keys; state becomes the bucket's seen keys as typed arrays (one
    per key column). Value-identical under `order_cols`: the winner
    per key is the lexsort minimum over the same rows (a global
    lexsort by (order_cols) visited in order, taking each unseen key's
    first row, IS that key's lexicographic minimum). Without
    `order_cols` the winner is batch ARRIVAL order, which grouping
    changes — so the arrival-order path always stays per-key.
    """
    out_schema = stream.schema
    if key_buckets is None:
        spark = stream.sparkSession
        key_buckets = 16 * int(
            spark.conf.get("spark.sql.shuffle.partitions", "8") or "8")
    if not order_cols:
        key_buckets = 0  # arrival-order winner: grouping must stay per-key

    if key_buckets > 0:
        state_schema = T.StructType([
            T.StructField(f"k{i}", T.ArrayType(stream.schema[c].dataType))
            for i, c in enumerate(key_cols)
        ])
        src = stream.withColumn(
            "__bkt",
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]),
                   F.lit(key_buckets)).cast("int"))

        def fn(
            key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            chunks = [p.drop(columns="__bkt") for p in pdfs if len(p)]
            if not chunks:
                return
            pdf = (chunks[0] if len(chunks) == 1
                   else pd.concat(chunks, ignore_index=True))
            seen: set = set()
            if state.exists:
                seen = set(zip(*state.get))
            keys = []
            for c in reversed(order_cols):
                a = pdf[c].to_numpy()
                if a.dtype.kind == "M":
                    a = a.astype("datetime64[us]").astype("int64")
                keys.append(a)
            order = np.lexsort(keys)
            kcols = [pdf[c].to_numpy(dtype=object) for c in key_cols]
            take: list[int] = []
            for i in order.tolist():
                kt = tuple(col[i] for col in kcols)
                if kt not in seen:
                    seen.add(kt)
                    take.append(i)
            if not take:
                return
            state.update(tuple(
                [kt[j] for kt in sorted(seen)] for j in range(len(key_cols))
            ))
            yield pdf.iloc[take]

        return src.groupBy("__bkt").applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    state_schema = T.StructType([T.StructField("seen", T.LongType())])

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if not state.exists:
            if order_cols:
                # lexsort over numeric key arrays instead of a per-group
                # sort_values (guide §4.2 — measured ~4x on the 17-row
                # groups this sees: 1015 -> 240 µs); stable lexsort's
                # first row == the old cross-chunk strict-< minimum
                # (earlier chunk wins ties, same as concat order).
                chunks = [p for p in pdfs if len(p)]
                if not chunks:
                    return
                pdf = (chunks[0] if len(chunks) == 1
                       else pd.concat(chunks, ignore_index=True))
                keys = []
                for c in reversed(order_cols):
                    a = pdf[c].to_numpy()
                    if a.dtype.kind == "M":
                        a = a.astype("datetime64[us]").astype("int64")
                    keys.append(a)
                i = int(np.lexsort(keys)[0])
                state.update((1,))
                yield pdf.iloc[[i]]
                return
            for pdf in pdfs:
                if len(pdf):
                    state.update((1,))
                    yield pdf.iloc[[0]]
                    break

    return stream.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        # each key emits at most once ever, so append semantics are
        # exact — and append is what sink-side append-mode queries
        # (e.g. the deterministic replay harness) require
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_key_stats(
    stream: DataFrame, key_col: str, value_col: str,
    key_buckets: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum, max) across micro-batches — the
    metrics-accumulator shape (DebeziumMetrics.java:106-153) as a real
    distributed operator. Emits one updated row per key per batch.

    `key_buckets` groups state by pmod(xxhash64(key), B) instead of per
    key (0 forces per-key; None derives B = 16 × shuffle partitions at
    build time) — the sequence_pattern_matches amortization: the fixed
    applyInPandasWithState per-group cost is paid once per bucket per
    batch. Counts and maxima are order-free; sums accumulate each key's
    batch rows in arrival order (stable sort by key, then a sequential
    left-fold per segment via np.add.reduceat). Only keys with events
    this batch emit — exactly the per-key invocation set (NoTimeout: no
    other invocations exist). Float caveat, irrelevant to
    integer-valued streams like the catalog's cents column: the per-key
    fold summed with pandas' pairwise algorithm, the segment left-fold
    is sequential — float sums can differ in the last ulp.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.StringType())),
            T.StructField("n", T.ArrayType(T.LongType())),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("m", T.ArrayType(T.DoubleType())),
        ]
    )
    src = stream.select(
        F.col(key_col).cast("string").alias("key"), value_col)
    if key_buckets is None:
        spark = stream.sparkSession
        key_buckets = 16 * int(
            spark.conf.get("spark.sql.shuffle.partitions", "8") or "8")
    if key_buckets > 0:
        src = src.withColumn(
            "__bkt",
            F.pmod(F.xxhash64(F.col("key")), F.lit(key_buckets))
            .cast("int"))
        group_col = "__bkt"
    else:
        group_col = "key"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        batch = (chunks[0] if len(chunks) == 1
                 else pd.concat(chunks, ignore_index=True))
        st_keys: list = []
        st_n: list = []
        st_s: list = []
        st_m: list = []
        if state.exists:
            st_keys, st_n, st_s, st_m = (list(a) for a in state.get)
        st_map = {kk: i for i, kk in enumerate(st_keys)}
        k_a = batch["key"].to_numpy(dtype=object)
        order = np.argsort(k_a, kind="stable")
        k_sorted = k_a[order]
        v_sorted = batch[value_col].to_numpy()[order].astype("float64")
        seg_start = np.flatnonzero(
            np.concatenate(([True], k_sorted[1:] != k_sorted[:-1])))
        seg_end = np.concatenate((seg_start[1:], [len(k_sorted)]))
        # vectorized per-segment aggregates (one reduceat per stat
        # instead of a pandas slice per key)
        seg_n = (seg_end - seg_start).tolist()
        seg_s = np.add.reduceat(v_sorted, seg_start).tolist()
        seg_m = np.maximum.reduceat(v_sorted, seg_start).tolist()
        out_k: list = []
        out_n: list = []
        out_s: list = []
        out_m: list = []
        for j, a in enumerate(seg_start.tolist()):
            kk = k_sorted[a]
            if kk in st_map:
                i = st_map[kk]
                n, s, m = st_n[i], st_s[i], st_m[i]
            else:
                i = None
                n, s, m = 0, 0.0, float("-inf")
            n += int(seg_n[j])
            s += float(seg_s[j])
            m = max(m, float(seg_m[j]))
            if i is None:
                st_map[kk] = len(st_keys)
                st_keys.append(kk)
                st_n.append(n)
                st_s.append(s)
                st_m.append(m)
            else:
                st_n[i], st_s[i], st_m[i] = n, s, m
            out_k.append(kk)
            out_n.append(n)
            out_s.append(s)
            out_m.append(m)
        state.update((st_keys, st_n, st_s, st_m))
        # typed ndarray columns skip pandas' row-dict inference — one
        # frame per bucket per batch (guide §4.2)
        yield pd.DataFrame(
            {
                "key": np.array(out_k, dtype=object),
                "n_events": np.array(out_n, dtype="int64"),
                "total": np.array(out_s, dtype="float64"),
                "peak": np.array(out_m, dtype="float64"),
            }
        )

    return src.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def watermarked_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native bounded-state stream dedup: Spark's
    `dropDuplicatesWithinWatermark` keeps a key in state only until the
    watermark passes its event time, then frees it — the built-in
    complement to `exactly_once_dedup` (which keeps ALL keys forever via
    applyInPandasWithState and is exact across arbitrary time gaps).
    Pick by retention contract: CDC replay-dedup wants this bounded form
    (duplicates arrive close together, state must not grow with history);
    business-key idempotence across days wants the exact one."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def session_windows(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization on a stream: a session extends while
    events arrive within `gap` of the previous one and closes after a
    quiet period — Spark's native `session_window` state operator, so
    session state merges incrementally executor-side and the watermark
    finalizes (and frees) sessions whose gap has conclusively passed.
    This is the streaming twin of the batch `sessionize` catalog entry
    (lag/cumsum windows); at 100 TB the streaming form wins because it
    never re-sorts history — state per live key only."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *key_cols)
        .agg(
            F.count("*").alias("n_events"),
        )
        .select(
            *key_cols,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    extra_keys: tuple[str, ...] = (),
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed counts with late-data bounds: events older
    than `watermark` behind the max seen event time are dropped and
    their windows finalized (state bounded — mandatory at 100 TB:
    without the watermark, window state grows forever). With `slide`
    set shorter than `window` the windows HOP (overlap): each event is
    assigned to window/slide windows and state per key multiplies by
    the same factor — still watermark-bounded."""
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *extra_keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *extra_keys,
            "n_events",
        )
    )


def trending_topk(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    k: int = 3,
) -> DataFrame:
    """Per-window trending top-k: count `key_col` occurrences inside each
    event-time window and emit the k most frequent items ONCE, when the
    watermark conclusively passes the window end (append semantics — no
    retractions, downstream sinks never see a provisional ranking).

    Windowed counting alone is Spark-native, but top-k-per-window with
    single-shot finalization is not: ranking inside an update-mode stream
    re-emits on every batch. Here `applyInPandasWithState` keys state by
    window bounds, folds counts incrementally executor-side, and an
    EventTimeTimeout set to the window end fires exactly when the
    watermark seals the window — at that instant every on-time event has
    arrived (anything later would be watermark-dropped anyway), so the
    ranking is final by construction.

    Scale: state per (window, executor-partition of windows) is one
    count-map; items within a window shuffle once on the window bounds.
    Ties break lexicographically for determinism.
    """
    # group on the window STRUCT itself: the watermark rides on it, and a
    # projection of win.start/win.end would strip the event-time metadata
    # EventTimeTimeout requires
    win = stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window).alias("win"), F.col(key_col).alias("item")
    )
    out_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("item", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("items", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
        ]
    )

    def fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (win_struct,) = key  # struct key arrives as {'start': ts, 'end': ts}
        if isinstance(win_struct, dict):
            ws, we = win_struct["start"], win_struct["end"]
        else:
            ws, we = win_struct
        if state.hasTimedOut:
            items, counts = state.get
            ranked = sorted(zip(items, counts), key=lambda t: (-t[1], t[0]))[:k]
            state.remove()
            yield pd.DataFrame(
                {
                    "window_start": [ws] * len(ranked),
                    "window_end": [we] * len(ranked),
                    "item": [i for i, _ in ranked],
                    "n": [c for _, c in ranked],
                    "rank": list(range(1, len(ranked) + 1)),
                }
            )
            return
        counts: dict[str, int] = {}
        if state.exists:
            items, cnts = state.get
            counts = dict(zip(items, cnts))
        for pdf in pdfs:
            for item, c in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
        we_ms = int(we.timestamp() * 1000)
        if we_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed this window end (possible when
            # one micro-batch spans far more event time than the delay):
            # every on-time event has arrived, and a timeout in the past
            # is an engine error — finalize right now instead
            ranked = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:k]
            if state.exists:
                state.remove()
            yield pd.DataFrame(
                {
                    "window_start": [ws] * len(ranked),
                    "window_end": [we] * len(ranked),
                    "item": [i for i, _ in ranked],
                    "n": [c for _, c in ranked],
                    "rank": list(range(1, len(ranked) + 1)),
                }
            )
            return
        state.update((list(counts.keys()), [int(v) for v in counts.values()]))
        # finalize when the watermark passes the window end
        state.setTimeoutTimestamp(we_ms)
        return

    return win.groupBy("win").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


class PatternStep:
    """One step of a CEP pattern: an event type, optionally NEGATED
    (its arrival between the surrounding positive steps kills the
    partial match — 'A then NOT B before C'), optionally guarded by a
    `where` predicate on the stream's `value_col` (the step only
    matches when the predicate holds; non-matching events of the same
    type are simply ignored, they neither advance nor kill)."""

    __slots__ = ("etype", "negated", "where")

    def __init__(self, etype: str, negated: bool = False, where=None):
        if negated and where is not None:
            raise ValueError("negated steps take no where-predicate: the "
                             "kill applies to the event type itself")
        self.etype = etype
        self.negated = negated
        self.where = where


def sequence_pattern_matches(
    stream: DataFrame,
    pattern: list,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str | None = None,
    within: str = "1 hour",
    watermark: str = "30 minutes",
    mode: str = "skip_past_match",
    emit_timeouts: bool = False,
    key_buckets: int | None = None,
) -> DataFrame:
    """Streaming CEP: detect the ordered `pattern` of event types per key,
    completing within `within` of the first matched step, and emit one
    append-mode row per completed match (key, start_ts, end_ts,
    duration_s).

    Complex-event-processing is the canonical thing Structured Streaming
    does NOT ship (Flink has MATCH_RECOGNIZE/CEP; Spark's batch analog is
    the `path_pattern_match` catalog entry). The stateful translation:

    - state per key = (progress index, first-step ts, last-advance ts) —
      O(1) per key, independent of event volume;
    - within a micro-batch events are sorted by (ts, tiebreak) before the
      automaton advances, so intra-batch disorder is repaired exactly;
      cross-batch disorder is bounded by the watermark (late events
      beyond it are dropped upstream, matching windowed-agg semantics);
    - non-overlapping skip-past-match semantics: a completed match
      resets the automaton (SQL MATCH_RECOGNIZE AFTER MATCH SKIP PAST
      LAST ROW), and an expired partial match restarts cleanly — the
      current event may immediately begin a new attempt;
    - an EventTimeTimeout at first_ts + within garbage-collects stalled
      partial matches when the watermark passes the deadline, so state
      never outlives the pattern window.

    `pattern` mixes plain strings (positive steps) and `PatternStep`s:
    negated steps ('view, NOT error, purchase') kill the partial when
    the forbidden type arrives between its surrounding positive steps;
    `where` predicates gate a positive step on `value_col` (an event of
    the right type failing the predicate is ignored). Patterns must
    start and end with positive steps — a leading negation has nothing
    to guard, a trailing one would never be decidable before timeout.

    `mode` picks the after-match / contiguity policy (the MATCH_RECOGNIZE
    AFTER MATCH / Flink CEP strategy axis):

    - 'skip_past_match' (default): ONE partial per key; a completed
      match resets the automaton (AFTER MATCH SKIP PAST LAST ROW) — the
      non-overlapping semantics above.
    - 'every_start': every qualifying first-step event opens its OWN
      partial, and partials advance independently — matches may overlap
      (one click can complete several views' partials; Flink's
      followedBy + NO_SKIP shape without intra-partial branching: each
      partial greedily takes the first qualifying event per step).
      State per key = the list of live partials; `within` expiry bounds
      it by the first-step arrivals inside one window, not event volume.
    - 'contiguous': strict contiguity (Flink `next`): the very next
      event of the key must match the expected step or the partial dies
      (the killing event may itself start a fresh partial). Negated
      steps are rejected here — every intervening event already kills.

    `emit_timeouts=True` additionally emits the NEGATIVE SPACE — every
    partial that expires without completing (the abandoned funnel):
    one row per timed-out partial with outcome='timeout', start_ts =
    the first-step arrival, end_ts = its deadline (start + within).
    A partial is provably expired when a later same-key event arrives
    past its deadline (in-batch drop) or when the watermark passes the
    deadline (EventTimeTimeout / end-of-batch cleanup) — whichever
    proof lands first; partials whose deadline the stream never proves
    past stay unemitted, exactly like unsealed windows. Matches carry
    outcome='match' so one query yields both conversion and
    abandonment streams.

    `key_buckets` groups the automaton state by pmod(xxhash64(key), B)
    instead of per key (0 forces per-key grouping; None derives
    B = 16 × spark.sql.shuffle.partitions at build time, scaling with
    the session rather than a local constant). The per-key fold paid
    its fixed cost (pandas group-frame build, state ser/de, Arrow
    framing) once per ACTIVE KEY per micro-batch — tens of thousands
    of invocations per replay; bucketing pays it once per bucket while
    the per-event transition logic is unchanged.

    Output-equivalence argument (fuzz-pinned by
    test_cep_bucket_equivalence, oracle-pinned at three SFs):

    - all events of a key land in one bucket, and within the bucket
      each key's events are folded in the same (ts, etype-rank, val)
      order the per-key sort produced — transitions, in-batch expiry
      (event-ts proofs) and match emission are per-key computations
      and see identical inputs;
    - end-of-batch watermark cleanup runs for EVERY key in the bucket
      (not only keys with events this batch). Per-key grouping reaches
      the same partials through the EventTimeTimeout phase of the SAME
      micro-batch, which uses the same batch watermark — so the exact
      same set of provably-expired partials is dropped (and emitted,
      under emit_timeouts) either way, only from a different
      invocation. This also keeps the re-armed bucket timeout
      (min surviving deadline) strictly above the watermark, which
      EventTimeTimeout requires;
    - the bucket timeout fires when the MIN deadline in the bucket
      passes; the handler expires exactly the partials whose deadline
      the watermark passed and re-arms to the new min — per-key
      timeouts partition the identical work by key.

    State per bucket = the bucket's live partials as parallel
    (key, progress, first_us) arrays — the same O(live partials)
    bytes, just packed per bucket.
    """
    if mode not in ("skip_past_match", "every_start", "contiguous"):
        raise ValueError(f"unknown mode: {mode!r}")
    steps = [PatternStep(s) if isinstance(s, str) else s for s in pattern]
    if not steps:
        raise ValueError("pattern must name at least one event type")
    if steps[0].negated or steps[-1].negated:
        raise ValueError("pattern must start and end with positive steps")
    if mode == "contiguous" and any(s.negated for s in steps):
        raise ValueError("contiguous mode takes no negated steps: strict "
                         "contiguity already kills on any intervening event")
    positives = [s for s in steps if not s.negated]
    guards: list[frozenset] = []
    pending: set = set()
    for s in steps:
        if s.negated:
            pending.add(s.etype)
        else:
            guards.append(frozenset(pending))
            pending = set()
    within_s = _duration_seconds(within)

    val_col = (
        F.col(value_col).cast("double").alias("val")
        if value_col is not None
        else F.lit(0.0).alias("val")
    )
    ev = stream.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
        val_col,
    )
    # JVM-side relevance filter (guide §4.1: pass only what the
    # function needs): event types outside the pattern's positive
    # steps and negation guards cannot advance, kill, or start a
    # partial, so dropping them before the shuffle + Python boundary
    # is output-preserving — EXCEPT under strict contiguity (any
    # event kills) and under emit_timeouts (an irrelevant event's ts
    # can be the only in-batch PROOF that a partial expired; dropping
    # it could leave the timeout row unemitted when the final
    # watermark stops short of the deadline). Expiry-by-ts checks are
    # unaffected: batches are time-range ordered, so any partial a
    # dropped event would expire is expired by the next kept event's
    # ts check or was already behind the watermark (equivalence
    # argued per path; oracle-pinned at three SFs).
    if mode != "contiguous" and not emit_timeouts:
        relevant = {s.etype for s in steps}
        ev = ev.filter(F.col("etype").isin(sorted(relevant)))
    if key_buckets is None:
        spark = stream.sparkSession
        key_buckets = 16 * int(
            spark.conf.get("spark.sql.shuffle.partitions", "8") or "8")
    if key_buckets > 0:
        ev = ev.withColumn(
            "bkt",
            F.pmod(F.xxhash64(F.col("key")), F.lit(key_buckets)).cast("int"))
        group_col = "bkt"
    else:
        group_col = "key"
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("start_ts", T.TimestampType()),
            T.StructField("end_ts", T.TimestampType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("outcome", T.StringType()),
        ]
    )
    # Partials live as parallel arrays (keys[i], progress[i],
    # first_us[i]) — every live partial of the bucket (one key's worth
    # under per-key grouping). The single-partial modes keep at most
    # one element per key, 'every_start' one per live first-step
    # arrival (bounded by `within` expiry).
    state_schema = T.StructType(
        [
            T.StructField("keys", T.ArrayType(T.LongType())),
            T.StructField("progress", T.ArrayType(T.IntegerType())),
            T.StructField("first_us", T.ArrayType(T.LongType())),
        ]
    )
    n_steps = len(positives)

    within_us = within_s * 1_000_000

    def _emit(match_rows: list, timeout_rows: list):
        """One output frame from (key, start_us, end_us) match rows and
        (key, first_us) timeout rows. int64 µs -> M8[us] views instead
        of pd.to_datetime lists (guide §4.2 — the frame build dominated
        the per-group cost, measured ~5x: 1.5 ms -> 0.3 ms; duration
        arithmetic unchanged: (e - s)/1e6, which for timeout rows is
        exactly float(within_s))."""
        n_match = len(match_rows)
        keys_l = [kk for kk, _, _ in match_rows]
        starts = [s for _, s, _ in match_rows]
        ends = [e for _, _, e in match_rows]
        if emit_timeouts and timeout_rows:
            keys_l += [kk for kk, _ in timeout_rows]
            starts += [f for _, f in timeout_rows]
            ends += [f + within_us for _, f in timeout_rows]
        if not starts:
            return None
        s_arr = np.asarray(starts, dtype="int64")
        e_arr = np.asarray(ends, dtype="int64")
        return pd.DataFrame(
            {
                "key": np.asarray(keys_l, dtype="int64"),
                "start_ts": s_arr.view("M8[us]"),
                "end_ts": e_arr.view("M8[us]"),
                "duration_s": (e_arr - s_arr) / 1e6,
                "outcome": (["match"] * n_match
                            + ["timeout"] * (len(s_arr) - n_match)),
            }
        )

    def advance(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # watermark passed the bucket's earliest live deadline:
            # drop exactly the expired partials; keep the rest and
            # re-arm to their new min deadline.
            keys_a, progress, first_us = state.get
            wm_us = state.getCurrentWatermarkMs() * 1000
            live = [(kk, p, f)
                    for kk, p, f in zip(keys_a, progress, first_us)
                    if f + within_us > wm_us]
            dead = sorted(
                (kk, f) for kk, p, f in zip(keys_a, progress, first_us)
                if f + within_us <= wm_us)
            if live:
                state.update(([kk for kk, _, _ in live],
                              [p for _, p, _ in live],
                              [f for _, _, f in live]))
                state.setTimeoutTimestamp(
                    min(f for _, _, f in live) // 1000 + within_s * 1000)
            else:
                state.remove()
            frame = _emit([], dead)
            if frame is not None:
                yield frame
            return
        partials_by_key: dict[int, list[list]] = {}
        if state.exists:
            keys_a, progress, first_us = state.get
            for kk, p, f in zip(keys_a, progress, first_us):
                partials_by_key.setdefault(kk, []).append([p, f])
        match_rows: list[tuple] = []    # (key, start_us, end_us)
        timeout_rows: list[tuple] = []  # (key, first_us)
        wm_ms = state.getCurrentWatermarkMs()
        # One pandas/Arrow/lexsort pass per BUCKET instead of per key:
        # sort by (key, ts, etype-rank, val) — within each key segment
        # that is exactly the lexicographic (ts, etype, val) order the
        # per-key fold produced — then run the unchanged per-event
        # transition loop over each key's segment.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            batch = (chunks[0] if len(chunks) == 1
                     else pd.concat(chunks, ignore_index=True))
            key_a = batch["key"].to_numpy()
            ts_us_a = (batch["ts"].to_numpy().astype("datetime64[us]")
                       .astype("int64"))
            et_a = batch["etype"].to_numpy(dtype=object)
            val_a = batch["val"].to_numpy()
            uniq = np.unique(et_a)
            order = np.lexsort(
                (val_a, np.searchsorted(uniq, et_a), ts_us_a, key_a))
            k_s = key_a[order].tolist()
            ts_s = ts_us_a[order].tolist()
            et_s = et_a[order].tolist()
            val_s = val_a[order].tolist()
            i, n_ev = 0, len(k_s)
            while i < n_ev:
                k2 = k_s[i]
                partials = partials_by_key.get(k2, [])
                matches: list[tuple] = []
                timeouts: list[int] = []
                while i < n_ev and k_s[i] == k2:
                    ts_us, etype, val = ts_s[i], et_s[i], val_s[i]
                    i += 1
                    timeouts.extend(pf[1] for pf in partials
                                    if ts_us - pf[1] > within_us)
                    partials = [pf for pf in partials
                                if ts_us - pf[1] <= within_us]
                    nxt: list[list] = []
                    consumed = False  # did this event complete a match?
                    for pf in partials:
                        if etype in guards[pf[0]]:
                            continue  # forbidden type kills the partial
                            # (guard wins over a same-type positive
                            # step); the event may still start a fresh
                            # one below
                        step = positives[pf[0]]
                        hit = etype == step.etype and (
                            step.where is None or step.where(val))
                        if hit:
                            pf[0] += 1
                            if pf[0] == n_steps:
                                matches.append((pf[1], ts_us))
                                consumed = True
                            else:
                                nxt.append(pf)
                        elif mode == "contiguous":
                            pass  # strict contiguity: any non-matching
                            # event kills; the event may still start a
                            # fresh partial
                        else:
                            nxt.append(pf)
                    partials = nxt
                    # may this event open a new partial? single-partial
                    # modes only when the one automaton slot is free AND
                    # the event was not consumed by a completed match
                    # (skip PAST the match).
                    step0 = positives[0]
                    if (
                        mode == "every_start"
                        or (not partials and not consumed)
                    ) and (
                        etype == step0.etype
                        and (step0.where is None or step0.where(val))
                    ):
                        if n_steps == 1:
                            matches.append((ts_us, ts_us))
                        else:
                            partials.append([1, ts_us])
                if partials:
                    partials_by_key[k2] = partials
                else:
                    partials_by_key.pop(k2, None)
                matches.sort()
                timeouts.sort()
                match_rows.extend((k2, s, e) for s, e in matches)
                timeout_rows.extend((k2, f) for f in timeouts)
        # End-of-batch watermark cleanup for EVERY key in the bucket: a
        # deadline already behind the watermark can never complete with
        # on-time data. Per-key grouping reaches the no-event keys'
        # expired partials through this same micro-batch's
        # EventTimeTimeout phase (same watermark) — identical drops and
        # emissions, and the re-armed min deadline below stays strictly
        # above the watermark as EventTimeTimeout requires.
        for k2 in list(partials_by_key):
            plist = partials_by_key[k2]
            dead_f = sorted(pf[1] for pf in plist
                            if pf[1] // 1000 + within_s * 1000 <= wm_ms)
            if dead_f:
                timeout_rows.extend((k2, f) for f in dead_f)
                plist = [pf for pf in plist
                         if pf[1] // 1000 + within_s * 1000 > wm_ms]
                if plist:
                    partials_by_key[k2] = plist
                else:
                    del partials_by_key[k2]
        if partials_by_key:
            keys_o: list[int] = []
            prog_o: list[int] = []
            first_o: list[int] = []
            for k2, plist in partials_by_key.items():
                for p, f in plist:
                    keys_o.append(k2)
                    prog_o.append(p)
                    first_o.append(f)
            state.update((keys_o, prog_o, first_o))
            state.setTimeoutTimestamp(
                min(first_o) // 1000 + within_s * 1000)
        elif state.exists:
            state.remove()
        frame = _emit(match_rows, timeout_rows)
        if frame is not None:
            yield frame

    return ev.groupBy(group_col).applyInPandasWithState(
        advance,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _duration_seconds(text: str) -> int:
    """Parse '1 hour' / '30 minutes' / '45 seconds' (the subset Spark's
    interval strings use here) into seconds."""
    n, unit = text.strip().split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(n) * mult


def scd2_stream(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_buckets: int | None = None,
) -> DataFrame:
    """Streaming SCD Type-2 builder — the dimension-history operator a
    CDC feed materializes (a Debezium upsert stream becoming a
    time-travel table): per key, fold the change stream into validity
    intervals and emit each CLOSED version the moment the change that
    closes it is processed. State per key is ONE (current value,
    valid_from) pair — constant, not history-proportional: emitted
    versions are final and never revisited, which is what makes SCD2
    maintenance affordable on an unbounded stream.

    Ordering contract (the exactly_once_dedup/CEP convention): closed
    rows are exact when keys see their events in event-time order
    ACROSS batches — guaranteed by time-range replay batching (equal
    order values never straddle a range split); WITHIN a batch rows are
    sorted by (ts, id) here. A late event arriving after its key's
    interval closed would belong inside history — that correction
    requires a batch backfill (the scd2_user_state twin), not stream
    state; the operator's append semantics make the trade explicit.

    Consecutive equal values do NOT close an interval (SCD2 ignores
    no-op updates). The OPEN (current) version per key is never
    emitted: under append output it is not final until the stream ends.
    Output: (key, state, valid_from, valid_to).

    `key_buckets` groups state by pmod(xxhash64(key), B) instead of per
    key (0 forces per-key; None derives B = 16 × shuffle partitions at
    build time) — the same amortization as sequence_pattern_matches:
    the per-group fixed cost (frame build, state ser/de, Arrow framing)
    is paid once per bucket per batch, and the run-length fold below is
    vectorized ACROSS keys: rows sort by (key, ts, id), a key change
    forces a run boundary, each key's carried (cur, since) state is
    injected as a virtual row at its segment start (cur=None = "no
    carried run", suppressing the first emission exactly as before),
    and emissions require the predecessor row to be same-key and real.
    Per key the produced intervals and the carried state are
    bit-identical to the per-key fold (pinned by
    test_scd2_bucket_equivalence and the sf0.001/0.01/0.1 oracle).
    """
    out_schema = T.StructType([
        T.StructField("key", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("cur", T.ArrayType(T.StringType())),
        T.StructField("since_us", T.ArrayType(T.LongType())),
    ])
    if key_buckets is None:
        spark = stream.sparkSession
        key_buckets = 16 * int(
            spark.conf.get("spark.sql.shuffle.partitions", "8") or "8")
    src = stream
    if key_buckets > 0:
        src = src.withColumn(
            "__bkt",
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(key_buckets))
            .cast("int"))
        group_col = "__bkt"
    else:
        group_col = key_col

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        batch = (chunks[0] if len(chunks) == 1
                 else pd.concat(chunks, ignore_index=True))
        # state of the bucket's keys, carried forward untouched for
        # keys without events this batch
        st_keys: list[int] = []
        st_cur: list = []
        st_since: list[int] = []
        if state.exists:
            st_keys, st_cur, st_since = (list(a) for a in state.get)
        st_map = {kk: i for i, kk in enumerate(st_keys)}
        # one lexsort per bucket: (key, ts, id) — per-key segments see
        # the identical stable (ts, id) order the per-key fold used
        ts_raw = (batch[ts_col].to_numpy().astype("datetime64[us]")
                  .astype("int64"))
        k_raw = batch[key_col].to_numpy()
        order = np.lexsort((batch[id_col].to_numpy(), ts_raw, k_raw))
        k = k_raw[order]
        v_b = batch[value_col].to_numpy(dtype=object)[order]
        t_b = ts_raw[order]
        # virtual carried-state row at each key-segment start
        seg_start = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1])))
        seg_keys = k[seg_start]
        vcur = np.array(
            [st_cur[st_map[kk]] if kk in st_map else None
             for kk in seg_keys.tolist()], dtype=object)
        vsince = np.array(
            [st_since[st_map[kk]] if kk in st_map else -1
             for kk in seg_keys.tolist()], dtype="int64")
        k2 = np.insert(k, seg_start, seg_keys)
        v2 = np.insert(v_b, seg_start, vcur)
        t2 = np.insert(t_b, seg_start, vsince)
        # virtual-row positions in the merged arrays, and which of them
        # carry NO real run (cur is None)
        vpos = seg_start + np.arange(len(seg_start))
        none_vpos = vpos[np.array([c is None for c in vcur.tolist()],
                                  dtype=bool)] if len(vpos) else vpos
        prev_real = np.ones(len(k2), dtype=bool)
        prev_real[0] = False
        if len(none_vpos):
            prev_real[none_vpos + 1] = False  # prev row is a None-cur
            # virtual: nothing to close
        samekey_prev = np.zeros(len(k2), dtype=bool)
        samekey_prev[1:] = k2[1:] == k2[:-1]
        newrun = np.ones(len(k2), dtype=bool)
        newrun[1:] = (v2[1:] != v2[:-1]) | ~samekey_prev[1:]
        run_id = np.cumsum(newrun) - 1
        run_start = t2[newrun][run_id]
        emit = newrun & samekey_prev & prev_real
        idx = np.flatnonzero(emit)
        # new state per key = last merged row of its segment
        # segment i spans merged positions [vpos[i], vpos[i+1]-1]
        seg_end = np.concatenate((vpos[1:] - 1, [len(k2) - 1]))
        for kk, e in zip(seg_keys.tolist(), list(seg_end)):
            val, start = v2[e], int(run_start[e])
            if kk in st_map:
                i = st_map[kk]
                st_cur[i], st_since[i] = val, start
            else:
                st_map[kk] = len(st_keys)
                st_keys.append(kk)
                st_cur.append(val)
                st_since.append(start)
        state.update((st_keys, st_cur, st_since))
        if len(idx):
            # int64 µs -> M8[us] views, no pd.to_datetime (guide §4.2)
            yield pd.DataFrame(
                {
                    "key": k2[idx].astype("int64"),
                    "state": v2[idx - 1],
                    "valid_from": run_start[idx - 1].view("M8[us]"),
                    "valid_to": t2[idx].view("M8[us]"),
                }
            )

    return src.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
