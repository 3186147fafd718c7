"""Benchmark: run every catalog query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, ...}.

Each query is fully materialized via the noop sink (computes the whole
plan, no driver-side result transfer skewing the numbers).

Comparability protocol (round-3 verdict #2 — round-over-round deltas
must be attributable):

- **batch entries**: best-of-N (default 3) — later runs reuse compiled
  plans/codegen, so min() measures the engine, not JIT/GC jitter.
- **stream_* replay entries**: MEDIAN-of-N (default 3,
  $SPARK_GRAFT_STREAM_RUNS). Each run replays a full streaming query
  (fresh checkpoint + state stores), so best-of-N would just pick the
  luckiest host window; the median is the honest central tendency that
  made round-3's uniform +25-45% stream drift impossible to separate
  from a code regression.
- **calibration replay**: a fixture-independent trivial replay (1k rows,
  4 batches, one windowed count) run N times; its median is the
  per-replay FIXED cost (state-store init + micro-batch + no-data batch
  + checkpoint IO) on this host at this moment. `stream_fixed_sec` =
  calibration x n_stream estimates the floor under the stream total;
  dividing another round's stream timings by the calibration ratio
  normalizes out host speed.
- totals are split: `batch_total` (sum of batch best) + `stream_total`
  (sum of stream medians); `value` remains their sum for continuity
  with BENCH_r01-r03.

Output contract (learned from round 1): the driver records only the LAST
2000 CHARS of stdout and parses the JSON out of that window — so stdout
is EXACTLY ONE compact JSON line kept under ~1.9 KB: summary fields +
the slowest queries' timings inline until the budget is hit; the
COMPLETE per-query map (including per-run stream timings) is written to
BENCH_DETAIL.json next to this script.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402
from debezium_server_spark.session import get_spark  # noqa: E402


def calibration_replay(spark) -> None:
    """Fixture-independent minimal stateful replay: measures the fixed
    cost every stream_* entry pays (file-source micro-batches, one
    stateful aggregate's state stores, the trailing no-data batch,
    checkpoint IO) with negligible data so the timing IS the floor."""
    from pyspark.sql import functions as F

    from debezium_server_spark.streaming.replay import replay_stream

    df = spark.range(1000).select(
        F.col("id"),
        F.timestamp_seconds(F.col("id") * 60 + 1_000_000_000).alias("ts"),
    )

    def xf(s):
        return (s.withWatermark("ts", "1 hour")
                 .groupBy(F.window("ts", "1 hour")).count())

    replay_stream(spark, df, xf, ts_col="ts", n_batches=4).count()


def batch_calibration(spark) -> None:
    """Fixture-independent batch probe — the batch twin of
    `calibration_replay` (round-6 verdict #2): fixed CPU work (md5
    over 4M rows) + one shuffle (256-group agg) + a sort, written to
    noop. Its median timing measures THIS HOST's batch speed at bench
    time; dividing every batch entry by it yields a host-drift-free
    `normalized` metric, so round-over-round comparisons gate on plan
    cost instead of hand-argued host-variance waivers."""
    from pyspark.sql import functions as F

    df = spark.range(4_000_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h"))
    agg = (df.groupBy(F.substring("h", 1, 2).alias("b"))
           .agg(F.count("*").alias("c"), F.max("h").alias("m")))
    agg.orderBy("b").write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Bench-session-only tuning: 25+ stream replays back to back leave
    # each query's state-store providers loaded until the maintenance
    # tick notices the query ended (default 60s) — dozens of stale
    # providers pile up in executor heap and tax later entries. A 10s
    # tick unloads them promptly (measured: ~10% median improvement
    # across the stream family, BENCH_NOTES §Round 7). Long-running
    # production streams keep the 60s default (this is NOT in
    # get_spark's engine defaults).
    spark = get_spark("bench", extra_conf={
        "spark.sql.streaming.stateStore.maintenanceInterval": "10s"})
    # warm the JVM/codegen once on a cheap query so q1 doesn't pay startup
    CATALOG["cdc_event_counts"].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    stream_runs = int(os.environ.get("SPARK_GRAFT_STREAM_RUNS", "3"))

    # batch calibration: one discarded warmup (codegen), then median —
    # the host-speed anchor for per-entry `normalized` values. Median
    # of FIVE (round-8 gate finding: the 3-sample anchor swung ±30%
    # across same-day sessions, which inflated normalized ratios on
    # sub-second entries more than the entries themselves drifted).
    # Same probe, more samples — the unit is unchanged, so anchors
    # stay comparable across rounds.
    batch_cal_times = []
    for i in range(max(runs, 5) + 1):
        t0 = time.perf_counter()
        batch_calibration(spark)
        if i > 0:
            batch_cal_times.append(time.perf_counter() - t0)
    batch_cal = round(statistics.median(batch_cal_times), 3)

    # stream calibration (also warms the streaming machinery so the
    # first stream_* entry doesn't pay one-time class-loading)
    cal_times = []
    for _ in range(max(stream_runs, 5)):
        t0 = time.perf_counter()
        calibration_replay(spark)
        cal_times.append(time.perf_counter() - t0)
    calibration = round(statistics.median(cal_times), 3)

    timings: dict[str, float] = {}
    stream_all_runs: dict[str, list[float]] = {}
    batch_total = 0.0
    stream_total = 0.0
    for name, qd in CATALOG.items():
        is_stream = name.startswith("stream_")
        n_runs = stream_runs if is_stream else runs
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        if is_stream:
            val = statistics.median(samples)
            stream_all_runs[name] = [round(s, 3) for s in samples]
            stream_total += val
        else:
            val = min(samples)
            batch_total += val
        timings[name] = round(val, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    n_stream = len(stream_all_runs)
    total = batch_total + stream_total

    # ---- warm overlapped stream series (round-8 verdict item 3) ----
    # The cold series above charges every replay its full fixed floor
    # (state-store init + micro-batch machinery + checkpoint IO)
    # because the driver's methodology times entries one at a time.
    # Real deployments overlap independent streams (guide §2.6), so ALSO
    # measure the family once with N replays in flight: per-entry wall
    # plus the family wall, reported as additional fields — the cold
    # per-entry numbers and their methodology are untouched, and the
    # overlapped pass runs strictly AFTER the cold loop so it cannot
    # contaminate those timings.
    from concurrent.futures import ThreadPoolExecutor

    from debezium_server_spark.streaming.replay import REPLAY_SESSION_CONFS

    warm_workers = int(os.environ.get("SPARK_GRAFT_STREAM_WARM_WORKERS", "3"))
    stream_names = list(stream_all_runs)
    warm_times: dict[str, float] = {}
    # pre-set the replay confs so concurrent replay_stream calls
    # set/restore identical values (no cross-thread conf race window)
    warm_prev = {k: spark.conf.get(k, None) for k in REPLAY_SESSION_CONFS}
    for k, v in REPLAY_SESSION_CONFS.items():
        spark.conf.set(k, v)

    def _warm_one(name: str) -> None:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.perf_counter()
        CATALOG[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        warm_times[name] = round(time.perf_counter() - t0, 3)

    t_wall = time.perf_counter()
    with ThreadPoolExecutor(max_workers=warm_workers) as pool:
        list(pool.map(_warm_one, stream_names))
    stream_warm_wall = round(time.perf_counter() - t_wall, 3)
    for k, v in warm_prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    print(f"stream warm wall ({warm_workers} workers): "
          f"{stream_warm_wall}s", file=sys.stderr)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    # round-8 gate finding: BENCH_DETAIL.json is overwritten by the last
    # run, so a different-core-count run destroys the per-run samples
    # that would diagnose an outlier median after the fact. Persist a
    # per-cpu-count copy alongside (additive; the timed path, stdout
    # line and BENCH_DETAIL.json contract are unchanged).
    cpus_label = os.environ.get("SPARK_GRAFT_CPUS", "") or str(
        os.cpu_count() or 0)
    detail_cpu_path = os.path.join(here, f"BENCH_DETAIL_c{cpus_label}.json")
    # host-drift-free per-entry metric: seconds ÷ the matching probe's
    # seconds (batch probe for batch entries, stream replay probe for
    # stream entries) — unitless multiples of fixed host work, the
    # value bench_compare gates on
    normalized = {
        name: round(t / (calibration if name in stream_all_runs
                         else batch_cal), 3)
        for name, t in timings.items()}
    # round-7 verdict #4: the stream family's measured wall is ~3s/entry
    # of session/checkpoint machinery (stream_fixed_sec), which caps the
    # gate's resolution on exactly the entries most worth watching — so
    # also emit the FLOOR-SUBTRACTED normalized value (operator work in
    # probe units: (sec - calibration)/calibration, floored at 0.05) for
    # stream entries; bench_compare gates stream entries on this when
    # both sides carry it
    normalized_net = {
        name: round(max((t - calibration) / calibration, 0.05), 3)
        for name, t in timings.items() if name in stream_all_runs}
    summary = {
        "metric": "catalog_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf_val,
        "batch_total": round(batch_total, 3),
        "stream_total": round(stream_total, 3),
        "n_batch": len(timings) - n_stream,
        "n_stream": n_stream,
        "batch_calibration_sec": batch_cal,
        "stream_calibration_sec": calibration,
        "stream_fixed_sec": round(calibration * n_stream, 1),
        "runs": runs,
        "stream_runs": stream_runs,
        "stream_warm_wall_sec": stream_warm_wall,
        "stream_warm_workers": warm_workers,
    }
    detail_doc = {**summary, "queries": timings,
                  "stream_warm": warm_times,
                  "normalized": normalized,
                  "normalized_net": normalized_net,
                  "stream_runs_all": stream_all_runs,
                  "calibration_runs": [round(c, 3) for c in cal_times],
                  "batch_calibration_runs": [round(c, 3)
                                             for c in batch_cal_times]}
    for path in (detail_path, detail_cpu_path):
        with open(path, "w") as f:
            json.dump(detail_doc, f, indent=1)

    # Stdout line: summary + slowest-first inline timings, hard-capped so
    # the whole line fits the driver's 2000-char tail window.
    budget = 1850
    base = {**summary, "detail": "BENCH_DETAIL.json", "queries": {}}
    line = ""
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        base["queries"][name] = t
        candidate = json.dumps(base, separators=(",", ":"))
        if len(candidate) > budget:
            del base["queries"][name]
            break
        line = candidate
    print(line or json.dumps(base, separators=(",", ":")))


if __name__ == "__main__":
    main()
