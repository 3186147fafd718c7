"""Benchmark: run every catalog query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized via the noop sink (computes the whole
plan, no driver-side result transfer skewing the numbers).

Output contract (learned from round 1): the driver records only the LAST
2000 CHARS of stdout and parses the JSON out of that window — a
full 107-query map is ~3 KB and got its head truncated, leaving
BENCH_r01 unparseable. So stdout is EXACTLY ONE compact JSON line kept
under ~1.9 KB: summary fields + the slowest queries' timings inline
(most informative first) until the budget is hit; the COMPLETE
per-query map is written to BENCH_DETAIL.json next to this script
(committed to the repo, pointed to by the "detail" field).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402
from debezium_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    # warm the JVM/codegen once on a cheap query so q1 doesn't pay startup
    CATALOG["cdc_event_counts"].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # best-of-N per query: later runs reuse compiled plans/codegen, so
    # min() measures the engine, not JIT/GC jitter (observed variance at
    # sf0.1: a query's first two runs can both pay multi-second codegen
    # while an isolated re-run takes 0.6s — 3 runs bound that noise)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    total = 0.0
    for name, qd in CATALOG.items():
        # stream_* entries replay a full streaming query per run (fresh
        # checkpoint, fixed state-store + micro-batch costs) — best-of-N
        # buys no codegen-reuse there and triples the dominant block
        # (~19 entries x ~6 s); a single run is as stable.
        n_runs = 1 if name.startswith("stream_") else runs
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qd.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "catalog_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs": runs,
            },
            f,
            indent=1,
        )

    # Stdout line: summary + slowest-first inline timings, hard-capped so
    # the whole line fits the driver's 2000-char tail window.
    budget = 1850
    base = {
        "metric": "catalog_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        "queries": {},
    }
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
