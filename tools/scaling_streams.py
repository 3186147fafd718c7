"""Wall-time and STATE-GROWTH slopes for the streaming replay entries
(round-3 verdict #7: SCALING.md covered 36 batch entries; state growth
vs event density is exactly where 100x breaks streaming, and no replay
had a measured slope).

Runs representative stateful replays at sf0.1 and the tiled sf0.5/sf1
shards (tools/make_scale_fixtures.py — timestamps are deliberately NOT
shifted, so K tiled shards model K-fold EVENT DENSITY in the same time
range: watermark state per window grows the way a larger deployment's
would). Reports, per entry and SF:

- wall seconds (median of N runs, replay protocol from bench.py)
- peak state rows / bytes (from the query's stateOperators progress,
  captured via streaming.replay.LAST_REPLAY_METRICS)

and the log-log elasticities of both. Expected: state slope ~1 (state
rows proportional to keys/windows in flight — watermark GC holding),
wall slope <= ~1. A state slope substantially >1 means state is NOT
being bounded by the watermark (leak); wall >1.2 means a stateful
operator's per-batch work is super-linear.

Run: python tools/scaling_streams.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_spark import get_spark  # noqa: E402
from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402
from debezium_server_spark.streaming import replay  # noqa: E402

SF_DIRS = [
    (0.1, "/root/testdata/sf0.1"),
    (0.5, "/tmp/scaling/sf0.5"),
    (1.0, "/tmp/scaling/sf1"),
]

#: One representative per stateful-operator family: watermark dedup
#: (dropDuplicatesWithinWatermark state), stream-stream interval join
#: (two-sided buffered state), CEP automaton (applyInPandasWithState
#: per-key python state), watermark-sealed ranking (EventTimeTimeout
#: finalization), and overlapping hopping windows (state x
#: window/slide fan-out).
QUERIES = [
    "stream_dedup_watermark",
    "stream_interval_join",
    "stream_cep_matches",
    "stream_trending_topk",
    "stream_hopping_counts",
    # chained two-level stateful aggregation (round-4 addition): state
    # at both levels is windows-in-flight, expected slope ~0
    "stream_hourly_daily_rollup",
    # round-5 additions (round-4 verdict #7): the two heaviest round-4
    # replays and the composed flagship
    # SCD2: constant per-key state (one open version per key) — state
    # rows ∝ |keys|, and the tiled shards OFFSET user_id per copy, so
    # keys grow ×K → designed slope ~1 (keys-in-watermark family);
    # measured 1.0 ✓
    "stream_scd2_history",
    # HLL windowed distinct: windows-in-flight sketch state — rows ∝
    # |windows|, density-independent → slope ~0
    "stream_windowed_distinct_users",
    # the end-to-end flagship: its durable "state" is the epoch-
    # idempotent parquet upsert TABLE + corpus/band-index, not Spark
    # state-store rows, so peak_state_rows reads 0 here (metrics are
    # cleared per run — no leakage from prior entries) and WALL is the
    # signal; table growth itself is covered by the oracle at 3 SFs
    "stream_cdc_corpus_card",
]

RUNS = int(os.environ.get("SPARK_GRAFT_STREAM_RUNS", "3"))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_STREAMS.json"
    spark = get_spark("scaling-streams")

    rows: dict[str, dict] = {}
    for name in QUERIES:
        qd = CATALOG[name]
        per_sf: dict[str, dict] = {}
        for sf, d in SF_DIRS:
            samples, peak, bytes_ = [], 0, 0
            for _ in range(RUNS):
                replay.LAST_REPLAY_METRICS.clear()  # no cross-entry leak
                t0 = time.time()
                qd.spark_fn(spark, d).write.format("noop").mode(
                    "overwrite").save()
                samples.append(time.time() - t0)
                m = dict(replay.LAST_REPLAY_METRICS)
                peak = max(peak, m.get("peak_state_rows", 0))
                bytes_ = max(bytes_, m.get("state_bytes", 0))
            per_sf[str(sf)] = {
                "sec": round(statistics.median(samples), 3),
                "peak_state_rows": peak,
                "state_bytes": bytes_,
            }
        def slope(metric: str) -> float:
            a = max(per_sf["0.1"][metric], 1e-3)
            b = max(per_sf["1.0"][metric], 1e-3)
            return round(math.log(b / a) / math.log(10), 3)
        rows[name] = {
            **per_sf,
            "wall_slope": slope("sec"),
            "state_slope": slope("peak_state_rows"),
        }
        print(json.dumps({"query": name, **rows[name]}), flush=True)

    with open(out_path, "w") as f:
        json.dump({"sf_dirs": dict((str(s), d) for s, d in SF_DIRS),
                   "runs": RUNS, "queries": rows}, f, indent=1)
    flagged = {k: v for k, v in rows.items()
               if v["wall_slope"] > 1.2 or v["state_slope"] > 1.2}
    print(f"\nsuper-linear (slope>1.2): {sorted(flagged) or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
