"""Isolated per-entry bench: time a subset of catalog entries exactly the
way bench.py does (noop sink, best-of-3 batch / median-of-3 stream), in a
fresh session, without paying for the whole catalog. The optimization
round's measure/re-measure loop (guide §1) runs through this.

Usage: python tools/bench_entries.py [--sf SF_DIR] [--runs N] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_server_spark.plans.catalog import CATALOG  # noqa: E402
from debezium_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import bench

    spark = get_spark("bench-entries", extra_conf={
        "spark.sql.streaming.stateStore.maintenanceInterval": "10s"})
    # same warmup discipline as bench.py
    CATALOG["cdc_event_counts"].spark_fn(spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    bench.calibration_replay(spark)

    out: dict[str, dict] = {}
    for name in args.names:
        qd = CATALOG[name]
        is_stream = name.startswith("stream_")
        samples = []
        spark.sparkContext.setJobDescription(f"bench:{name}")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            qd.spark_fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        val = (statistics.median(samples) if is_stream else min(samples))
        out[name] = {"val": round(val, 3), "runs": samples}
        print(f"{name}: {val:.3f}s  runs={samples}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
