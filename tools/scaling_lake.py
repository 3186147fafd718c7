"""Lake HOT-PATH scaling: wall vs HISTORY DEPTH for the bucket-pruned
point operations (round-7 verdict #5).

The 100 TB centerpiece claim is that a micro-batch merge, a GDPR
erase, and a partial compaction cost O(touched buckets), NOT O(table):
untouched buckets' files are never listed, untouched manifests never
opened, and the control plane is bounded (delta log replay is
O(checkpoint interval); iceberg reads one manifest list + touched
manifests; the versioned layer lists only touched __bucket dirs).
This harness MEASURES that: build each storage layer's table to
history depths 1x/5x/10x (8/40/80 epochs of DISJOINT key ranges, so
table rows AND commit history both grow 10x), then time a fixed probe
at each depth:

- merge:   one micro-batch of 50 keys confined to 2 of 64 buckets
           through the full ParquetUpsertSink.handle path
- erase:   erase_keys for 10 keys (2 buckets touched)
- compact: partial compaction of 2 buckets

Expected wall slope vs depth ~0 (flat — the probe touches the same 2
buckets regardless of table size). Slope > 0.3 flags a hot path that
secretly walks history.

Run: python tools/scaling_lake.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from debezium_server_spark import get_spark  # noqa: E402

N_BUCKETS = 64
KEYS_PER_EPOCH = 4000
DEPTHS = [8, 40, 80]  # 1x / 5x / 10x history
PROBE_BUCKETS = [0, 1]
RUNS = int(os.environ.get("SPARK_GRAFT_LAKE_RUNS", "3"))

SCHEMA = ("destination string, key struct<id:long>, "
          "value struct<op:string, before struct<id:long,name:string>, "
          "after struct<id:long,name:string>, "
          "source struct<lsn:long>, ts_ms long>, "
          "headers array<struct<key:string,value:string>>, partition int")


def _envelope(spark, ids_df, lsn0: int):
    """ids_df(id long) -> changelog envelope batch (all upserts)."""
    return ids_df.select(
        F.lit("t").alias("destination"),
        F.struct(F.col("id")).alias("key"),
        F.struct(
            F.lit("u").alias("op"),
            F.lit(None).cast("struct<id:long,name:string>").alias("before"),
            F.struct(F.col("id"),
                     F.concat(F.lit("n"), F.col("id")).alias("name"))
            .alias("after"),
            F.struct((F.col("id") + lsn0).alias("lsn")).alias("source"),
            (F.col("id") + lsn0).alias("ts_ms")).alias("value"),
        F.lit([]).cast(
            "array<struct<key:string,value:string>>").alias("headers"),
        F.lit(0).alias("partition"))


def _probe_keys(spark, bucket_expr, n: int = 50):
    """Keys (outside every epoch's range) hashing into PROBE_BUCKETS —
    the fixed 2-bucket micro-batch. Bounded driver-side collect."""
    cand = (spark.range(10_000_000, 10_200_000)
            .withColumn("__b", bucket_expr)
            .filter(F.col("__b").isin(PROBE_BUCKETS))
            .limit(n).select("id"))
    return [r["id"] for r in cand.collect()]


def _slope(xs: list[int], ys: list[float]) -> float:
    lo = (math.log(max(ys[0], 1e-3)), math.log(xs[0]))
    hi = (math.log(max(ys[-1], 1e-3)), math.log(xs[-1]))
    return round((hi[0] - lo[0]) / (hi[1] - lo[1]), 3)


def run_layer(spark, fmt: str) -> dict:
    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink

    root = tempfile.mkdtemp(prefix=f"lake_scale_{fmt}_")
    sink = ParquetUpsertSink(root, key_fields=("id",),
                             n_buckets=N_BUCKETS, table_format=fmt)
    table = sink._table("t")
    probe_ids = _probe_keys(spark, table.bucket_expr(("id",)))
    probe_df = _envelope(
        spark, spark.createDataFrame([(i,) for i in probe_ids], "id long"),
        lsn0=10 ** 9).cache()
    probe_df.count()
    erase_keys = spark.createDataFrame(
        [(i,) for i in probe_ids[:10]], "id long").cache()
    erase_keys.count()

    depths: dict[str, dict] = {}
    epoch = 0
    lsn = 0
    for depth in DEPTHS:
        while epoch < depth:  # grow history incrementally
            ids = spark.range(epoch * KEYS_PER_EPOCH,
                              (epoch + 1) * KEYS_PER_EPOCH)
            sink(_envelope(spark, ids, lsn0=lsn), epoch)
            lsn += KEYS_PER_EPOCH
            epoch += 1
        timings: dict[str, float] = {}
        # merge probe: same 50 keys / 2 buckets at every depth
        samples = []
        for r in range(RUNS):
            t0 = time.time()
            sink(probe_df, 100_000 + depth * 10 + r)
            samples.append(time.time() - t0)
        timings["merge_sec"] = round(statistics.median(samples), 3)
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            sink.erase_keys(spark, "t", erase_keys)
            samples.append(time.time() - t0)
            sink(probe_df, 200_000 + depth * 10 + _)  # restore keys
        timings["erase_sec"] = round(statistics.median(samples), 3)
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            table.compact(spark, buckets=PROBE_BUCKETS)
            samples.append(time.time() - t0)
        timings["compact_sec"] = round(statistics.median(samples), 3)
        nrows = table.read(spark).count()
        depths[str(depth)] = {**timings, "table_rows": nrows,
                              "commits": table.current_version()}
        print(json.dumps({"layer": fmt, "depth": depth, **depths[str(depth)]}),
              flush=True)
    probe_df.unpersist()
    erase_keys.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    out = {"depths": depths}
    for op in ("merge_sec", "erase_sec", "compact_sec"):
        out[f"{op}_slope_vs_depth"] = _slope(
            DEPTHS, [depths[str(d)][op] for d in DEPTHS])
    return out


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_LAKE.json"
    spark = get_spark("scaling-lake")
    rows = {}
    for fmt in ("versioned", "delta", "iceberg"):
        rows[fmt] = run_layer(spark, fmt)
    with open(out_path, "w") as f:
        json.dump({"n_buckets": N_BUCKETS, "keys_per_epoch": KEYS_PER_EPOCH,
                   "depths": DEPTHS, "probe_buckets": PROBE_BUCKETS,
                   "runs": RUNS, "layers": rows}, f, indent=1)
    flagged = sorted(
        f"{fmt}:{op}" for fmt, r in rows.items()
        for op in ("merge_sec", "erase_sec", "compact_sec")
        if r[f"{op}_slope_vs_depth"] > 0.3)
    print(f"\nhistory-dependent hot paths (slope>0.3): {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
