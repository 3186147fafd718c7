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

# The pgoutput Relation declaration the end-to-end row decodes against
# (the schema-history shape: a stream cannot collect its own registry).
_PG_REL = {
    "type": "R", "relation_oid": 100, "namespace": "app",
    "relation_name": "events_pg", "replica_identity": "d",
    "columns": [
        {"key": True, "name": "id", "type_oid": 20, "type_mod": -1},
        {"key": False, "name": "cents", "type_oid": 20, "type_mod": -1},
    ],
}


def _ensure_pgoutput_wal(spark, sf: float, sf_dir: str) -> str:
    """Encode the SF's events as pgoutput WAL-message parquet ONCE per
    SF (outside the timed loop — generation cost is the encoder twin's,
    not the pipeline's). I/U/D by event_id mod 3, the catalog entry's
    convention."""
    import pandas as pd

    from debezium_server_spark.functions.pgoutput_codec import (
        encode_message,
    )
    from debezium_server_spark.plans.catalog import load

    out = f"/tmp/scaling_wal/sf{sf}"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    ev = load(spark, sf_dir, "events").select(
        "event_id", "value")

    def enc(batches):
        for pdf in batches:
            rows = []
            for eid, value in zip(pdf["event_id"], pdf["value"]):
                eid = int(eid)
                cents = str(int(float(value) * 100))
                tup = [("t", str(eid)), ("t", cents)]
                mod = eid % 3
                if mod == 0:
                    m = {"type": "I", "relation_oid": 100,
                         "new_tuple": tup}
                elif mod == 1:
                    m = {"type": "U", "relation_oid": 100,
                         "new_tuple": tup}
                else:
                    m = {"type": "D", "relation_oid": 100,
                         "old_tag": "K",
                         "old_tuple": [("t", str(eid)), ("n", None)]}
                rows.append((eid, encode_message(m)))
            yield pd.DataFrame(rows, columns=["seq", "data"])

    ev.mapInPandas(enc, "seq bigint, data binary").write.mode(
        "overwrite").parquet(out)
    return out


def _run_pgoutput_e2e(spark, wal_dir: str, work_dir: str,
                      table_format: str = "versioned") -> None:
    """One timed end-to-end run: WAL parquet stream → decode (registry
    closed over) → typed envelope (route = per-relation destination) →
    Pipeline → ParquetUpsertSink. The decode is STATELESS (no state
    store); durable state is the upsert table — peak_state_rows
    legitimately 0, wall is the signal (the flagship's convention)."""
    from pyspark.sql import functions as F

    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
    from debezium_server_spark.sources.pgoutput_source import (
        decode_data_messages,
    )
    from debezium_server_spark.streaming.pipeline import Pipeline

    stream = (spark.readStream.schema("seq long, data binary")
              .parquet(wal_dir))
    env = decode_data_messages(stream, {100: _PG_REL}).filter(
        "error is null")
    row_id = F.get_json_object(
        F.coalesce("after", "before"), "$.id").cast("long")
    typed = env.select(
        F.col("destination"),
        F.struct(row_id.alias("id")).alias("key"),
        F.struct(
            F.col("op"),
            F.when(F.col("after").isNotNull(), F.struct(
                F.get_json_object("after", "$.id").cast("long")
                 .alias("id"),
                F.get_json_object("after", "$.cents").cast("long")
                 .alias("cents"))).alias("after"),
            F.struct(F.col("seq").alias("lsn")).alias("source"),
            F.col("seq").alias("ts_ms")).alias("value"))
    sink = ParquetUpsertSink(root_path=os.path.join(work_dir, "state"),
                             key_fields=("id",),
                             table_format=table_format)
    q = Pipeline(typed).start(sink, os.path.join(work_dir, "ckpt"))
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("pgoutput e2e pipeline did not finish")


_LM_SCHEMA = ("fetch_seq long, scn long, operation_code int, "
              "seg_owner string, table_name string, sql_redo string, "
              "xid string, row_id string, rs_id string, ssn long, "
              "csf int")


def _ensure_logminer_poll(spark, sf: float, sf_dir: str) -> str:
    """Synthesize the SF's events as a V$LOGMNR_CONTENTS poll export
    ONCE per SF (complete csf=0 statements — the streaming decode is
    stateless). I/U/D by event_id mod 3, the catalog entry's SQL
    shapes."""
    from pyspark.sql import functions as F

    from debezium_server_spark.plans.catalog import load

    out = f"/tmp/scaling_logminer/sf{sf}"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.expr("event_id % 3").alias("mod3"))
    redo = (
        F.when(F.col("mod3") == 0, F.format_string(
            'insert into "APP"."EVENTS"("ID","KIND") values (%s,\'%s\');',
            F.col("event_id"), F.col("event_type")))
        .when(F.col("mod3") == 1, F.format_string(
            'update "APP"."EVENTS" set "KIND" = \'promoted\' '
            'where "ID" = %s and "KIND" = \'%s\';',
            F.col("event_id"), F.col("event_type")))
        .otherwise(F.format_string(
            'delete from "APP"."EVENTS" where "ID" = %s;',
            F.col("event_id"))))
    (ev.select(
        F.col("event_id").alias("fetch_seq"),
        (F.col("event_id") + 4096).cast("long").alias("scn"),
        F.when(F.col("mod3") == 0, 1).when(F.col("mod3") == 1, 3)
        .otherwise(2).cast("int").alias("operation_code"),
        F.lit("APP").alias("seg_owner"),
        F.lit("EVENTS").alias("table_name"),
        redo.alias("sql_redo"),
        F.upper(F.lpad(F.hex(F.col("event_id")), 16, "0")).alias("xid"),
        F.concat(F.lit("AAA"), F.col("event_id")).alias("row_id"),
        F.concat(F.lit("rs"), F.col("event_id")).alias("rs_id"),
        F.lit(0).cast("long").alias("ssn"),
        F.lit(0).cast("int").alias("csf"))
     .write.mode("overwrite").parquet(out))
    return out


def _run_logminer_e2e(spark, poll_dir: str, work_dir: str) -> None:
    """One timed run of the FIFTH capture mechanism end to end: poll
    export stream → stateless redo-SQL decode → typed envelope →
    Pipeline → ParquetUpsertSink. Stateless like the pgoutput twin —
    durable state is the upsert table, wall is the signal."""
    from pyspark.sql import functions as F

    from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
    from debezium_server_spark.sources.logminer_source import (
        decode_logminer_changes_stateless,
    )
    from debezium_server_spark.streaming.pipeline import Pipeline

    stream = spark.readStream.schema(_LM_SCHEMA).parquet(poll_dir)
    env = decode_logminer_changes_stateless(stream, "srv").filter(
        "error is null")
    row_id = F.get_json_object(
        F.coalesce("after", "before"), "$.ID").cast("long")
    typed = env.select(
        F.col("destination"),
        F.struct(row_id.alias("id")).alias("key"),
        F.struct(
            F.col("op"),
            F.when(F.col("after").isNotNull(), F.struct(
                F.get_json_object("after", "$.ID").cast("long")
                 .alias("id"),
                F.get_json_object("after", "$.KIND").alias("kind"))
            ).alias("after"),
            F.struct(F.col("scn").alias("lsn")).alias("source"),
            F.conv(F.col("scn"), 16, 10).cast("long").alias("ts_ms")
        ).alias("value"))
    sink = ParquetUpsertSink(root_path=os.path.join(work_dir, "state"),
                             key_fields=("id",),
                             order_cols=("value.source.lsn",
                                         "value.ts_ms"))
    q = Pipeline(typed).start(sink, os.path.join(work_dir, "ckpt"))
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("logminer e2e pipeline did not finish")


def logminer_e2e_rows(spark) -> dict:
    """SCALING_STREAMS row for the LogMiner source through the real
    pipeline — wall ~linear in poll rows (redo parse is per-row
    Python inside Arrow batches), state is the sink table."""
    import shutil
    import tempfile

    per_sf: dict[str, dict] = {}
    for sf, d in SF_DIRS:
        poll = _ensure_logminer_poll(spark, sf, d)
        samples = []
        for _ in range(RUNS):
            work = tempfile.mkdtemp(prefix="lm_e2e_")
            t0 = time.time()
            _run_logminer_e2e(spark, poll, work)
            samples.append(time.time() - t0)
            shutil.rmtree(work, ignore_errors=True)
        per_sf[str(sf)] = {"sec": round(statistics.median(samples), 3),
                           "peak_state_rows": 0, "state_bytes": 0}

    def slope(metric: str) -> float:
        a = max(per_sf["0.1"][metric], 1e-3)
        b = max(per_sf["1.0"][metric], 1e-3)
        return round(math.log(b / a) / math.log(10), 3)

    return {**per_sf, "wall_slope": slope("sec"),
            "state_slope": slope("peak_state_rows")}


def pgoutput_e2e_rows(spark, table_format: str = "versioned") -> dict:
    """SCALING_STREAMS row for the wire-decode SOURCE driven through
    the real pipeline (round-5 verdict #7): wall should scale ~linearly
    with WAL bytes, state is the sink table (slope n/a, reported 0)."""
    import shutil
    import tempfile

    per_sf: dict[str, dict] = {}
    for sf, d in SF_DIRS:
        wal = _ensure_pgoutput_wal(spark, sf, d)
        samples = []
        for _ in range(RUNS):
            work = tempfile.mkdtemp(prefix="pg_e2e_")
            t0 = time.time()
            _run_pgoutput_e2e(spark, wal, work, table_format)
            samples.append(time.time() - t0)
            shutil.rmtree(work, ignore_errors=True)
        per_sf[str(sf)] = {"sec": round(statistics.median(samples), 3),
                           "peak_state_rows": 0, "state_bytes": 0}

    def slope(metric: str) -> float:
        a = max(per_sf["0.1"][metric], 1e-3)
        b = max(per_sf["1.0"][metric], 1e-3)
        return round(math.log(b / a) / math.log(10), 3)

    return {**per_sf, "wall_slope": slope("sec"),
            "state_slope": slope("peak_state_rows")}


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

    # the wire-decode source, end-to-end through Pipeline.start
    rows["pgoutput_wal_pipeline_e2e"] = pgoutput_e2e_rows(spark)
    print(json.dumps({"query": "pgoutput_wal_pipeline_e2e",
                      **rows["pgoutput_wal_pipeline_e2e"]}), flush=True)
    # same pipeline, Iceberg storage layer: wall picks up the
    # control-plane cost (manifests + metadata per epoch) — expected
    # flat-ish state, near-identical wall slope to the versioned row
    rows["iceberg_upsert_pipeline_e2e"] = pgoutput_e2e_rows(
        spark, table_format="iceberg")
    print(json.dumps({"query": "iceberg_upsert_pipeline_e2e",
                      **rows["iceberg_upsert_pipeline_e2e"]}), flush=True)
    # the fifth capture mechanism, end-to-end (round 7)
    rows["logminer_pipeline_e2e"] = logminer_e2e_rows(spark)
    print(json.dumps({"query": "logminer_pipeline_e2e",
                      **rows["logminer_pipeline_e2e"]}), flush=True)

    with open(out_path, "w") as f:
        json.dump({"sf_dirs": dict((str(s), d) for s, d in SF_DIRS),
                   "runs": RUNS, "queries": rows}, f, indent=1)
    flagged = {k: v for k, v in rows.items()
               if v["wall_slope"] > 1.2 or v["state_slope"] > 1.2}
    print(f"\nsuper-linear (slope>1.2): {sorted(flagged) or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
