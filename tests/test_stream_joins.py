"""Stream-stream interval join: two live file streams, watermarked state."""

import json

from debezium_server_spark.streaming.joins import interval_join


def _write(path, name, rows):
    with open(f"{path}/{name}", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .json(str(path))
        .selectExpr("*", "CAST(ts AS TIMESTAMP) AS ets")
        .drop("ts")
        .withColumnRenamed("ets", "ts")
    )


def _run_collect(out_stream, tmp_path, mode="append"):
    rows = []
    q = (
        out_stream.writeStream.outputMode(mode)
        .foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_interval_join_two_streams(spark, tmp_path):
    orders_dir, pay_dir = tmp_path / "orders", tmp_path / "pays"
    orders_dir.mkdir(), pay_dir.mkdir()
    _write(orders_dir, "o.jsonl", [
        {"user": "u1", "ts": "2024-01-01 10:00:00", "order_id": "o1"},
        {"user": "u2", "ts": "2024-01-01 10:05:00", "order_id": "o2"},
        {"user": "u3", "ts": "2024-01-01 10:00:00", "order_id": "o3"},
    ])
    _write(pay_dir, "p.jsonl", [
        {"user": "u1", "ts": "2024-01-01 10:10:00", "pay_id": "p1"},  # +10m ✓
        {"user": "u2", "ts": "2024-01-01 10:30:00", "pay_id": "p2"},  # +25m ✗
        {"user": "u3", "ts": "2024-01-01 09:59:00", "pay_id": "p3"},  # before ✗
    ])
    orders = _stream(spark, orders_dir, "user string, ts string, order_id string")
    pays = _stream(spark, pay_dir, "user string, ts string, pay_id string")
    out = interval_join(
        orders, pays, on="user", left_ts="ts", right_ts="ts",
        upper="interval 15 minutes",
    )
    rows = _run_collect(out, tmp_path)
    got = sorted((r["user"], r["l_order_id"], r["r_pay_id"]) for r in rows)
    assert got == [("u1", "o1", "p1")]


def test_interval_join_streaming_plan_is_stateful(spark, tmp_path):
    """The joined stream must actually be a streaming plan (not collapsed
    to batch) and both sides watermarked — the bounded-state contract."""
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    s1 = _stream(spark, d1, "user string, ts string, x string")
    s2 = _stream(spark, d2, "user string, ts string, y string")
    out = interval_join(s1, s2, on="user", left_ts="ts", right_ts="ts")
    assert out.isStreaming
    assert "l_x" in out.columns and "r_y" in out.columns and "user" in out.columns


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter: unmatched left rows emit with nulls once the watermark
    proves no match can arrive (a far-future event seals the horizon)."""
    import os
    import time

    orders_dir, pay_dir = tmp_path / "orders", tmp_path / "pays"
    orders_dir.mkdir(), pay_dir.mkdir()
    t0 = time.time()
    _write(orders_dir, "o.jsonl", [
        {"user": "u1", "ts": "2024-01-01 10:00:00", "order_id": "o1"},
        {"user": "u2", "ts": "2024-01-01 10:00:00", "order_id": "o2"},  # no pay
    ])
    os.utime(orders_dir / "o.jsonl", (t0, t0))
    _write(pay_dir, "p.jsonl", [
        {"user": "u1", "ts": "2024-01-01 10:10:00", "pay_id": "p1"},
    ])
    os.utime(pay_dir / "p.jsonl", (t0, t0))
    # second batch: far-future rows on BOTH sides push both watermarks
    # past u2's join horizon so its null-padded row can finalize
    _write(orders_dir, "o2.jsonl", [
        {"user": "zz", "ts": "2024-01-01 13:00:00", "order_id": "o9"},
    ])
    os.utime(orders_dir / "o2.jsonl", (t0 + 10, t0 + 10))
    _write(pay_dir, "p2.jsonl", [
        {"user": "zz", "ts": "2024-01-01 13:00:00", "pay_id": "p9"},
    ])
    os.utime(pay_dir / "p2.jsonl", (t0 + 10, t0 + 10))

    orders = _stream(spark, orders_dir, "user string, ts string, order_id string")
    pays = _stream(spark, pay_dir, "user string, ts string, pay_id string")
    out = interval_join(
        orders, pays, on="user", left_ts="ts", right_ts="ts",
        upper="interval 15 minutes", watermark="10 minutes", how="leftOuter",
    )
    rows = _run_collect(out, tmp_path)
    by_user = {r["user"]: r for r in rows}
    assert by_user["u1"]["r_pay_id"] == "p1"
    assert "u2" in by_user, "unmatched left row must emit after watermark"
    assert by_user["u2"]["r_pay_id"] is None


def test_stream_static_enrichment(spark, tmp_path):
    """Dimension parquet is re-read per micro-batch: a dim row upserted
    between batches enriches the second batch's events."""
    import json
    import os

    from debezium_server_spark.streaming.joins import enrich_with_dimension

    src = str(tmp_path / "stream")
    dimdir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    os.makedirs(src)

    spark.createDataFrame([(1, "gold")], "cust long, tier string").write.parquet(dimdir)

    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        f.write(json.dumps({"order_id": 10, "cust": 1}) + "\n")
        f.write(json.dumps({"order_id": 11, "cust": 2}) + "\n")

    stream = spark.readStream.schema("order_id long, cust long").json(src)
    dim = spark.read.parquet(dimdir)
    enriched = enrich_with_dimension(stream, dim, on="cust")

    q = (
        enriched.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = {(r["order_id"], r["tier"]) for r in spark.read.parquet(outdir).collect()}
    assert first == {(10, "gold"), (11, None)}  # cust 2 not in dim yet

    # dim upsert lands between batches; new events see it
    spark.createDataFrame([(2, "silver")], "cust long, tier string").write.mode(
        "append"
    ).parquet(dimdir)
    with open(os.path.join(src, "b2.jsonl"), "w") as f:
        f.write(json.dumps({"order_id": 12, "cust": 2}) + "\n")
    q = (
        enrich_with_dimension(
            spark.readStream.schema("order_id long, cust long").json(src),
            spark.read.parquet(dimdir),
            on="cust",
        )
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["order_id"], r["tier"]) for r in spark.read.parquet(outdir).collect()}
    assert (12, "silver") in rows


def _outer_replay(spark, view_driver_ts, purchase_driver_ts):
    import datetime as dt

    from pyspark.sql import functions as F

    from debezium_server_spark.streaming.joins import interval_join
    from debezium_server_spark.streaming.replay import replay_stream

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), "view", 100),   # unmatched
        (2, dt.datetime(2024, 1, 1, 0, 25), "view", 101),
        (2, dt.datetime(2024, 1, 1, 0, 30), "purchase", 102),
        (8, view_driver_ts, "view", 108),        # views-branch max
        (9, purchase_driver_ts, "purchase", 109),  # purchase-branch max
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")

    def xform(s):
        v = s.filter(F.col("event_type") == "view").drop("event_type")
        p = s.filter(F.col("event_type") == "purchase").drop("event_type")
        return interval_join(
            v, p, on="user_id", left_ts="ts", right_ts="ts",
            upper="interval 1 hour", watermark="30 minutes", how="leftOuter",
            left_alias="v", right_alias="p")

    out = replay_stream(spark, df, xform, n_batches=2)
    return sorted((r["user_id"], r["v_event_id"], r["p_event_id"])
                  for r in out.collect())


def test_outer_interval_join_min_basis_and_strictness(spark):
    """The emission basis for outer-null rows is the QUERY watermark =
    MIN across the two branch watermark instances (each measures its
    own input's event-time progress), and the horizon comparison is
    STRICT — exactly what the stream_interval_join_outer oracle's
    `v_ts + upper < least(max view, max purchase) - delay` encodes.
    Discovered when the sf0.1 oracle failed by one row: the view whose
    horizon was inside max(ts)-delay but outside the purchase branch's
    lagging watermark."""
    import datetime as dt

    far = dt.datetime(2024, 1, 1, 6, 0)
    # purchase branch is the min: its max 01:30 -> wm 01:00 == horizon
    # of the 00:00 view -> held open (strict)
    assert _outer_replay(spark, far, dt.datetime(2024, 1, 1, 1, 30)) == [
        (2, 101, 102)]
    # one second past the boundary -> the null row emits
    assert _outer_replay(spark, far, dt.datetime(2024, 1, 1, 1, 30, 1)) == [
        (1, 100, None), (2, 101, 102)]
    # symmetric: views branch far ahead does NOT unseal on its own —
    # the sparse purchase side gates the query watermark (the 100 TB
    # ops hazard: one quiet stream stalls outer emission + eviction)
    assert _outer_replay(spark, far, dt.datetime(2024, 1, 1, 0, 31)) == [
        (2, 101, 102)]


def test_interval_join_checkpoint_recovery(spark, tmp_path):
    """Stop the joined stream after the first file, then restart from
    the same checkpoint with new right-side rows: buffered left-side
    state must survive the restart, and the combined output must equal
    an uninterrupted run (the at-least-once + state-recovery contract
    for stream-stream joins)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("event_id", T.LongType()),
    ])
    orders_dir, pay_dir = tmp_path / "o", tmp_path / "p"
    orders_dir.mkdir(), pay_dir.mkdir()
    _write(orders_dir, "o1.jsonl", [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "event_id": 1},
        {"user_id": 2, "ts": "2024-01-01 10:05:00", "event_id": 2},
    ])
    _write(pay_dir, "p0.jsonl", [])  # right side exists but empty

    def run(rows):
        j = interval_join(
            _stream(spark, orders_dir, schema),
            _stream(spark, pay_dir, schema),
            on="user_id", left_ts="ts", right_ts="ts",
            upper="interval 1 hour", watermark="30 minutes",
            left_alias="o", right_alias="p",
        )
        q = (
            j.writeStream.outputMode("append")
            .foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    first: list = []
    run(first)
    assert first == []  # no payments yet; both orders buffered in state

    # payments arrive AFTER the restart — matches must come out of the
    # recovered state store, not from re-reading the order files
    _write(pay_dir, "p1.jsonl", [
        {"user_id": 1, "ts": "2024-01-01 10:20:00", "event_id": 11},
        {"user_id": 2, "ts": "2024-01-01 12:00:00", "event_id": 12},  # outside 1h
    ])
    second: list = []
    run(second)
    got = sorted((r["user_id"], r["o_event_id"], r["p_event_id"]) for r in second)
    assert got == [(1, 1, 11)], (
        "order 1 must match from recovered state; order 2's payment is "
        "outside the interval and must not")
