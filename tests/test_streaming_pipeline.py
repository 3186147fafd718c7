"""End-to-end slice (SURVEY.md §7.1): file-backed CDC source → envelope →
predicate/route → checkpointed foreachBatch upsert sink; golden final
state + restart/at-least-once idempotence (the Spark analogs of
DebeziumServerIT.java:84-88 and RedisStreamIT.java:95-120)."""

import json
import os

from pyspark.sql import functions as F

from debezium_server_spark.sinks.parquet_sink import ParquetUpsertSink
from debezium_server_spark.sources.file_source import changelog_stream
from debezium_server_spark.streaming.pipeline import Pipeline
from tests.fixtures import (
    CUSTOMERS_KEY_SCHEMA,
    CUSTOMERS_ROW_SCHEMA,
    DEST,
    GOLDEN_CUSTOMERS,
    customers_changelog_events,
    event,
)


def _write_events(path: str, events: list[dict], name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _run_available(pipeline: Pipeline, sink, ckpt: str) -> None:
    q = pipeline.start(sink, checkpoint_location=ckpt)
    q.awaitTermination(120)


def test_streaming_golden_customers(spark, tmp_path):
    src = str(tmp_path / "changelog")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    _write_events(src, customers_changelog_events(), "batch1.jsonl")

    stream = changelog_stream(spark, src, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    pipeline = Pipeline(stream).transform(
        lambda df: df.filter(F.col("destination").rlike(r"^testc\.inventory\."))
    )
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    _run_available(pipeline, sink, ckpt)

    result = sink.read_table(spark, DEST)
    rows = sorted(tuple(r) for r in result.select("id", "first_name", "last_name", "email").collect())
    assert rows == GOLDEN_CUSTOMERS

    # Restart with new events: update 1001, delete 1002, insert 1006.
    more = [
        event(1001, "u", (1001, "Sally", "Thomas", "sally.thomas@acme.com"),
              (1001, "Sally", "Updated", "sally.thomas@acme.com"), lsn=100),
        event(1002, "d", (1002, "George", "Bailey", "gbailey@foobar.com"), None, lsn=101),
        event(1006, "c", None, (1006, "New", "Person", "new@x.com"), lsn=102),
    ]
    _write_events(src, more, "batch2.jsonl")
    _run_available(pipeline, sink, ckpt)

    result = sink.read_table(spark, DEST)
    rows = sorted(tuple(r) for r in result.select("id", "first_name", "last_name", "email").collect())
    assert rows == [
        (1001, "Sally", "Updated", "sally.thomas@acme.com"),
        (1003, "Edward", "Walker", "ed@walker.com"),
        (1004, "Anne", "Kretchmar", "annek@noanswer.org"),
        (1006, "New", "Person", "new@x.com"),
    ]


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """Re-delivering an already-applied batch (fresh checkpoint, same
    files) must not change final state — effectively-once via merge."""
    src = str(tmp_path / "changelog")
    state = str(tmp_path / "state")
    _write_events(src, customers_changelog_events(), "batch1.jsonl")

    stream = changelog_stream(spark, src, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    pipeline = Pipeline(stream)
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    _run_available(pipeline, sink, str(tmp_path / "ckpt1"))
    first = sorted(tuple(r) for r in sink.read_table(spark, DEST).collect())
    # same source replayed from scratch (new checkpoint → same epoch ids)
    _run_available(pipeline, sink, str(tmp_path / "ckpt2"))
    second = sorted(tuple(r) for r in sink.read_table(spark, DEST).collect())
    assert first == second


def test_multi_destination_routing(spark, tmp_path):
    """Events for two tables land in two state tables (per-destination
    grouping, KinesisChangeConsumer.java:136)."""
    src = str(tmp_path / "changelog")
    state = str(tmp_path / "state")
    evs = [
        event(1, "c", None, (1, "A", "A", "a@x.com"), lsn=1, dest="testc.inventory.t1"),
        event(1, "c", None, (1, "B", "B", "b@x.com"), lsn=2, dest="testc.inventory.t2"),
        event(2, "c", None, (2, "C", "C", "c@x.com"), lsn=3, dest="testc.inventory.t2"),
    ]
    _write_events(src, evs, "batch.jsonl")
    stream = changelog_stream(spark, src, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    Pipeline(stream).start(sink, checkpoint_location=str(tmp_path / "ckpt")).awaitTermination(120)
    assert sink.read_table(spark, "testc.inventory.t1").count() == 1
    assert sink.read_table(spark, "testc.inventory.t2").count() == 2


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Fault-injection analog of RedisStreamIT.java:95-120: stop the
    query, new changes arrive, restart with the SAME checkpoint — only
    the new batch is read (offsets carried), and the merged state is the
    correct final table."""
    src = str(tmp_path / "changelog")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_events(src, customers_changelog_events(), "batch1.jsonl")

    sink = ParquetUpsertSink(root_path=state, key_fields=("id",))
    batch_rows = []
    counting = lambda df, e: (batch_rows.append(df.count()), sink(df, e))

    def run():
        stream = changelog_stream(spark, src, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
        Pipeline(stream).start(counting, checkpoint_location=ckpt).awaitTermination(120)

    run()  # first run applies the golden changelog
    n_first = sum(batch_rows)
    # downtime: a late update arrives for id=1001 and a new row 1005
    _write_events(
        src,
        [
            event(1001, "u", (1001, "Sally", "Thomas", "sally@x.com"),
                  (1001, "Sally", "Restarted", "sally@x.com"), lsn=100),
            event(1005, "c", None, (1005, "Eve", "New", "eve@x.com"), lsn=101),
        ],
        "batch2.jsonl",
    )
    batch_rows.clear()
    run()  # restart from the same checkpoint
    assert sum(batch_rows) == 2  # ONLY the new file was read
    rows = {r["id"]: r["last_name"] for r in sink.read_table(spark, DEST).collect()}
    assert rows[1001] == "Restarted"
    assert rows[1005] == "New"
    assert n_first >= len(GOLDEN_CUSTOMERS)


def test_corrupt_events_quarantine_to_dead_letter(spark, tmp_path):
    """Malformed changelog lines neither kill the stream nor vanish:
    they route to the dead-letter destination with the raw line kept in
    a __raw header; healthy events flow untouched."""
    from debezium_server_spark.sinks.parquet_sink import ParquetAppendSink
    from debezium_server_spark.sources.file_source import (
        DEAD_LETTER_DESTINATION,
        changelog_stream,
    )

    src = str(tmp_path / "log")
    os.makedirs(src)
    good = customers_changelog_events()[:2]
    with open(os.path.join(src, "mixed.jsonl"), "w") as f:
        f.write(json.dumps(good[0]) + "\n")
        f.write("{this is not json at all\n")
        f.write(json.dumps(good[1]) + "\n")

    stream = changelog_stream(
        spark, src, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA,
        quarantine_corrupt=True,
    )
    sink = ParquetAppendSink(root_path=str(tmp_path / "out"))
    q = Pipeline(stream).start(sink, checkpoint_location=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    dead = out.filter(out.destination == DEAD_LETTER_DESTINATION).collect()
    live = out.filter(out.destination != DEAD_LETTER_DESTINATION)
    assert len(dead) == 1
    headers = {h["key"]: h["value"] for h in dead[0]["headers"]}
    assert headers["__raw"].startswith("{this is not json")
    assert dead[0]["value"]["op"] is None  # empty envelope, NOT a tombstone
    assert live.count() == 2


def test_fanout_parquet_and_dbapi_converge(spark, tmp_path):
    """Cross-component slice: one changelog stream fanned out to the
    parquet materializer AND the live DBAPI (sqlite) sink — both must
    land the identical final state from a single source read."""
    import sqlite3

    from debezium_server_spark.sinks.base import FanoutSink
    from debezium_server_spark.sinks.dbapi_sink import DbApiUpsertSink

    src = str(tmp_path / "changelog")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    db = str(tmp_path / "sink.db")
    _write_events(src, customers_changelog_events(), "batch1.jsonl")

    stream = changelog_stream(spark, src, CUSTOMERS_ROW_SCHEMA, CUSTOMERS_KEY_SCHEMA)
    pq = ParquetUpsertSink(root_path=state, key_fields=("id",))
    dbs = DbApiUpsertSink(dsn=db, key_fields=("id",))
    fan = FanoutSink([pq, dbs])
    _run_available(Pipeline(stream), fan, ckpt)

    pq_rows = sorted(
        tuple(r)
        for r in pq.read_table(spark, DEST)
        .select("id", "first_name", "last_name", "email")
        .collect()
    )
    con = sqlite3.connect(db)
    table = "t_" + "".join(c if c.isalnum() else "_" for c in DEST)
    db_rows = sorted(
        con.execute(f"SELECT id, first_name, last_name, email FROM {table}").fetchall()
    )
    con.close()
    assert pq_rows == GOLDEN_CUSTOMERS
    assert db_rows == GOLDEN_CUSTOMERS
