"""Ops plane: StreamingQueryListener metrics + file-backed signal channel."""

import json
import time

import pytest

from debezium_server_spark.streaming.metrics import PipelineMetricsListener
from debezium_server_spark.streaming.signals import Signal, SignalChannel


def _write_lines(path, n):
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({"k": f"id{i}", "v": i}) + "\n")


def test_metrics_listener_captures_progress(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_lines(src / "a.jsonl", 25)
    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("k string, v long")
            .json(str(src))
            .writeStream.queryName("metrics-probe")
            .foreachBatch(lambda df, e: df.count())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are async — give the bus a moment to drain
        m = None
        for _ in range(50):
            m = listener.metrics(str(q.id))
            if m and m.snapshot_completed and not m.active:
                break
            time.sleep(0.2)
        assert m is not None
        assert m.total_input_rows == 25
        assert m.snapshot_completed  # first non-empty batch committed
        assert m.n_batches >= 1
        assert m.history[0]["numInputRows"] == 25
        assert not m.active  # terminated
    finally:
        spark.streams.removeListener(listener)


class TestSignalChannel:
    def test_log_signal_dispatch(self, tmp_path):
        d = str(tmp_path / "signals")
        SignalChannel.post(d, Signal(id="s1", type="log", data={"message": "hello"}))
        ch = SignalChannel(d)
        out = ch.poll()
        assert [s.id for s in out] == ["s1"]
        # at-most-once: same id never dispatches twice
        assert ch.poll() == []

    def test_disabled_channel_ignores(self, tmp_path):
        d = str(tmp_path / "signals")
        SignalChannel.post(d, Signal(id="s1", type="log"))
        assert SignalChannel(d, enabled=False).poll() == []

    def test_custom_handler_and_context(self, tmp_path):
        d = str(tmp_path / "signals")
        seen = []
        ch = SignalChannel(d)
        ch.register("snapshot", lambda sig, ctx: seen.append((sig.data["table"], ctx)))
        SignalChannel.post(d, Signal(id="snap-1", type="snapshot", data={"table": "t1"}))
        ch.poll(context="ctx-obj")
        assert seen == [("t1", "ctx-obj")]

    def test_unknown_type_is_skipped(self, tmp_path):
        d = str(tmp_path / "signals")
        SignalChannel.post(d, Signal(id="s9", type="nope"))
        assert SignalChannel(d).poll() == []

    def test_stop_signal_stops_query(self, spark, tmp_path):
        class FakeQuery:
            stopped = False

            def stop(self):
                self.stopped = True

        d = str(tmp_path / "signals")
        SignalChannel.post(d, Signal(id="halt", type="stop"))
        q = FakeQuery()
        ch = SignalChannel(d)
        out = ch.poll(q)
        assert q.stopped and [s.type for s in out] == ["stop"]


def test_pipeline_polls_signals_between_batches(spark, tmp_path):
    """End-to-end: a stop signal posted before the run is consumed at the
    first batch boundary (control path rides foreachBatch)."""
    from pyspark.sql import types as T

    from debezium_server_spark.sources.file_source import changelog_stream
    from debezium_server_spark.streaming.pipeline import Pipeline

    src = tmp_path / "log"
    src.mkdir()
    row_schema = T.StructType([T.StructField("id", T.LongType())])
    with open(src / "e.jsonl", "w") as f:
        f.write(
            json.dumps(
                {
                    "destination": "d.t",
                    "key": {"id": 1},
                    "value": {"op": "c", "before": None, "after": {"id": 1},
                              "source": {"lsn": 1}, "ts_ms": 1},
                    "headers": [],
                    "partition": 0,
                }
            )
        )
    sig_dir = str(tmp_path / "signals")
    SignalChannel.post(sig_dir, Signal(id="s-log", type="log", data={"message": "mid-run"}))
    dispatched = []
    ch = SignalChannel(sig_dir)
    ch.register("log", lambda sig, ctx: dispatched.append(sig.id))
    seen_rows = []
    p = Pipeline(changelog_stream(spark, str(src), row_schema, row_schema))
    q = p.start(
        lambda df, e: seen_rows.append(df.count()),
        checkpoint_location=str(tmp_path / "ckpt"),
        signal_channel=ch,
    )
    q.awaitTermination(120)
    assert dispatched == ["s-log"]
    assert sum(seen_rows) == 1


def test_lineage_dataset_row_per_sink_epoch(spark, tmp_path):
    """OpenLineage emit (DefaultChangeConsumer.java:71-93 analog): every
    successful sink epoch produces one RunEvent whose outputs list each
    destination with its schema facet; the lineage table reads back one
    row per (epoch, dataset); replayed epochs are idempotent."""
    from pyspark.sql import types as T

    from debezium_server_spark.sources.file_source import changelog_stream
    from debezium_server_spark.streaming.lineage import LineageEmitter, read_lineage
    from debezium_server_spark.streaming.pipeline import Pipeline

    src = tmp_path / "log"
    src.mkdir()
    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    with open(src / "e.jsonl", "w") as f:
        for dest, i in (("db.a", 1), ("db.b", 2)):
            f.write(json.dumps({
                "destination": dest, "key": {"id": i},
                "value": {"op": "c", "before": None,
                          "after": {"id": i, "name": f"n{i}"},
                          "source": {"lsn": i}, "ts_ms": i},
                "headers": [], "partition": 0,
            }) + "\n")

    lineage_root = str(tmp_path / "lineage")
    emitter = LineageEmitter(lineage_root, job_name="test-job")
    epochs = []

    class NamedSink:
        name = "parquet-upsert"

        def __call__(self, df, epoch_id):
            epochs.append((epoch_id, df.count()))

    p = Pipeline(changelog_stream(spark, str(src), row_schema, row_schema))
    q = p.start(NamedSink(), checkpoint_location=str(tmp_path / "ckpt"),
                lineage_emitter=emitter)
    q.awaitTermination(120)
    assert epochs, "sink never ran"

    table = read_lineage(spark, lineage_root)
    rows = {(r["dataset"]): r for r in table.collect()}
    # one dataset row per destination for the epoch
    assert set(rows) == {"db.a", "db.b"}
    for r in rows.values():
        assert r["job"] == "test-job"
        assert r["sink"] == "parquet-upsert"
        fields = {f["name"]: f["type"] for f in json.loads(r["schema_fields"])}
        assert fields == {"id": "bigint", "name": "string"}
    # n_epochs RunEvents on disk, each with deterministic run id → replay
    # of epoch 0 overwrites, not duplicates
    ev0 = emitter.emit_batch(
        spark.createDataFrame([("db.a",)], "destination string"), epochs[0][0],
        "parquet-upsert",
    )
    table2 = read_lineage(spark, lineage_root)
    assert table2.filter(f"run_id = '{ev0['run']['runId']}'").count() == 1


def test_lineage_not_emitted_on_sink_failure(spark, tmp_path):
    """Emit happens only AFTER the sink handles the batch — a failing
    epoch leaves no lineage record (handle first, lineage second)."""
    from debezium_server_spark.streaming.lineage import LineageEmitter, with_lineage

    emitter = LineageEmitter(str(tmp_path / "lineage"))

    def bad_sink(df, epoch_id):
        raise RuntimeError("boom")

    wrapped = with_lineage(bad_sink, emitter)
    df = spark.createDataFrame([("db.a",)], "destination string")
    with pytest.raises(RuntimeError):
        wrapped(df, 0)
    assert not (tmp_path / "lineage").exists() or not list(
        (tmp_path / "lineage").iterdir()
    )


class TestControlSidecar:
    def _post(self, port, path, payload):
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def _get(self, port, path):
        import urllib.request

        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_health_signals_and_metrics(self, tmp_path):
        from debezium_server_spark.streaming.metrics import PipelineMetricsListener
        from debezium_server_spark.streaming.rest_sidecar import ControlSidecar
        from debezium_server_spark.streaming.signals import SignalChannel

        listener = PipelineMetricsListener()
        sc = ControlSidecar(str(tmp_path / "sig"), metrics_listener=listener).start()
        try:
            assert self._get(sc.port, "/q/health") == (200, {"status": "UP"})
            code, body = self._post(
                sc.port, "/api/signals", {"id": "s1", "type": "log", "data": {"message": "m"}}
            )
            assert (code, body) == (202, {"accepted": "s1"})
            # the posted signal is consumable through the channel
            out = SignalChannel(str(tmp_path / "sig")).poll()
            assert [s.id for s in out] == ["s1"]
            assert self._post(sc.port, "/api/signals", {"nope": 1})[0] == 400
            assert self._get(sc.port, "/q/metrics")[0] == 200
            assert self._get(sc.port, "/nope")[0] == 404
        finally:
            sc.stop()

    def test_disabled_api_404s(self, tmp_path):
        from debezium_server_spark.streaming.rest_sidecar import ControlSidecar

        sc = ControlSidecar(str(tmp_path / "sig"), api_enabled=False).start()
        try:
            code, _ = self._post(sc.port, "/api/signals", {"id": "x", "type": "log"})
            assert code == 404
        finally:
            sc.stop()


def test_observed_metrics_count_ops(spark, tmp_path):
    """df.observe counters ride inside the batch job and surface through
    the listener: rows / deletes / snapshot_reads per micro-batch."""
    import json as _json

    from pyspark.sql import types as T

    from debezium_server_spark.sources.file_source import changelog_stream
    from debezium_server_spark.streaming.pipeline import Pipeline
    from tests.fixtures import event

    row_schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()), T.StructField("email", T.StringType()),
    ])
    key_schema = T.StructType([T.StructField("id", T.LongType())])
    src = tmp_path / "log"
    src.mkdir()
    events = [
        event(1, "r", None, (1, "a", "b", "a@x.com"), lsn=1),
        event(2, "c", None, (2, "c", "d", "c@x.com"), lsn=2),
        event(1, "d", (1, "a", "b", "a@x.com"), None, lsn=3),
    ]
    with open(src / "e.jsonl", "w") as f:
        for e in events:
            f.write(_json.dumps(e) + "\n")

    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = changelog_stream(spark, str(src), row_schema, key_schema)
        q = Pipeline(stream).start(
            lambda df, e: df.count(),
            checkpoint_location=str(tmp_path / "ckpt"),
            query_name="observe-probe",
        )
        q.awaitTermination(120)
        m = None
        for _ in range(50):
            m = listener.metrics(str(q.id))
            if m and m.observed:
                break
            time.sleep(0.2)
        assert m and m.observed["rows"] == 3
        assert m.observed["deletes"] == 1
        assert m.observed["snapshot_reads"] == 1
        assert m.observed["tombstones"] == 0
    finally:
        spark.streams.removeListener(listener)
