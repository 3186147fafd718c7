"""changelog-export sink: two-phase commit via manifests, replayed-epoch
idempotence, vacuum of crashed-epoch stragglers."""

import json
import os

from debezium_server_spark.sinks.python_datasink import (
    ChangelogExportStreamWriter,
    FileCommit,
    read_exported,
    register_changelog_sink,
    vacuum_unmanifested,
)


def test_batch_write_then_read_only_manifested(spark, tmp_path):
    root = str(tmp_path / "exp")
    register_changelog_sink(spark)
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    df.write.format("changelog-export").mode("append").option("path", root).save()
    back = read_exported(spark, root, schema="id long, v string")
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # a straggler file with no manifest entry must stay invisible
    stray = os.path.join(root, "data", "part-deadbeef.jsonl")
    with open(stray, "w") as f:
        f.write(json.dumps({"id": 99, "v": "ghost"}) + "\n")
    back = read_exported(spark, root, schema="id long, v string")
    assert {r["id"] for r in back.collect()} == {1, 2, 3}
    assert vacuum_unmanifested(root) == 1
    assert not os.path.exists(stray)


def test_streaming_epochs_and_replay_idempotence(spark, tmp_path):
    src = str(tmp_path / "in")
    root = str(tmp_path / "exp")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    register_changelog_sink(spark)

    def emit(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run():
        q = (
            spark.readStream.schema("id long, v string")
            .json(src)
            .writeStream.format("changelog-export")
            .option("path", root)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    emit("b1.jsonl", [{"id": 1, "v": "x"}])
    run()
    emit("b2.jsonl", [{"id": 2, "v": "y"}])
    run()
    back = read_exported(spark, root, schema="id long, v string")
    assert sorted(r["id"] for r in back.collect()) == [1, 2]

    # simulate an at-least-once replay of an already-committed epoch:
    # commit() with an existing manifest discards the duplicate stage
    w = ChangelogExportStreamWriter({"path": root})
    dup = os.path.join(root, "data", "part-replay.jsonl")
    with open(dup, "w") as f:
        f.write(json.dumps({"id": 1, "v": "x"}) + "\n")
    w.commit([FileCommit(path=dup, n_rows=1)], batchId=0)
    assert not os.path.exists(dup)  # duplicate discarded, not published
    back = read_exported(spark, root, schema="id long, v string")
    assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_abort_discards_staged_files(spark, tmp_path):
    root = str(tmp_path / "exp")
    os.makedirs(os.path.join(root, "data"))
    w = ChangelogExportStreamWriter({"path": root})
    staged = os.path.join(root, "data", "part-x.jsonl")
    with open(staged, "w") as f:
        f.write("{}\n")
    w.abort([FileCommit(path=staged, n_rows=1)], batchId=7)
    assert not os.path.exists(staged)
    assert read_exported(spark, root) is None
