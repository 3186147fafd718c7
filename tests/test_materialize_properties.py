"""Property-based check of the materialization core.

`materialize` (max_by latest-wins + delete removal) must equal a naive
single-threaded replay of the change log for ANY event sequence —
hypothesis generates adversarial ones (interleaved keys, deletes of
absent keys, re-creates after delete, duplicate positions are excluded
since the log's total order is (lsn,) unique per source).
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from debezium_server_spark.operators.materialize import materialize
from debezium_server_spark.schema import event_schema

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)
KEY = T.StructType([T.StructField("id", T.LongType())])

ops = st.sampled_from(["c", "r", "u", "d"])
keys = st.integers(min_value=0, max_value=4)
vals = st.integers(min_value=0, max_value=100)
event = st.tuples(ops, keys, vals)


def naive_replay(events):
    """Reference semantics: apply in lsn order, upsert on c/r/u, remove
    on d. Tombstones don't occur here (value never null)."""
    state = {}
    for lsn, (op, k, v) in enumerate(events):
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    return {k: v for k, v in state.items()}


def to_frames(spark, events):
    rows = []
    for lsn, (op, k, v) in enumerate(events):
        after = None if op == "d" else {"id": k, "v": v}
        before = {"id": k, "v": 0} if op in ("u", "d") else None
        rows.append(
            (
                "t.t",
                {"id": k},
                {"op": op, "before": before, "after": after,
                 "source": {"lsn": lsn}, "ts_ms": lsn},
                None,
                0,
            )
        )
    return spark.createDataFrame(rows, event_schema(ROW, KEY))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(event, min_size=1, max_size=30))
def test_materialize_matches_naive_replay(spark, events):
    expected = naive_replay(events)
    got_rows = materialize(to_frames(spark, events)).collect()
    got = {r["id"]: r["v"] for r in got_rows}
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(event, min_size=1, max_size=25))
def test_dbapi_sink_matches_naive_replay(spark, events, tmp_path_factory):
    """The live SQL sink's upsert/delete application must land the same
    final state as a naive single-threaded replay, for ANY op sequence
    (hypothesis interleaves keys, deletes absent keys, re-creates)."""
    import sqlite3

    from debezium_server_spark.sinks.dbapi_sink import DbApiUpsertSink

    db = str(tmp_path_factory.mktemp("dbapi") / "p.db")
    sink = DbApiUpsertSink(dsn=db, key_fields=("id",))
    sink(to_frames(spark, events), epoch_id=0)
    expected = naive_replay(events)
    con = sqlite3.connect(db)
    try:
        got = dict(con.execute("SELECT id, v FROM t_t_t").fetchall())
    except sqlite3.OperationalError:
        got = {}  # all-delete batches never create the table
    con.close()
    assert got == expected
