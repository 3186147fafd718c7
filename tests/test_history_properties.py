"""Property-based checks: operators/history.py vs naive Python folds
over randomized keyed op sequences (hypothesis drives the sequences,
Spark computes once per example via a cached session)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_server_spark.operators.history import compact_changelog, scd2_history

OPS = ("c", "r", "u", "d")
KEYS = ("k1", "k2", "k3")


def _naive_compact(events):
    """events: [(key, op, lsn)] → {key: (net_op, last_lsn_str)}"""
    out = {}
    by_key = {}
    for key, op, lsn in sorted(events, key=lambda e: e[2]):
        by_key.setdefault(key, []).append((op, lsn))
    for key, seq in by_key.items():
        first_op, _ = seq[0]
        last_op, last_lsn = seq[-1]
        if first_op in ("c", "r") and last_op == "d":
            continue
        if first_op in ("c", "r"):
            net = "c"
        elif last_op == "d":
            net = "d"
        else:
            net = "u"
        out[key] = (net, str(last_lsn))
    return out


def _naive_scd2(events):
    """events: [(key, state, lsn)] → {key: [(state, from, to, current)]}"""
    by_key = {}
    for key, state, lsn in sorted(events, key=lambda e: e[2]):
        by_key.setdefault(key, []).append((state, lsn))
    out = {}
    for key, seq in by_key.items():
        runs = []
        for state, lsn in seq:
            if not runs or runs[-1][0] != state:
                runs.append((state, lsn))
        rows = []
        for i, (state, frm) in enumerate(runs):
            to = runs[i + 1][1] if i + 1 < len(runs) else None
            rows.append((state, frm, to, 1 if to is None else 0))
        out[key] = rows
    return out


events_strategy = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(OPS)),
    min_size=1,
    max_size=12,
).map(lambda seq: [(k, op, i + 1) for i, (k, op) in enumerate(seq)])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events_strategy)
def test_compact_matches_naive_fold(spark, events):
    df = spark.createDataFrame(events, "key string, op string, lsn long")
    got = {
        r["key"]: (r["net_op"], r["last_image"])
        for r in compact_changelog(
            df, "key", F.col("op"), [F.col("lsn")], F.col("lsn").cast("string")
        ).collect()
    }
    assert got == _naive_compact(events)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events_strategy)
def test_scd2_matches_naive_runs(spark, events):
    df = spark.createDataFrame(events, "key string, state string, lsn long")
    out = scd2_history(df, "key", "state", [F.col("lsn")], F.col("lsn"))
    got = {}
    for r in out.collect():
        got.setdefault(r["key"], []).append(
            (r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    for key in got:
        got[key].sort(key=lambda t: t[1])
    assert got == _naive_scd2(events)
