"""Golden-state materialization (FIXTURES.md F1/F2; the Spark analog of
DebeziumServerIT.java:84-88)."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.materialize import (
    append_log,
    latest_events,
    materialize,
    split_upserts_deletes,
)
from tests.fixtures import GOLDEN_CUSTOMERS, customers_changelog_df


def test_materialize_golden_customers(spark):
    df = customers_changelog_df(spark)
    final = materialize(df, key_cols=("destination", "key.id"))
    rows = sorted(
        (r["id"], r["first_name"], r["last_name"], r["email"])
        for r in final.collect()
    )
    assert rows == GOLDEN_CUSTOMERS
    last = rows[-1]
    assert last == (1004, "Anne", "Kretchmar", "annek@noanswer.org")


def test_latest_events_latest_wins(spark):
    df = customers_changelog_df(spark)
    latest = latest_events(df, key_cols=("key.id",))
    m = {r["key_id"]: r for r in latest.collect()}
    assert m[1004]["op"] == "u"
    assert m[1004]["after"]["first_name"] == "Anne"
    assert m[1005]["op"] == "d"
    assert m[1005]["after"] is None
    assert m[1001]["op"] == "r"


def test_split_upserts_deletes(spark):
    df = customers_changelog_df(spark)
    ups, dels = split_upserts_deletes(df)
    assert ups.count() == 6  # 4 snapshot reads + 1 insert + 1 update
    assert dels.count() == 1
    assert dels.select("key.id").first()[0] == 1005


def test_append_log_keeps_every_event(spark):
    df = customers_changelog_df(spark)
    log = append_log(df)
    assert log.count() == 7  # tombstone dropped
    ops = [r[0] for r in log.groupBy("op").count().orderBy("op").collect()]
    assert ops == ["c", "d", "r", "u"]


def test_materialize_is_replay_idempotent(spark):
    """At-least-once replay (same events twice) must converge to the same
    state — SURVEY.md §3.2."""
    df = customers_changelog_df(spark)
    doubled = df.union(df)
    final = materialize(doubled, key_cols=("destination", "key.id"))
    rows = sorted((r["id"], r["first_name"]) for r in final.collect())
    assert [r[0] for r in rows] == [1001, 1002, 1003, 1004]
    assert rows[-1][1] == "Anne"
