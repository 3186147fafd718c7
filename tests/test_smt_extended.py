"""Extended SMT surface: HeaderToValue, ValueToKey, ExtractField,
ReplaceField, Cast, TimezoneConverter, ExtractChangedRecordState,
ByLogicalTableRouter — the remainder of the upstream SMT catalog."""

from pyspark.sql import functions as F

from debezium_server_spark.operators.transforms import (
    Chain,
    cast_fields,
    extract_changed_record_state,
    extract_field,
    header_to_value,
    logical_table_router,
    replace_field,
    timezone_converter,
    value_to_key,
)
from tests.fixtures import customers_changelog_df, event


def test_header_to_value_copy_and_move(spark):
    ev = event(1001, "c", None, (1001, "Sally", "Thomas", "s@acme.com"), 1,
               headers=[{"key": "trace", "value": "t-old"},
                        {"key": "trace", "value": "t-new"},
                        {"key": "other", "value": "x"}])
    df = customers_changelog_df(spark, [ev])

    copied = header_to_value("trace", "trace_id").apply(df).first()
    assert copied["value"]["trace_id"] == "t-new"  # last wins
    assert len(copied["headers"]) == 3             # copy keeps headers

    moved = header_to_value("trace", "trace_id", operation="move").apply(df).first()
    assert moved["value"]["trace_id"] == "t-new"
    assert [h["key"] for h in moved["headers"]] == ["other"]


def test_value_to_key_and_extract_field(spark):
    df = customers_changelog_df(spark)
    rekeyed = value_to_key(["after.email"]).apply(df.filter("value.op = 'r'"))
    row = rekeyed.orderBy("value.after.id").first()
    assert row["key"]["email"] == "sally.thomas@acme.com"

    extracted = extract_field("after").apply(df.filter("value.op = 'r'"))
    assert extracted.select("value.first_name").orderBy("value.id").first()[0] == "Sally"


def test_replace_field_rename_include_exclude(spark):
    df = extract_field("after").apply(
        customers_changelog_df(spark).filter("value.op = 'r'")
    )
    out = replace_field(
        renames={"first_name": "fname"},
        exclude=["email"],
    ).apply(df)
    fields = [f.name for f in out.schema["value"].dataType.fields]
    assert fields == ["id", "fname", "last_name"]

    only = replace_field(include=["id"]).apply(df)
    assert [f.name for f in only.schema["value"].dataType.fields] == ["id"]


def test_cast_and_timezone_converter(spark):
    df = extract_field("after").apply(
        customers_changelog_df(spark).filter("value.op = 'r'")
    )
    out = cast_fields({"id": "string"}).apply(df)
    assert dict(out.select("value.id").dtypes)["id"] == "string"

    ts_df = out.select(
        F.struct(F.lit("2024-06-01 12:00:00").alias("created_at")).alias("value")
    )
    shifted = timezone_converter("America/New_York", ["created_at"]).apply(ts_df)
    got = shifted.select(F.date_format("value.created_at", "yyyy-MM-dd HH:mm").alias("t")).first()["t"]
    assert got == "2024-06-01 08:00"  # EDT = UTC-4


def test_extract_changed_record_state_headers(spark):
    df = customers_changelog_df(spark)
    out = extract_changed_record_state(header_changed="changed",
                                       header_unchanged="unchanged").apply(df)
    upd = out.filter("value.op = 'u'").first()
    hdrs = {h["key"]: h["value"] for h in upd["headers"]}
    assert hdrs["changed"] == "first_name"
    assert set(hdrs["unchanged"].split(",")) == {"id", "last_name", "email"}
    # non-updates keep their headers untouched (null stays empty)
    assert out.filter("value.op = 'r'").first()["headers"] in (None, [])


def test_logical_table_router_merges_shards(spark):
    shard1 = event(7, "c", None, (7, "A", "B", "a@x"), 1, dest="db.shard_1.customers")
    shard2 = event(7, "c", None, (7, "C", "D", "c@x"), 2, dest="db.shard_2.customers")
    other = event(9, "c", None, (9, "E", "F", "e@x"), 3, dest="db.plain.users")
    df = customers_changelog_df(spark, [shard1, shard2, other])
    out = Chain([
        logical_table_router(r"^db\.shard_\d+\.customers$", "db.customers")
    ]).apply(df)
    merged = out.filter("destination = 'db.customers'").orderBy("value.source.lsn")
    rows = merged.collect()
    assert len(rows) == 2
    # same logical key id=7, but physical-table stamp keeps them distinct
    stamps = {r["key"]["__dbz__physicalTableIdentifier"] for r in rows}
    assert stamps == {"db.shard_1.customers", "db.shard_2.customers"}
    plain = out.filter("destination = 'db.plain.users'").first()
    assert plain["key"]["__dbz__physicalTableIdentifier"] is None
