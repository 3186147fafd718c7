"""Semantic type mapping (§1.4) + wire-value conversions (§2.5)."""

import datetime
import struct
from decimal import Decimal

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.functions.type_conversions import (
    connect_decimal_from_bytes,
    epoch_days_to_date,
    time_millis_to_string,
    timestamp_from_micros,
    timestamp_from_millis,
    timestamp_from_nanos,
    wkb_point_xy,
    zoned_timestamp_parse,
)
from debezium_server_spark.schema import spark_type_for


class TestSemanticTypeMap:
    @pytest.mark.parametrize(
        "name,expected",
        [
            ("int32", T.IntegerType()),
            ("io.debezium.time.Date", T.DateType()),
            ("io.debezium.time.MicroTime", T.LongType()),
            ("io.debezium.time.ZonedTimestamp", T.TimestampType()),
            ("io.debezium.data.Json", T.StringType()),
            ("io.debezium.data.Uuid", T.StringType()),
            ("io.debezium.data.geometry.Point", T.BinaryType()),
            ("io.debezium.data.vector.FloatVector", T.ArrayType(T.FloatType())),
            (
                "io.debezium.data.vector.SparseDoubleVector",
                T.MapType(T.IntegerType(), T.DoubleType()),
            ),
        ],
    )
    def test_mapping(self, name, expected):
        assert spark_type_for(name) == expected

    def test_decimal_parameters(self):
        t = spark_type_for(
            "org.apache.kafka.connect.data.Decimal",
            {"connect.decimal.precision": "10", "scale": "2"},
        )
        assert t == T.DecimalType(10, 2)
        assert spark_type_for("io.debezium.data.VariableScaleDecimal") == T.DecimalType(38, 18)

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="unknown semantic type"):
            spark_type_for("io.example.Mystery")


class TestWireConversions:
    def test_temporal_conversions(self, spark):
        ns = 1700000000123456789  # ≈2^60.6 — exercises the precision path
        df = spark.createDataFrame(
            [(19000, 45296789, 1700000000123, 1700000000123456, ns,
              "2024-01-01T10:15:30.250+02:00")],
            "d int, t long, ms long, us long, ns long, z string",
        )
        row = df.select(
            epoch_days_to_date(F.col("d")).alias("d"),
            time_millis_to_string(F.col("t")).alias("t"),
            timestamp_from_millis(F.col("ms")).alias("ms"),
            timestamp_from_micros(F.col("us")).alias("us"),
            timestamp_from_nanos(F.col("ns")).alias("ns"),
            zoned_timestamp_parse(F.col("z")).alias("z"),
        ).first()
        assert row["d"] == datetime.date(2022, 1, 8)  # 19000 days
        assert row["t"] == "12:34:56.789"
        assert row["ms"] == datetime.datetime(2023, 11, 14, 22, 13, 20, 123000)
        assert row["us"].microsecond == 123456
        assert row["ns"].microsecond == 123456  # ns truncated exactly
        # 10:15:30.250+02:00 = 08:15:30.250 UTC (session tz is UTC)
        assert row["z"] == datetime.datetime(2024, 1, 1, 8, 15, 30, 250000)

    @pytest.mark.parametrize(
        "unscaled,scale,expected",
        [
            (123456, 2, Decimal("1234.56")),
            (-123456, 2, Decimal("-1234.56")),
            (-1, 0, Decimal("-1")),
            (0, 3, Decimal("0.000")),
            (2**40, 4, Decimal(2**40) / 10**4),
        ],
    )
    def test_connect_decimal(self, spark, unscaled, scale, expected):
        raw = unscaled.to_bytes(8, "big", signed=True).lstrip(b"\x00") or b"\x00"
        if unscaled < 0:  # keep two's-complement sign bytes
            raw = unscaled.to_bytes(8, "big", signed=True)
        df = spark.createDataFrame([(bytearray(raw),)], "b binary")
        got = df.select(connect_decimal_from_bytes(F.col("b"), scale).alias("v")).first()["v"]
        assert got == expected

    def test_wkb_point(self, spark):
        little = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 1.5, -2.25)
        big = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
        junk = b"\x01\x02"
        df = spark.createDataFrame(
            [(bytearray(little),), (bytearray(big),), (bytearray(junk),), (None,)],
            "wkb binary",
        )
        rows = df.select(wkb_point_xy(F.col("wkb")).alias("p")).collect()
        pts = [tuple(r["p"]) if r["p"] is not None else None for r in rows]
        assert (1.5, -2.25) in pts and (3.0, 4.0) in pts
        assert (None, None) in pts  # malformed → null fields
