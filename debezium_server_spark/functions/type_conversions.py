"""Wire-value conversions for Debezium semantic types.

Reference: FlussTypeConverter.java:188-237 converts raw Connect wire
values — epoch-day ints, millis/micros/nanos, ISO zoned strings, big-
endian two's-complement decimal bytes, WKB geometry — into typed values.
Spark-first: every conversion is a Column expression (codegen'd, no
Python in the hot path) except WKB float extraction, which needs bit
reinterpretation Spark lacks and rides a vectorized pandas UDF.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def epoch_days_to_date(col: Column) -> Column:
    """io.debezium.time.Date wire value: days since epoch → DATE
    (FlussTypeConverter.java:190-193)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), col.cast("int"))


def time_millis_to_string(col: Column) -> Column:
    """io.debezium.time.Time: millis-of-day → 'HH:mm:ss.SSS' rendering
    (the reference renders LocalTime; :194-197)."""
    ms = col.cast("long")
    return F.format_string(
        "%02d:%02d:%02d.%03d",
        (ms / 3600000).cast("long"),
        F.pmod((ms / 60000).cast("long"), F.lit(60)),
        F.pmod((ms / 1000).cast("long"), F.lit(60)),
        F.pmod(ms, F.lit(1000)),
    )


def timestamp_from_millis(col: Column) -> Column:
    """io.debezium.time.Timestamp (epoch ms) → TIMESTAMP_NTZ."""
    return F.timestamp_millis(col.cast("long")).cast("timestamp_ntz")


def timestamp_from_micros(col: Column) -> Column:
    """io.debezium.time.MicroTimestamp (epoch µs) → TIMESTAMP_NTZ."""
    return F.timestamp_micros(col.cast("long")).cast("timestamp_ntz")


def timestamp_from_nanos(col: Column) -> Column:
    """io.debezium.time.NanoTimestamp (epoch ns) → TIMESTAMP_NTZ.

    The ns→µs division must stay integral: a double round-trip loses
    precision above 2^53 and epoch-ns is ≈2^60. Subtract the remainder,
    then divide exactly through decimal."""
    ns = col.cast("long")
    whole = (ns - F.pmod(ns, F.lit(1000))).cast("decimal(38,0)")
    return F.timestamp_micros((whole / 1000).cast("long")).cast("timestamp_ntz")


def zoned_timestamp_parse(col: Column) -> Column:
    """io.debezium.time.ZonedTimestamp: ISO-8601 string with offset →
    session-zone TIMESTAMP (ZonedDateTime.parse analog, :223)."""
    return F.to_timestamp(col)


def connect_decimal_from_bytes(col: Column, scale: int, max_bytes: int = 8) -> Column:
    """org.apache.kafka.connect.data.Decimal wire value: big-endian
    two's-complement unscaled bytes + scale parameter → DECIMAL.

    Pure column math: hex → unsigned bigint via conv(), then a sign fix
    (values with the top bit set are negative: subtract 2^(8·len)).
    Covers |unscaled| < 2^63 (max_bytes ≤ 8 — beyond that the source
    should use VariableScaleDecimal/string)."""
    if max_bytes > 8:
        raise ValueError("connect_decimal_from_bytes covers unscaled values ≤ 8 bytes")
    h = F.upper(F.hex(col))
    # top bit of the original bytes set ⇔ negative two's-complement
    negative = F.substring(h, 1, 1).isin(*"89ABCDEF")
    # sign-extend to exactly 64 bits, then assemble a signed long from two
    # 32-bit halves — every step is exact integer arithmetic (a detour
    # through pow()/double would corrupt values near 2^64: doubles cast to
    # decimal via their shortest string form)
    h16 = F.when(negative, F.lpad(h, 16, "F")).otherwise(F.lpad(h, 16, "0"))
    high = F.conv(F.substring(h16, 1, 8), 16, 10).cast("long")
    low = F.conv(F.substring(h16, 9, 8), 16, 10).cast("long")
    signed_high = F.when(high >= 2**31, high - 2**32).otherwise(high)
    unscaled = signed_high * F.lit(2**32).cast("long") + low
    divisor = F.lit(10**scale).cast("decimal(20,0)")
    return (unscaled.cast("decimal(38,0)") / divisor).cast(f"decimal(38,{scale})")


def _wkb_point_batch(wkb: pd.Series) -> pd.DataFrame:
    xs, ys = [], []
    for b in wkb:
        x = y = None
        if b is not None and len(b) >= 21:
            try:
                little = b[0] == 1
                fmt = "<" if little else ">"
                (geom_type,) = struct.unpack_from(fmt + "I", b, 1)
                if geom_type & 0xFF == 1:  # Point
                    x, y = struct.unpack_from(fmt + "dd", b, 5)
            except struct.error:
                pass
        xs.append(x)
        ys.append(y)
    return pd.DataFrame({"x": xs, "y": ys})


def wkb_point_xy(col: Column) -> Column:
    """io.debezium.data.geometry.Point: WKB bytes → (x, y) doubles
    (FlussTypeConverter.java:210-211 extracts the same). Vectorized Arrow
    batch; handles both byte orders; non-point/malformed → nulls. The UDF
    is built lazily — pandas_udf registration needs an active session."""
    udf = pandas_udf(_wkb_point_batch, "struct<x:double,y:double>")
    return udf(col)
