"""Focused pin for the vectorized SCD2 run-length fold (r08
optimization: iterrows → numpy boundary scan). Edge cases the big
replay can miss: carried state closing across batches, no-op equal
runs straddling a batch boundary, single-row batches, and the
open-version suppression."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from debezium_server_spark.streaming.replay import replay_stream
from debezium_server_spark.streaming.stateful import scd2_stream


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_scd2_fold_matches_reference_across_batches(spark):
    rows = [
        # key 1: a a b | b c a  -> closed (a,1,3) (b,3,5) (c,5,6)
        (1, _ts(1), "a", 10, 0),
        (1, _ts(2), "a", 11, 0),
        (1, _ts(3), "b", 12, 0),
        (1, _ts(4), "b", 13, 1),
        (1, _ts(5), "c", 14, 1),
        (1, _ts(6), "a", 15, 1),
        # key 2: constant value -> nothing closes
        (2, _ts(1), "x", 20, 0),
        (2, _ts(4), "x", 21, 1),
        # key 3: appears only in batch 2, single change
        (3, _ts(4), "p", 30, 1),
        (3, _ts(5), "q", 31, 1),
        # key 4: single row ever -> nothing closes
        (4, _ts(2), "z", 40, 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, state string, "
              "event_id long, b int")
    out = replay_stream(
        spark, df,
        lambda s: scd2_stream(s, "user_id", "state", ts_col="ts",
                              id_col="event_id"),
        batch_col="b",
    )
    got = sorted(
        (r["key"], r["state"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    expect = sorted([
        (1, "a", _ts(1), _ts(3)),
        (1, "b", _ts(3), _ts(5)),
        (1, "c", _ts(5), _ts(6)),
        (3, "p", _ts(4), _ts(5)),
    ])
    assert got == expect


def test_scd2_fold_equal_run_spanning_three_batches(spark):
    rows = [
        (7, _ts(1), "v1", 1, 0),
        (7, _ts(2), "v1", 2, 1),
        (7, _ts(3), "v1", 3, 2),
        (7, _ts(4), "v2", 4, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, state string, "
              "event_id long, b int")
    out = replay_stream(
        spark, df,
        lambda s: scd2_stream(s, "user_id", "state", ts_col="ts",
                              id_col="event_id"),
        batch_col="b",
    )
    got = [(r["key"], r["state"], r["valid_from"], r["valid_to"])
           for r in out.collect()]
    # the v1 run opened in batch 0 must close at its TRUE start (_ts(1)),
    # proving the carried (cur, since) state survives no-op batches
    assert got == [(7, "v1", _ts(1), _ts(4))]
