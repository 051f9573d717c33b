"""Upsert / SCD2 / log-compaction tests."""

from __future__ import annotations

import datetime as dt

from df_spark.operators.cdc import latest_per_key, scd2_apply, upsert


def ts(d):
    return dt.datetime(2024, 1, d)


def test_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, val string")
    updates = spark.createDataFrame([(2, "B2"), (4, "d")], "k long, val string")
    out = {r.k: r.val for r in upsert(target, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_scd2_apply(spark):
    history = spark.createDataFrame(
        [(1, "v1", ts(1), True, None), (2, "w1", ts(1), True, None),
         (1, "v0", ts(0 + 1), False, ts(1))],
        "k long, val string, start_ts timestamp, is_current boolean, end_ts timestamp")
    updates = spark.createDataFrame(
        [(1, "v2", ts(5))], "k long, val string, start_ts timestamp")
    out = scd2_apply(history, updates, ["k"], "start_ts")
    rows = sorted(((r.k, r.val, r.is_current, r.end_ts) for r in out.collect()))
    # key 1: old current closed at ts(5), new current open; key 2 untouched
    assert (1, "v1", False, ts(5)) in rows
    assert (1, "v2", True, None) in rows
    assert (2, "w1", True, None) in rows
    current = [r for r in rows if r[2]]
    assert len(current) == 2


def test_latest_per_key(spark):
    log = spark.createDataFrame(
        [(1, ts(1), "old"), (1, ts(3), "new"), (2, ts(2), "only")],
        "k long, ts timestamp, val string")
    out = {r.k: r.val for r in latest_per_key(log, ["k"], "ts").collect()}
    assert out == {1: "new", 2: "only"}
