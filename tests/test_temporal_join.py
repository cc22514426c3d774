"""Unit fixtures for the temporal joins (operators/temporal_join.py):
exact-timestamp ties, no-match nulls, bucket-boundary inclusivity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.operators.temporal_join import (
    asof_join,
    bucketed_interval_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(10), "b"), (1, _ts(20), "c"), (2, _ts(5), "d")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(6), 60.0)],
        "k long, ts timestamp, px double",
    )
    got = {
        r["tag"]: (r["px"], r["right_ts"])
        for r in asof_join(left, right, on="k", ts="ts", right_payload=["px"]).collect()
    }
    assert got["a"] == (None, None)          # no right row at-or-before
    assert got["b"] == (100.0, _ts(10))      # exact-ts match is inclusive
    assert got["c"] == (150.0, _ts(15))      # latest wins
    assert got["d"] == (None, None)          # other key's rows invisible


def test_asof_exclusive_ties(spark):
    left = spark.createDataFrame([(1, _ts(10), "b")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(10), 100.0)], "k long, ts timestamp, px double"
    )
    (row,) = asof_join(
        left, right, on="k", ts="ts", right_payload=["px"], allow_exact_matches=False
    ).collect()
    assert row["px"] == 50.0  # equal-ts right row skipped when exclusive


def test_asof_multi_key_and_payload_defaulting(spark):
    left = spark.createDataFrame(
        [(1, "x", _ts(9), 1), (1, "y", _ts(9), 2)],
        "k long, g string, ts timestamp, id long",
    )
    right = spark.createDataFrame(
        [(1, "x", _ts(1), 11.0), (1, "y", _ts(2), 22.0)],
        "k long, g string, ts timestamp, px double",
    )
    got = {r["id"]: r["px"] for r in asof_join(left, right, on=["k", "g"], ts="ts").collect()}
    assert got == {1: 11.0, 2: 22.0}


def test_bucketed_interval_join_boundaries(spark):
    # bucket = 10 s; interval [5, 25) spans buckets 0,1,2
    points = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate([4.999999, 5.0, 9.5, 24.999999, 25.0, 30.0])],
        "pid long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [(1, _ts(5), _ts(25)), (2, _ts(30), _ts(30.000001))],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    got = sorted(
        (r["pid"], r["window_id"])
        for r in bucketed_interval_join(points, ivals, bucket_seconds=10).collect()
    )
    # start inclusive (pid 1), end exclusive (pid 3 in, pid 4 out),
    # sub-second interval at a bucket boundary still catches pid 5
    assert got == [(1, 1), (2, 1), (3, 1), (5, 2)]


def test_bucketed_interval_join_matches_naive(spark):
    import random

    rnd = random.Random(7)
    points = spark.createDataFrame(
        [(i, _ts(rnd.uniform(0, 1000))) for i in range(300)], "pid long, ts timestamp"
    )
    raw = [(j, rnd.uniform(0, 900)) for j in range(25)]
    ivals = spark.createDataFrame(
        [(j, _ts(s), _ts(s + rnd.uniform(1, 120))) for j, s in raw],
        "window_id long, w_start timestamp, w_end timestamp",
    )
    fast = bucketed_interval_join(points, ivals, bucket_seconds=30)
    naive = points.join(
        ivals, (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    key = lambda r: (r["pid"], r["window_id"])
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))
