"""fan_out's r16 metadata-only split estimate must make the SAME
repartition decision the old ``df.rdd.getNumPartitions()`` probe made —
the estimate replicates FilePartition.maxSplitBytes + greedy packing, so
the two can only diverge if that replication drifts from Spark's actual
scan planning. Checked by comparing the estimate's decision against the
true post-scan partition count on parquet inputs of both regimes (few
small files → repartition; in-memory/derived frames → RDD fallback)."""

from __future__ import annotations

import pytest

from flink_realtime_sessionize_sample_spark.operators.dedup import fan_out
from flink_realtime_sessionize_sample_spark.sources.registry import load_table


@pytest.mark.parametrize("table", ["documents", "events"])
def test_fan_out_matches_rdd_probe_on_parquet(spark, table):
    df = load_table(spark, "/root/testdata/sf0.01", table)
    target = spark.sparkContext.defaultParallelism
    true_splits = df.rdd.getNumPartitions()  # ground truth (old probe)
    out = fan_out(df)
    if true_splits < target:
        assert out.rdd.getNumPartitions() == target  # repartitioned
    else:
        assert out is df  # no-op: no shuffle added


def test_fan_out_falls_back_for_derived_frames(spark):
    # A createDataFrame frame has no input files — the estimate path must
    # defer to the RDD probe, never crash or skip the spread.
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    target = spark.sparkContext.defaultParallelism
    true_splits = df.rdd.getNumPartitions()
    out = fan_out(df)
    if true_splits < target:
        assert out.rdd.getNumPartitions() == target
    else:
        assert out is df
