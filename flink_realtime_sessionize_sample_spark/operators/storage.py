"""Physical-layout operators: bucketed tables for shuffle-free joins and
partitioned writes for partition-pruned scans.

The reference hand-tunes its one physical choice (`keyBy` on
`ip.hashCode % 1200`, /root/reference/src/main/scala/processes/Sessionize.scala:5);
Spark's equivalents are DECLARED on storage and exploited by the planner.
At 100 TB these two are the difference between a join that moves 100 TB
across the network every run and one that moves nothing:

- **Bucketing** (`bucketBy` on the join/agg key): both sides land
  pre-hash-partitioned; Catalyst proves the partitioning requirement is
  already met and plans SortMergeJoin with ZERO Exchange. Pay the shuffle
  once at write time, amortize it over every subsequent join/agg.
- **Partitioned layout** (`partitionBy` on a low-cardinality scan predicate
  column): directory-level pruning means a filter on the partition column
  reads only matching files — the scan cost is proportional to the slice,
  not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the Sort from future
    sort-merge joins on the same key. ``n_buckets`` should be sized so one
    bucket ≈ one task's worth of data at target scale (at 100 TB / 1000
    executors, thousands of buckets; the constant here is test-scale).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def join_bucketed(spark: SparkSession, left_table: str, right_table: str, on: list[str]) -> DataFrame:
    """Join two tables bucketed on the join key.

    When both sides were written with the same bucket count on ``on``,
    the physical plan contains no ShuffleExchange (asserted in
    tests/test_storage.py) — the join is executor-local.
    """
    return spark.table(left_table).join(spark.table(right_table), on)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write parquet hive-partitioned by ``partition_cols``.

    Choose low-cardinality columns that appear in scan predicates (date,
    lang, source). High-cardinality partition columns create a
    small-files explosion — prefer bucketing for those.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_pruned(spark: SparkSession, path: str, predicate: str) -> DataFrame:
    """Scan a partitioned dataset with a partition predicate.

    Catalyst turns the predicate into PartitionFilters: only matching
    directories are listed and read. The test asserts the scanned
    partition count via the executed plan's metrics.
    """
    return spark.read.parquet(path).filter(F.expr(predicate))
