"""Distributed global ordering: rank / ntile / running sum without the
single-partition sort.

``Window.orderBy(...)`` with no ``partitionBy`` is correct but collapses the
input to ONE task (Spark warns: "No Partition Defined for Window
operation"). For a table proportional to the data — |customers|, |vocab| —
that is the classic scale pinch: one executor sorts (and for running sums,
scans) everything while the rest of the cluster idles.

The standard two-pass rewrite used here:

1. **Range-partition + local sort** — ``repartitionByRange(sort_keys)``
   gives non-overlapping, ordered key ranges; ``sortWithinPartitions``
   orders each range locally. This is exactly how Spark executes a global
   ``orderBy``, minus the final single-partition collapse.
2. **Local position** — ``monotonically_increasing_id()`` computed after
   the local sort encodes (partition id << 33) | record-index (documented
   bit layout of the function), so the local row number and the physical
   partition index come from a pure projection: no extra shuffle, no
   window, no Python.
3. **Partition offsets** — per-partition row counts (and value sums, for
   running totals) are aggregated into ONE row holding an array of at most
   ``num_partitions`` structs (bounded by config, not data) and broadcast;
   a higher-order ``aggregate(filter(...))`` prefix-sum turns each row's
   (partition, local position) into its exact global rank — and, when a
   value column is given, its exact global running sum.

The per-partition aggregate is taken on a second consumer of the SAME
range exchange (``spark_partition_id()`` + count/sum, no sort), so AQE's
ReusedExchange shuffles the data once and the offsets branch never pays
the sort. The only single-partition hops left are O(num_partitions)-row
scalar-aggregate collapses — the same shape as any global ``count()``.

The running-sum variant additionally needs each row's *local* prefix sum,
which no projection can produce; that one window rides the partition-index
key (``Window.partitionBy(_pid)``) — a uniformly-balanced hash exchange
(range partitions are near-equal by construction), never a single task.

Exactness: identical results to the global-window formulation whenever the
sort key is total (callers append a unique tiebreaker — the oracles already
do, for deterministic ntile/rank). Range boundaries come from sampling, but
rank correctness needs only disjoint ordered ranges, which the range
partitioner guarantees regardless of where the sampled cut points land.

Used by ``customer_rfm_segments`` / ``customer_pareto_abc`` /
``doc_zipf_fit`` (plans/analytics_queries.py), replacing their documented
global-sort pinches. Parity with the reference: the reference's Flink job
never needs a global order (per-key MapState only,
SessionizeGroupMapFunction.scala:90-130); this operator exists for the
beyond-parity analytics surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID_BITS = 33  # monotonically_increasing_id: upper 31 bits = partition id


def _sort_exprs(sort_cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in sort_cols]


def with_global_rank(
    df: DataFrame,
    sort_cols: Sequence[Column | str],
    *,
    rank_col: str = "rank",
    total_col: str | None = None,
    sum_col: str | None = None,
    cum_col: str | None = None,
    sum_total_col: str | None = None,
    extra_cums: Sequence[tuple[str, str]] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the exact global row number under ``sort_cols`` — distributed.

    Optionally also attaches:
      * ``total_col``      — total row count (same value every row),
      * ``cum_col``        — exact running sum of ``sum_col`` in rank order,
      * ``sum_total_col``  — grand total of ``sum_col`` (valid with or
        without ``cum_col``; requesting it without ``sum_col`` raises),
      * ``extra_cums``     — further ``(sum_col, cum_col)`` pairs; every
        running sum rides the SAME range exchange, local window, and
        broadcast offsets row (the two-sample CDF shape — e.g. a KS
        statistic needs both groups' cumulative counts in one pass).

    ``sort_cols`` must form a total order (append a unique tiebreaker) for
    the rank to be deterministic. Sum columns must be integral (offsets
    accumulate exactly as longs).
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = _sort_exprs(sort_cols)
    if sum_total_col is not None and sum_col is None:
        raise ValueError("sum_total_col requires sum_col")
    # ``cum_col`` may be None with ``sum_col`` set (grand total only): the
    # pair still contributes its per-partition partial (``_psum0``) so
    # ``sum_total_col`` resolves, but skips the local prefix-sum window.
    pairs: list[tuple[str, str | None]] = (
        [(sum_col, cum_col)] if sum_col is not None else []
    ) + list(extra_cums)

    ranged = df.repartitionByRange(n_part, *keys)

    # Branch 1: local sort + pure-projection (pid, local row number).
    local = (
        ranged.sortWithinPartitions(*keys)
        .withColumn("_mono", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mono", _PID_BITS))
        .withColumn("_lrn", F.col("_mono").bitwiseAND(F.lit((1 << _PID_BITS) - 1)))
        .drop("_mono")
    )
    if pairs:
        # Local prefix sums: the one pass a projection cannot do. Keyed on
        # the partition index — a balanced hash exchange, never one task.
        # All pairs share one window spec → one sort, however many sums.
        w_loc = Window.partitionBy("_pid").orderBy("_lrn").rowsBetween(
            Window.unboundedPreceding, 0
        )
        for i, (sc, cc) in enumerate(pairs):
            if cc is not None:
                local = local.withColumn(f"_lcs{i}", F.sum(sc).over(w_loc))

    # Branch 2: per-partition totals straight off the reused range
    # exchange — count/sum need no sort, so this branch never re-sorts.
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for i, (sc, _) in enumerate(pairs):
        aggs.append(F.sum(sc).cast("long").alias(f"_psum{i}"))
    sum_fields = [f"_psum{i}" for i in range(len(pairs))]
    per_pid = (
        ranged.withColumn("_pid", F.spark_partition_id()).groupBy("_pid").agg(*aggs)
    )
    parts = per_pid.agg(
        F.array_sort(
            F.collect_list(F.struct("_pid", "_cnt", *sum_fields))
        ).alias("_parts")
    )

    out = local.crossJoin(F.broadcast(parts))  # 1-row broadcast cross join

    def _prefix(field: str) -> Column:
        before = F.filter("_parts", lambda e: e["_pid"] < F.col("_pid"))
        return F.aggregate(
            before, F.lit(0).cast("long"), lambda acc, e: acc + e[field]
        )

    def _grand(field: str) -> Column:
        return F.aggregate(
            "_parts", F.lit(0).cast("long"), lambda acc, e: acc + e[field]
        )

    out = out.withColumn(rank_col, (_prefix("_cnt") + F.col("_lrn") + F.lit(1)))
    if total_col is not None:
        out = out.withColumn(total_col, _grand("_cnt"))
    for i, (_, cc) in enumerate(pairs):
        if cc is not None:
            out = out.withColumn(cc, _prefix(f"_psum{i}") + F.col(f"_lcs{i}"))
    if sum_total_col is not None:
        out = out.withColumn(sum_total_col, _grand("_psum0"))
    drop = ["_pid", "_lrn", "_parts"] + [
        f"_lcs{i}" for i, (_, cc) in enumerate(pairs) if cc is not None
    ]
    return out.drop(*drop)


def ntile_from_rank(rank: Column, total: Column, buckets: int) -> Column:
    """SQL-standard ``ntile(buckets)`` from an exact global (rank, total).

    First ``total % buckets`` tiles get ``total // buckets + 1`` rows, the
    rest ``total // buckets`` — identical to the window function, so the
    oracle's ``ntile`` needs no redefinition.
    """
    base = F.floor(total / buckets)
    rem = total % buckets
    big = base + 1  # size of the first `rem` tiles
    in_big = (rank - 1) < rem * big
    return (
        F.when(in_big, F.floor((rank - 1) / big))
        .otherwise(rem + F.floor((rank - 1 - rem * big) / F.greatest(base, F.lit(1))))
        .cast("int")
        + F.lit(1)
    ).alias("ntile")


def with_global_prefix_max(
    df: DataFrame,
    sort_cols: Sequence[Column | str],
    value_col: str,
    *,
    out_col: str = "prefix_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the exact running MAX of ``value_col`` over all *strictly
    previous* rows in ``sort_cols`` order (NULL for the global first row) —
    distributed, same two-pass shape as :func:`with_global_rank`.

    The strictly-previous frame is what dominance sweeps need (2-D skyline:
    a point survives iff its value exceeds every earlier point's): range
    partition + local sort, a local ``ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING`` window keyed on the partition index, and ONE broadcast row
    of per-partition maxima folded into each row's cross-partition prefix.
    No single-partition sort anywhere; the only 1-task hop is the
    O(num_partitions)-row offsets collapse.

    ``value_col`` must be orderable; sort keys must form a total order for
    a deterministic result (append a tiebreaker).
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = _sort_exprs(sort_cols)

    ranged = df.repartitionByRange(n_part, *keys)
    local = (
        ranged.sortWithinPartitions(*keys)
        .withColumn("_mono", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mono", _PID_BITS))
        .withColumn("_lrn", F.col("_mono").bitwiseAND(F.lit((1 << _PID_BITS) - 1)))
        .drop("_mono")
    )
    w_prev = Window.partitionBy("_pid").orderBy("_lrn").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = local.withColumn("_lpm", F.max(value_col).over(w_prev))

    per_pid = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.max(value_col).alias("_pmax"))
    )
    parts = per_pid.agg(
        F.array_sort(F.collect_list(F.struct("_pid", "_pmax"))).alias("_parts")
    )

    out = local.crossJoin(F.broadcast(parts))
    before = F.filter("_parts", lambda e: e["_pid"] < F.col("_pid"))
    cross_pm = F.array_max(F.transform(before, lambda e: e["_pmax"]))
    return out.withColumn(
        out_col,
        F.when(F.col("_lpm").isNull(), cross_pm)
        .when(cross_pm.isNull(), F.col("_lpm"))
        .otherwise(F.greatest(F.col("_lpm"), cross_pm)),
    ).drop("_pid", "_lrn", "_parts", "_lpm")
