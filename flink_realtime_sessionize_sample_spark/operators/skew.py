"""Skew-resilient aggregation: the salted two-stage rewrite.

At 100 TB a single hot key (one power user, one bot IP, one empty-string
default) can hold an entire ``groupBy`` stage hostage: every row for that
key lands on one reducer. AQE's skew handling splits *join* partitions but
a skewed hash **aggregate** still funnels each key through one task. The
standard fix is salting — aggregate in two stages:

1. **partial**: group by (keys…, salt) where salt spreads each key over
   ``buckets`` reducers; each partial task sees ≤ 1/buckets of the hot key.
2. **final**: re-aggregate the partials by (keys…) — input is at most
   ``buckets`` rows per key, so the second shuffle is trivially balanced.

Supported aggregates are the decomposable ones (sum/count/min/max and avg
as sum÷count) — exactly the algebraic class Spark itself uses for map-side
partial aggregation. The rewrite is semantics-preserving; the oracle query
(`salted_user_event_totals`) hash-checks it against a plain GROUP BY.

Note Spark's own partial aggregation already handles *moderate* skew (the
map side combines before the shuffle); salting matters when per-key state
is too big to combine map-side (many distinct groups per mapper) or the
aggregation buffer is heavy. The operator exists so pipelines can opt in
per aggregation without restructuring.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    # count(col) = non-null count (SQL COUNT(col) semantics); use
    # ("count", "*", out) for COUNT(*) row counts.
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}
_FINAL = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: Iterable[str],
    aggs: Iterable[tuple[str, str, str]],
    buckets: int = 32,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: (fn, column, out_name) triples with fn ∈ {sum, count, min,
    max, avg}; ``count`` follows SQL COUNT(col) (non-null) semantics, with
    ``"*"`` for row counts. ``salt_col`` defaults to a **content-derived**
    hash of the whole row (``pmod(xxhash64(*cols), buckets)``): it must be
    deterministic per row, not per task attempt — a nondeterministic salt
    (e.g. ``monotonically_increasing_id``) used as a grouping key can
    re-route rows between salt buckets when a lost shuffle partition forces
    a partial stage recompute (indeterminate-stage hazard), double-counting
    or dropping them. The salt only routes rows; it never appears in the
    result.
    """
    keys = list(keys)
    aggs = list(aggs)
    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(F.xxhash64(*df.columns), F.lit(buckets))
    )

    partial_specs: list[Column] = []
    final_specs: list[Column] = []
    for fn, col, out in aggs:
        if fn == "avg":
            partial_specs += [
                F.sum(col).alias(f"_{out}_sum"),
                F.count(F.lit(1)).alias(f"_{out}_cnt"),
            ]
            final_specs += [
                (F.sum(f"_{out}_sum") / F.sum(f"_{out}_cnt")).alias(out)
            ]
        elif fn in _PARTIAL:
            partial_specs.append(_PARTIAL[fn](col).alias(f"_{out}_p"))
            final_specs.append(_FINAL[fn](f"_{out}_p").alias(out))
        else:
            raise ValueError(f"unsupported (non-decomposable) aggregate {fn!r}")

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_specs)
    return partial.groupBy(*keys).agg(*final_specs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Iterable[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Skew-resilient equi join: salt the (skewed) left side, replicate the
    right side across all salt values, join on (keys…, salt).

    A hot join key sends every matching left row to one reducer; salting
    spreads it over ``buckets`` reducers at the cost of duplicating the
    right side ``buckets``× — the right tool when the right side is too big
    to broadcast outright but small relative to the skewed fact (the classic
    fact⨝mid-size-dim shape). AQE's skew-join splitting handles sort-merge
    skew adaptively; explicit salting is for when you want the guarantee
    (streaming micro-batches, deterministic stage sizing) or a non-AQE sink.

    The salt routes rows only and never appears in the output. It is
    derived from row content (``pmod(xxhash64(*cols), buckets)``) so a task
    retry routes each row to the same bucket — and even if it didn't, every
    (keys, salt) bucket joins against a full copy of the right rows for
    those keys, so the join is retry-safe either way. ``how`` supports the
    left-preserving joins (inner/left/left_semi/left_anti).
    """
    keys = list(on)
    if how not in {"inner", "left", "leftouter", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(f"salted_join preserves the left side; {how!r} unsupported")
    l = left.withColumn("_salt", F.pmod(F.xxhash64(*left.columns), F.lit(buckets)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return l.join(r, keys + ["_salt"], how).drop("_salt")
