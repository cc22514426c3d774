"""Bounded-memory frequency sketches (Misra-Gries / SpaceSaving family).

The reference has no sketches (its only aggregation is the README's
MAX/SUM pair — SURVEY.md §2.7); this is beyond-parity scope for the
training-data north star: finding heavy-hitter tokens / URLs / shingles in a
corpus whose *distinct-item* count dwarfs executor memory, where an exact
``groupBy(item).count()`` would shuffle billions of distinct keys.

Design (the 100 TB story):

* Items are hash-repartitioned BY ITEM first, so each distinct item lives in
  exactly one partition and per-partition estimates are globally valid —
  merging is a plain union, no cross-partition counter addition (which would
  need the full summary lattice).
* Each partition runs batched Misra-Gries with ``capacity`` counters:
  exact pandas ``value_counts`` per Arrow batch merged into the carried
  dict, then one vectorized eviction — subtract the (capacity+1)-th largest
  count, drop non-positives. Memory is O(capacity + batch distinct), never
  O(partition distinct).
* Every partition also emits its cumulative decrement ``d_p``, making the
  output SELF-CERTIFYING via the MG invariant: for any item, the true
  partition-local (== global, by the disjoint partitioning) count satisfies
  ``est <= true`` and ``true - est <= d_p`` if the item survived, else
  ``true <= d_p``. Downstream checks (and the driver oracle) verify those
  booleans without ever materializing exact counts at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summary(
    df: DataFrame,
    col: str = "item",
    capacity: int = 32,
    num_partitions: int = 16,
) -> DataFrame:
    """Heavy-hitters summary: one row per surviving counter.

    Output: ``item`` (string), ``est`` (long, guaranteed under-estimate),
    ``d_p`` (long, the emitting partition's total decrement — the certified
    max under-count for its items and max true count for its evictions).
    """
    items = df.select(F.col(col).cast("string").alias("item")).repartition(
        num_partitions, F.col("item")
    )

    # Closure-only kernel (module-level helpers pickle by reference and the
    # driver's workers cannot import this repo).
    def gen(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        decrements = 0
        for pdf in batches:
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                cut = vals[capacity]  # (capacity+1)-th largest
                decrements += cut
                counters = {k: v - cut for k, v in counters.items() if v > cut}
        if counters:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()),
                    "est": list(counters.values()),
                    "d_p": [decrements] * len(counters),
                }
            )
        else:
            # A near-uniform partition can evict every counter (valid MG —
            # nothing exceeds the bound). The decrement total is still the
            # load-bearing output: without it, a downstream max(d_p) would
            # under-state the global bound and wrongly certify absent items
            # as low-frequency. Emit it as a null-item summary row.
            yield pd.DataFrame({"item": [None], "est": [None], "d_p": [decrements]})

    return items.mapInPandas(gen, schema="item string, est long, d_p long")
