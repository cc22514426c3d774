"""Stateful streaming analytics — the MG sketch and the funnel state machine.

Two update-mode ``applyInPandasWithState`` operators with constant-size
per-group state: ``heavy_hitters_stream`` (bounded-memory top talkers) and
``funnel_stream`` (live ordered-funnel progression). The sketch composes the bounded-memory frequency sketch (``operators/sketch.py``) with
the coarse-bucket state layout proven out by the bucketed sessionizer: items
hash into a fixed number of buckets, each bucket group carries its MG
counters (parallel-array GroupState row) across micro-batches, and every
trigger re-emits the bucket's current summary in update mode — a live
"top talkers" feed over an unbounded stream in O(buckets × capacity) state,
where exact streaming counts would grow state with distinct items.

The MG invariant survives streaming unchanged (each bucket sees every
instance of its items exactly once, in arrival order): per surviving item
``est ≤ true`` and ``true − est ≤ d_p``; per evicted item ``true ≤ d_p`` —
so downstream checks stay partitioning- AND batching-independent.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SKETCH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("decrements", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("item", StringType()),
        StructField("est", LongType()),
        StructField("d_p", LongType()),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame,
    item_col: str = "item",
    capacity: int = 16,
    num_buckets: int = 16,
) -> DataFrame:
    """Per-bucket streaming MG summary in update mode.

    Output per trigger: (bucket, item, est, d_p) — the bucket's CURRENT
    counters; consumers keep the latest row per (bucket, item).
    """
    items = stream.select(F.col(item_col).cast("string").alias("item")).withColumn(
        "_bucket", F.pmod(F.xxhash64("item"), F.lit(num_buckets)).cast("long")
    )

    cap = capacity

    # Closure-only kernel: workers cannot import this repo.
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_items, s_counts, decrements = state.get
            counters = dict(zip(list(s_items), [int(c) for c in s_counts]))
            decrements = int(decrements)
        else:
            counters, decrements = {}, 0
        for pdf in pdfs:
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                cut = vals[cap]
                decrements += cut
                counters = {k: v - cut for k, v in counters.items() if v > cut}
        state.update((list(counters.keys()), list(counters.values()), decrements))
        if counters:
            yield pd.DataFrame(
                {
                    "bucket": [key[0]] * len(counters),
                    "item": list(counters.keys()),
                    "est": list(counters.values()),
                    "d_p": [decrements] * len(counters),
                }
            )
        else:
            # A near-uniform stream can evict EVERY counter (each round
            # subtracts the (cap+1)-th largest count; with all-singleton
            # counts that empties the dict — valid MG, nothing exceeds the
            # bound). The decrement total is still the load-bearing output
            # (it certifies "no item exceeds d_p"), so emit it as a
            # null-item summary row rather than nothing.
            yield pd.DataFrame(
                {
                    "bucket": [key[0]],
                    "item": [None],
                    "est": [None],
                    "d_p": [decrements],
                }
            )

    return items.groupBy("_bucket").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_SKETCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t_view", LongType()),
        StructField("t_click", LongType()),
        StructField("t_purchase", LongType()),
    ]
)

_FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", StringType()),
        StructField("ts_us", LongType()),
    ]
)


def funnel_stream(
    stream,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    stages: tuple = ("view", "click", "purchase"),
) -> DataFrame:
    """Real-time ordered-funnel tracking: per-key GroupState holds the first
    instant each stage was reached (a stage only advances on an event
    strictly AFTER the previous stage, same semantics as the batch
    ``funnel_stage_conversion``); emits one row per stage ADVANCE, so the
    sink receives the live conversion log rather than per-event noise.

    State is three longs per user — constant-size, same scale contract as
    the sessionizer's state tuple. Arrival order across micro-batches,
    (ts, arrival) order within a batch: on in-order input this equals the
    batch funnel's per-user stage instants exactly.
    """
    items = stream.select(
        F.col(key).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts)).alias("ts_us"),
        F.col(type_col).alias("etype"),
    )

    s1, s2, s3 = stages

    def fn(
        key_t: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tv, tc, tp = (None if v is None else int(v) for v in state.get)
        else:
            tv = tc = tp = None
        advances = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_us")
            for ts_us, etype in zip(pdf["ts_us"], pdf["etype"]):
                t = int(ts_us)
                if etype == s1 and tv is None:
                    tv = t
                    advances.append((s1, t))
                elif etype == s2 and tc is None and tv is not None and t > tv:
                    tc = t
                    advances.append((s2, t))
                elif etype == s3 and tp is None and tc is not None and t > tc:
                    tp = t
                    advances.append((s3, t))
        state.update((tv, tc, tp))
        yield pd.DataFrame(
            {
                "user_id": [key_t[0]] * len(advances),
                "stage": [a[0] for a in advances],
                "ts_us": [a[1] for a in advances],
            }
        )

    return items.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_FUNNEL_OUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
