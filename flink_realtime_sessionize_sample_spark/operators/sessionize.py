"""Batch sessionization — the reference's core operator, rebuilt Spark-native.

Reference: ``processes/sessionize/SessionizeGroupMapFunction.scala:10-117``
(a Flink ``RichMapFunction`` over TTL'd keyed ``MapState``). Decision
procedure per event, for key ``ip`` (SURVEY.md §2.6):

1. no state            → new session, duration 0
2. gap cut             → ``ts_sec − last_sec > 1800``            (``:35,113``)
3. size cut            → ``count + 1 >= 1500`` (max 1499 events)  (``:47,115``)
4. duration cut        → ``ts_sec − first_sec > 43200`` (strict)  (``:59,114``)
5. else continuation   → duration = ``ts_sec − first_sec``        (``:83``)

``session_id = "{key}-{first event's timestamp}"`` (``:107``); duration is
integer whole seconds, 0 on every session-opening event (``:28,43,55,67``).
We implement the *intended* semantics (quirk Q1 in SURVEY §2.10: the literal
code compares millis to seconds, making every event a new session; the
README's stated 30-minute-gap rule is what we build).

Spark-first design — why this shape scales to 100 TB
----------------------------------------------------
The size/duration caps make exact sessionization inherently sequential
*within* a gap-session (each cut moves the anchor the next cut is measured
from) — not expressible in window functions. But the whole cut chain is
**forward-only**, so the operator is ONE shuffle on the key, ONE
in-partition sort, and ONE Arrow-streamed ``mapInPandas`` pass with O(1)
state carried across batches (``sessionize``). The common case inside a
batch is pure vectorized numpy; only cap-tripping segments loop. The
gap-only rule IS window-expressible and ships as the zero-Python
``sessionize_gap_only`` — the shape Catalyst optimizes end-to-end — for
workloads that don't need the caps.

Late data: batch mode sorts by ``(ts, tiebreaker)`` within key, which is the
deterministic formulation the oracle checks (SURVEY §2.4 — the reference's
watermark is inert and it processes arrival order, compensating downstream
with MAX(duration); after that collapse, both formulations agree).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

# Constants from SessionizeGroupMapFunction.scala:113-115 (intended units).
GAP_SECONDS = 1800
MAX_SESSION_EVENTS = 1499  # "count + 1 >= 1500" → a session holds ≤ 1499 events (quirk Q3)
MAX_SESSION_DURATION_SECONDS = 43200  # 12 h, strict >


def _sec(col: str | Column) -> Column:
    """Epoch whole seconds (floor), matching the reference's ``ts / 1000``
    integer division on epoch millis and DuckDB's ``epoch_us(ts)//1000000``."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_micros(c) / F.lit(1000000)).cast("long")  # micros are non-negative here; / then cast = floor


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreakers: Iterable[str] = ("event_id",),
    gap_seconds: int = GAP_SECONDS,
    max_events: int = MAX_SESSION_EVENTS,
    max_duration_seconds: int = MAX_SESSION_DURATION_SECONDS,
) -> DataFrame:
    """Attach ``session_id`` (string) and ``duration`` (int seconds) to every event.

    Output: all input columns + ``session_id`` + ``duration``. Session ids are
    ``{key}-{unix_micros(first event ts)}`` — deterministic per input like the
    reference's ``"{ip}-{timestamp}"`` (quirk Q8), using the numeric instant so
    Spark and DuckDB render identically.

    Implementation: ONE shuffle on ``key``, ONE in-partition sort, ONE
    Arrow-streamed ``mapInPandas`` pass. The cut chain
    (SessionizeGroupMapFunction.scala:35-83) is **forward-only** — every
    event's session assignment depends only on earlier events of the same
    key — so a single streaming pass with O(1) carry state between Arrow
    batches computes it exactly; nothing ever needs to look ahead or buffer.
    Within a batch the common case is fully vectorized: gap boundaries via
    shifted compares, per-segment first/duration via ``np.repeat``; only
    segments that actually trip the 1499-event / 12 h caps (rare by
    construction) take a sequential loop. This replaced a window-function
    fast-path + ``applyInPandas`` refinement design whose DAG branch point
    recomputed the sort+window stack per branch (Catalyst column pruning
    specializes each branch's subtree, defeating ReuseExchange) — measured
    1.9× slower than this single pass at 1M rows / local[32].
    """
    tiebreakers = list(tiebreakers)
    in_cols = list(df.columns)
    # Fresh StructType — StructType.add MUTATES in place, and df.schema is
    # cached on the DataFrame, so .add would corrupt the caller's df.
    # The kernel emits the numeric session start; session_id's string concat
    # happens JVM-side after the pass (codegen'd, and the Arrow return ships
    # one int64 instead of a string column).
    kernel_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("_start_us", LongType(), False),
            StructField("duration", IntegerType(), False),
        ]
    )

    d = (
        df.withColumn("_us", F.unix_micros(F.col(ts)))
        .repartition(F.col(key))
        .sortWithinPartitions(key, ts, *tiebreakers)
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import numpy as np

        ck = None  # carried key value (None = no open session)
        c_first_sec = c_first_us = 0
        c_count = 0
        c_prev_sec = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            k = pdf[key].to_numpy()
            us = pdf.pop("_us").to_numpy()
            # floor-division == the reference's ts/1000 integer math (_sec)
            sec = us // 1_000_000

            new_key = np.empty(n, dtype=bool)
            new_key[0] = ck is None or k[0] != ck
            new_key[1:] = k[1:] != k[:-1]
            prev_sec = np.empty(n, dtype=np.int64)
            prev_sec[0] = sec[0] if new_key[0] else c_prev_sec
            prev_sec[1:] = sec[:-1]
            is_new = new_key | (sec - prev_sec > gap_seconds)

            # Gap-session segments. If row 0 continues the carried session,
            # segment 0 starts "before" the batch with the carried state.
            starts = np.flatnonzero(is_new)
            cont = not is_new[0]
            bounds = np.concatenate(([0], starts, [n])) if cont else np.concatenate((starts, [n]))
            seg_i0 = bounds[:-1]
            seg_i1 = bounds[1:]  # exclusive
            seg_len = seg_i1 - seg_i0
            nseg = len(seg_len)

            seg_first_sec = sec[seg_i0].copy()
            seg_first_us = us[seg_i0].copy()
            seg_count0 = np.zeros(nseg, dtype=np.int64)
            if cont:
                seg_first_sec[0] = c_first_sec
                seg_first_us[0] = c_first_us
                seg_count0[0] = c_count

            # A segment is cap-clean iff no size/duration cut can fire inside
            # it: final count within budget AND last event inside the 12 h
            # span (both monotone → checking the last row suffices).
            last_sec = sec[seg_i1 - 1]
            ok = (seg_count0 + seg_len <= max_events) & (
                last_sec - seg_first_sec <= max_duration_seconds
            )

            row_first_sec = np.repeat(seg_first_sec, seg_len)
            row_first_us = np.repeat(seg_first_us, seg_len)
            # carry-out defaults (overwritten below if the last segment loops)
            c_first_sec = int(seg_first_sec[-1])
            c_first_us = int(seg_first_us[-1])
            c_count = int(seg_count0[-1] + seg_len[-1])

            for si in np.flatnonzero(~ok):
                # Exact sequential cut chain, mirroring
                # SessionizeGroupMapFunction.scala:35-83 (gap cuts cannot
                # fire here — consecutive gaps ≤ gap_seconds by construction).
                fs = int(seg_first_sec[si])
                fu = int(seg_first_us[si])
                cnt = int(seg_count0[si])
                for i in range(seg_i0[si], seg_i1[si]):
                    cnt += 1
                    if cnt > max_events or sec[i] - fs > max_duration_seconds:
                        fs, fu, cnt = int(sec[i]), int(us[i]), 1
                    row_first_sec[i] = fs
                    row_first_us[i] = fu
                if si == nseg - 1:
                    c_first_sec, c_first_us, c_count = fs, fu, cnt

            ck = k[-1]
            c_prev_sec = int(sec[-1])

            pdf["_start_us"] = row_first_us
            pdf["duration"] = (sec - row_first_sec).astype("int32")
            yield pdf

    out = d.mapInPandas(run, schema=kernel_schema)
    return out.select(
        *in_cols,
        F.concat_ws("-", F.col(key).cast("string"), F.col("_start_us").cast("string")).alias(
            "session_id"
        ),
        "duration",
    )


def sessionize_gap_only(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreakers: Iterable[str] = ("event_id",),
    gap_seconds: int = GAP_SECONDS,
) -> DataFrame:
    """Pure window-function sessionization with only the inactivity-gap rule.

    This is the canonical single-shuffle, zero-Python formulation — the shape
    Catalyst optimizes end-to-end — and matches the reference whenever no
    session reaches the 1499-event / 12 h caps.
    """
    tiebreakers = list(tiebreakers)
    order_asc = [F.col(ts).asc()] + [F.col(c).asc() for c in tiebreakers]
    w = Window.partitionBy(key).orderBy(*order_asc)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = (
        df.withColumn("_sec", _sec(ts))
        .withColumn("_us", F.unix_micros(F.col(ts)))
        .withColumn("_prev_sec", F.lag("_sec").over(w))
        .withColumn(
            "_is_new",
            F.col("_prev_sec").isNull() | (F.col("_sec") - F.col("_prev_sec") > gap_seconds),
        )
    )
    start = F.max(F.when(F.col("_is_new"), F.struct("_sec", "_us"))).over(run)
    return (
        base.withColumn("session_id", F.concat_ws("-", F.col(key).cast("string"), start["_us"].cast("string")))
        .withColumn("duration", (F.col("_sec") - start["_sec"]).cast("int"))
        .select(*df.columns, "session_id", "duration")
    )


def session_durations(sessionized: DataFrame, key: str = "user_id") -> DataFrame:
    """A1 (``README.md:42-50``): collapse per-event running durations to the
    session's final duration — ``MAX(duration) GROUP BY key, session_id``.

    Partial aggregation (map-side combine) is automatic; the shuffle key
    (key, session_id) is strictly finer than the sessionize shuffle's (key),
    so at scale this coalesces well under AQE.
    """
    return sessionized.groupBy(key, "session_id").agg(F.max("duration").alias("session_duration"))


def user_total_durations(sessionized: DataFrame, key: str = "user_id") -> DataFrame:
    """A2, the flagship: total time-on-site per user (``README.md:42-50``)."""
    return (
        session_durations(sessionized, key)
        .groupBy(key)
        .agg(F.sum("session_duration").alias("total_duration"))
    )


def sessionize_dynamic_gap(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreakers: Iterable[str] = ("event_id",),
    gap_col: str = "gap_seconds",
) -> DataFrame:
    """Gap sessionization with a PER-ROW gap policy: the inactivity
    threshold comes from a column (e.g. joined from a per-tenant/segment
    policy dimension) instead of a global constant — multi-tenant session
    semantics in the same single-shuffle window formulation as
    ``sessionize_gap_only`` (the gap predicate is per-row codegen; nothing
    about the plan changes, which is the point of keeping policy as data).

    A NULL gap (a tenant missing from the policy dimension after a left
    join) fails fast: without the guard, ``sec - prev_sec > NULL`` is NULL,
    the boundary predicate silently holds the session open, and a missing
    policy row becomes silently-wrong sessions instead of an error.
    """
    tiebreakers = list(tiebreakers)
    order_asc = [F.col(ts).asc()] + [F.col(c).asc() for c in tiebreakers]
    w = Window.partitionBy(key).orderBy(*order_asc)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    checked_gap = F.when(F.col(gap_col).isNotNull(), F.col(gap_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"sessionize_dynamic_gap: NULL {gap_col} for key="),
                F.col(key).cast("string"),
                F.lit(" — missing policy row; supply a default before sessionizing"),
            )
        )
    )
    base = (
        df.withColumn("_sec", _sec(ts))
        .withColumn("_us", F.unix_micros(F.col(ts)))
        .withColumn("_prev_sec", F.lag("_sec").over(w))
        .withColumn(
            "_is_new",
            F.col("_prev_sec").isNull()
            | (F.col("_sec") - F.col("_prev_sec") > checked_gap),
        )
    )
    start = F.max(F.when(F.col("_is_new"), F.struct("_sec", "_us"))).over(run)
    return (
        base.withColumn(
            "session_id",
            F.concat_ws("-", F.col(key).cast("string"), start["_us"].cast("string")),
        )
        .withColumn("duration", (F.col("_sec") - start["_sec"]).cast("int"))
        .select(*df.columns, "session_id", "duration")
    )
