"""Batch sessionization — the reference's core operator, rebuilt on window functions.

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
The gap rule alone is the classic sum-of-new-session-flags window pattern:
ONE hash shuffle on the session key, then sorted window evaluation, all
JVM-side in whole-stage codegen. The size/duration caps, however, make exact
sessionization inherently sequential *within* a gap-session (each cut moves
the anchor the next cut is measured from). Rather than push every row
through Python, we split:

* **fast path** (pure window functions): gap-sessions whose total size and
  span already satisfy the caps — at realistic web-traffic distributions
  this is ~all of them — get their session id / duration straight from
  running-window expressions. Both window specs (asc + desc) share the same
  ``partitionBy(key)`` so the whole thing costs ONE shuffle and two sorts;
  the two output branches reuse the same shuffle exchange (Spark's
  ReuseExchange), so no extra scan.
* **refinement path** (``applyInPandas``): only the rare gap-sessions that
  exceed 1499 events or 12 h go through an Arrow-batched per-group loop that
  applies the exact cut chain. Input to this branch is a tiny filtered
  subset, so Python cost is negligible and bounded.

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
    """
    tiebreakers = list(tiebreakers)
    order_asc = [F.col(ts).asc()] + [F.col(c).asc() for c in tiebreakers]
    order_desc = [F.col(ts).desc()] + [F.col(c).desc() for c in tiebreakers]
    w = Window.partitionBy(key).orderBy(*order_asc)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run_desc = Window.partitionBy(key).orderBy(*order_desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    base = (
        df.withColumn("_sec", _sec(ts))
        .withColumn("_us", F.unix_micros(F.col(ts)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev_sec", F.lag("_sec").over(w))
        .withColumn(
            "_is_new",
            F.col("_prev_sec").isNull() | (F.col("_sec") - F.col("_prev_sec") > gap_seconds),
        )
    )
    # Running "most recent gap-session start": starts strictly increase in
    # (_rn), so a running MAX over a struct keyed by _rn picks the nearest
    # preceding start — no second shuffle on a (key, session) composite.
    start = F.max(F.when(F.col("_is_new"), F.struct("_rn", "_sec", "_us"))).over(run)
    base = (
        base.withColumn("_start_rn", start["_rn"])
        .withColumn("_start_sec", start["_sec"])
        .withColumn("_start_us", start["_us"])
        .withColumn("_is_end", F.lead("_is_new", 1, True).over(w))
    )
    # Nearest following gap-session end, via the DESC running window (same
    # hash(key) distribution → same single shuffle, second sort only).
    end = F.min(F.when(F.col("_is_end"), F.struct("_rn", "_sec"))).over(run_desc)
    base = base.withColumn("_end_rn", end["_rn"]).withColumn("_end_sec", end["_sec"])

    needs_refine = (F.col("_end_rn") - F.col("_start_rn") + 1 > max_events) | (
        F.col("_end_sec") - F.col("_start_sec") > max_duration_seconds
    )

    out_cols = [c for c in df.columns] + ["session_id", "duration"]

    fast = (
        base.filter(~needs_refine)
        .withColumn("session_id", F.concat_ws("-", F.col(key).cast("string"), F.col("_start_us").cast("string")))
        .withColumn("duration", (F.col("_sec") - F.col("_start_sec")).cast("int"))
        .select(*out_cols)
    )

    slow_in = base.filter(needs_refine).select(*df.columns, "_sec", "_us", "_start_rn")
    schema = fast.schema

    key_col, ts_col = key, ts
    tb = tiebreakers

    def _refine(pdf: pd.DataFrame) -> pd.DataFrame:
        # Exact cut chain within one gap-session (gap cuts cannot fire here:
        # every consecutive gap ≤ gap_seconds by construction). Mirrors
        # SessionizeGroupMapFunction.scala:35-83 in sorted event-time order.
        pdf = pdf.sort_values([ts_col, *tb], kind="mergesort").reset_index(drop=True)
        secs = pdf["_sec"].to_numpy()
        uss = pdf["_us"].to_numpy()
        n = len(pdf)
        session_us = [0] * n
        durations = [0] * n
        first_sec = secs[0]
        first_us = uss[0]
        count = 0
        for i in range(n):
            count += 1
            if i > 0 and (count > max_events or secs[i] - first_sec > max_duration_seconds):
                first_sec = secs[i]
                first_us = uss[i]
                count = 1
            session_us[i] = first_us
            durations[i] = int(secs[i] - first_sec)
        keyv = pdf[key_col].iloc[0]
        pdf = pdf.assign(
            session_id=[f"{keyv}-{u}" for u in session_us],
            duration=pd.array(durations, dtype="int32"),
        )
        return pdf[[c for c in schema.names]]

    slow = slow_in.groupBy(key, "_start_rn").applyInPandas(_refine, schema=schema)

    return fast.unionByName(slow)


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
