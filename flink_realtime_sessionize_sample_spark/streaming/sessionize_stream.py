"""Streaming per-event sessionization — the reference's X1 operator on
Structured Streaming.

Reference: ``SessionizeGroupMapFunction.scala:10-117`` — a ``RichMapFunction``
over TTL'd keyed ``MapState`` that emits EVERY event immediately, enriched
with its session id and running duration (per-event emission is the
reference's explicit design goal; it rejects window-close emission,
``README.md:69-76``).

Spark mapping: ``applyInPandasWithState`` in **update** output mode, one
state object per key — Spark's grouping replaces Flink's explicit
``MapState[ip, SessionState]`` (the coarse ``hashCode % 1200`` pre-key,
``Sessionize.scala:5``, is Flink skew plumbing that hash partitioning already
does — SURVEY §2.5). State record ≙ ``SessionState.scala:3-9``:
``(start_us, first_sec, last_sec, count)``. The 12 h state TTL
(``SessionizeGroupMapFunction.scala:93-104``) maps to a processing-time
timeout that clears idle state.

Ordering semantics (SURVEY §2.4): the reference's watermark is inert for a
map-only pipeline — it sessionizes in ARRIVAL order with a monotonic-max
guard on ``lastTimestamp`` (``:72-77``), and its own docs reconcile the
resulting duration dips downstream with MAX(duration). We keep exactly that:
arrival order across micro-batches, deterministic (ts, tiebreaker) order
within a batch, same monotonic-max guard. On in-order input this equals the
batch formulation event-for-event; on late data it matches after the
MAX-collapse, which is the reference's own contract.

Scale: state is one fixed-size tuple per active key, partitioned by the
shuffle; RocksDB state store + changelog checkpointing handle 100 M+ keys
per the standard Structured Streaming deployment recipe (see session conf in
``rocksdb_state_conf``).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_realtime_sessionize_sample_spark.operators.sessionize import (
    GAP_SECONDS,
    MAX_SESSION_DURATION_SECONDS,
    MAX_SESSION_EVENTS,
)

# SessionState.scala:3-9 (epoch-seconds fields, like the reference stores).
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("first_sec", LongType()),
        StructField("last_sec", LongType()),
        StructField("count", IntegerType()),
    ]
)

STATE_TTL_MS = MAX_SESSION_DURATION_SECONDS * 1000  # 12 h, :93-104


def _output_schema(key_field, carry_fields: list) -> StructType:
    return StructType(
        list(carry_fields)
        + [StructField("session_id", StringType()), StructField("duration", IntegerType())]
    )


def sessionize_stream(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreakers: Iterable[str] = ("event_id",),
    gap_seconds: int = GAP_SECONDS,
    max_events: int = MAX_SESSION_EVENTS,
    max_duration_seconds: int = MAX_SESSION_DURATION_SECONDS,
    output_mode: str = "append",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame → per-event (all columns + session_id + duration).

    Each input row is emitted exactly once (a stateful flatMap, not a
    windowed aggregate), so **append** mode is the natural fit and enables
    file sinks; update mode works identically for console/memory/Kafka.
    Works on bounded batch DataFrames too (Spark runs the same operator),
    which the equivalence tests exploit.

    ``state_ttl_ms`` arms the reference's 12 h idle-state TTL
    (``SessionizeGroupMapFunction.scala:93-104``) via a processing-time
    timeout — pass ``STATE_TTL_MS`` for long-running deployments. Leave
    ``None`` for bounded replays: with processing-time timers armed, an
    ``availableNow`` run never terminates (Spark keeps scheduling
    state-cleanup micro-batches until the timers fire, i.e. for 12 hours).
    """
    tiebreakers = list(tiebreakers)
    carry = [f for f in df.schema.fields]
    out_schema = _output_schema(key, carry)
    out_cols = [f.name for f in carry] + ["session_id", "duration"]
    key_col, ts_col = key, ts

    def fn(
        key_tuple: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # 12 h idle → drop state (TTL cleanup, NeverReturnExpired ≙ we
            # simply never see expired state again).
            state.remove()
            return
        if state.exists:
            start_us, first_sec, last_sec, count = state.get
        else:
            start_us = first_sec = last_sec = None
            count = 0
        keyv = key_tuple[0]
        outs = []
        for pdf in pdfs:
            # Deterministic intra-batch order; across batches arrival order
            # stands, like the reference's per-record processing.
            pdf = pdf.sort_values([ts_col, *tiebreakers], kind="mergesort")
            ts_vals = pdf[ts_col]
            us_vals = ts_vals.astype("int64")  # pandas datetime64[us/ns] → int
            if str(ts_vals.dtype).endswith("[ns]"):
                us_vals = us_vals // 1000
            sec_list = (us_vals // 1_000_000).tolist()
            us_list = us_vals.tolist()
            session_ids = []
            durations = []
            for sec, us in zip(sec_list, us_list):
                if first_sec is None:
                    # SessionizeGroupMapFunction.scala:19-29 — first event
                    start_us, first_sec, last_sec, count = us, sec, sec, 1
                    durations.append(0)
                elif sec - last_sec > gap_seconds:
                    # :31-45 timeout cut (intended-unit semantics, quirk Q1)
                    start_us, first_sec, last_sec, count = us, sec, sec, 1
                    durations.append(0)
                elif count + 1 >= max_events + 1:
                    # :47-57 max-size cut (1499-event cap, quirk Q3)
                    start_us, first_sec, last_sec, count = us, sec, sec, 1
                    durations.append(0)
                elif sec - first_sec > max_duration_seconds:
                    # :59-68 max-duration cut (strict >)
                    start_us, first_sec, last_sec, count = us, sec, sec, 1
                    durations.append(0)
                else:
                    # :69-84 continuation; monotonic-max guard :72-77
                    last_sec = max(last_sec, sec)
                    count += 1
                    durations.append(int(sec - first_sec))
                session_ids.append(f"{keyv}-{start_us}")
            out = pdf.copy()
            out["session_id"] = session_ids
            out["duration"] = pd.array(durations, dtype="int32")
            outs.append(out[out_cols])
        state.update((start_us, first_sec, last_sec, count))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        for out in outs:
            yield out

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def rocksdb_state_conf() -> dict[str, str]:
    """Session confs for large-state deployments (RocksDB state store with
    changelog checkpointing) — the Spark analog of the reference's RocksDB
    backend + incremental checkpoints (README.md:92-100)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }
