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


def _inner_schema(carry_fields: list) -> StructType:
    # The Python kernel emits the NUMERIC session start (micros); the
    # session_id string is concatenated JVM-side (codegen) — per-row string
    # formatting in pandas measured ~10% of kernel time in the batch twin.
    return StructType(
        list(carry_fields)
        + [
            StructField("session_start_us", LongType()),
            StructField("duration", IntegerType()),
        ]
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
    inner_schema = _inner_schema(carry)
    out_cols = [f.name for f in carry] + ["session_start_us", "duration"]
    key_col, ts_col = key, ts

    def fn(
        key_tuple: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            # 12 h idle → drop state (TTL cleanup, NeverReturnExpired ≙ we
            # simply never see expired state again).
            state.remove()
            return
        st = state.get if state.exists else None  # (start_us, first, last, count)

        def pack_fresh(sec, us):
            """Vectorized cut chain assuming row 0 OPENS a session
            (SessionizeGroupMapFunction.scala:19-29): gap segmentation by
            shifted compare (:31-45), cap-clean segments assigned with
            np.repeat, only cap-tripping segments loop (:47-68). Returns
            per-row (session start us, duration) + closing state."""
            n = len(sec)
            is_new = np.empty(n, dtype=bool)
            is_new[0] = True
            is_new[1:] = (sec[1:] - sec[:-1]) > gap_seconds
            bounds = np.append(np.flatnonzero(is_new), n)
            seg_i0, seg_i1 = bounds[:-1], bounds[1:]
            seg_len = seg_i1 - seg_i0
            seg_fs = sec[seg_i0].copy()
            seg_fu = us[seg_i0].copy()
            ok = (seg_len <= max_events) & (
                sec[seg_i1 - 1] - seg_fs <= max_duration_seconds
            )
            row_fs = np.repeat(seg_fs, seg_len)
            row_fu = np.repeat(seg_fu, seg_len)
            fin = (int(seg_fu[-1]), int(seg_fs[-1]), int(sec[-1]), int(seg_len[-1]))
            for si in np.flatnonzero(~ok):
                fs, fu, cnt = int(seg_fs[si]), int(seg_fu[si]), 0
                for i in range(seg_i0[si], seg_i1[si]):
                    cnt += 1
                    if cnt > max_events or sec[i] - fs > max_duration_seconds:
                        fs, fu, cnt = int(sec[i]), int(us[i]), 1
                    row_fs[i] = fs
                    row_fu[i] = fu
                if si == len(seg_len) - 1:
                    fin = (fu, fs, int(sec[-1]), cnt)
            return row_fu, sec - row_fs, fin

        for pdf in pdfs:
            # Deterministic intra-batch order; across batches arrival order
            # stands, like the reference's per-record processing.
            pdf = pdf.sort_values([ts_col, *tiebreakers], kind="mergesort")
            n = len(pdf)
            if n == 0:
                continue
            us = pdf[ts_col].astype("int64").to_numpy()
            if str(pdf[ts_col].dtype).endswith("[ns]"):
                us = us // 1000
            sec = us // 1_000_000

            row_fu = np.empty(n, dtype=np.int64)
            row_dur = np.empty(n, dtype=np.int64)
            j0 = 0
            if st is not None:
                # Carried-session prefix: until the FIRST cut, every row
                # continues the stored session, so the three cut predicates
                # are closed-form in i — gap vs the monotonic-max guarded
                # last (:72-77; prev_eff = max(carry_last, sec[i-1]), which
                # a fresh-start formulation must NOT use past the cut),
                # size vs carried count (:47), duration vs carried first
                # (:59). First hit = j0; the rest of the batch is fresh.
                start_us_c, first_c, last_c, cnt_c = st
                prev_eff = np.maximum(last_c, np.concatenate(([last_c], sec[:-1])))
                cut = (
                    (sec - prev_eff > gap_seconds)
                    | (cnt_c + np.arange(n) >= max_events)
                    | (sec - first_c > max_duration_seconds)
                )
                j0 = int(np.argmax(cut)) if cut.any() else n
                row_fu[:j0] = start_us_c
                row_dur[:j0] = sec[:j0] - first_c
                if j0 == n:
                    st = (
                        start_us_c,
                        first_c,
                        max(int(last_c), int(sec[-1])),
                        cnt_c + n,
                    )
            if j0 < n:
                fu_t, dur_t, st = pack_fresh(sec[j0:], us[j0:])
                row_fu[j0:] = fu_t
                row_dur[j0:] = dur_t

            # sort_values already returned a private copy — assign in place
            # (a further pdf.copy() here measured as pure waste).
            pdf["session_start_us"] = row_fu
            pdf["duration"] = pd.array(row_dur, dtype="int32")
            yield pdf[out_cols]

        if st is not None:
            state.update(tuple(st))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)

    inner = df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=inner_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    # "{key}-{session_start_us}" ≙ SessionizeGroupMapFunction.scala:107's
    # "{ip}-{first timestamp}" id format — built in codegen, not pandas.
    from pyspark.sql import functions as F

    return inner.select(
        *[f.name for f in carry],
        F.concat_ws("-", F.col(key_col).cast("string"),
                    F.col("session_start_us").cast("string")).alias("session_id"),
        "duration",
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
