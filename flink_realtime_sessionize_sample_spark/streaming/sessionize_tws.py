"""Per-event sessionization on ``transformWithStateInPandas`` — Spark 4's
arbitrary-stateful-processing API (the successor to applyInPandasWithState).

Same decision procedure as ``sessionize_stream`` (SURVEY.md §2.6,
``SessionizeGroupMapFunction.scala:10-117``); what the newer API buys:

* **typed value state** via ``getValueState`` (one ``SessionState`` record
  per key ≙ ``SessionState.scala:3-9``) with NATIVE state TTL
  (``ttlDurationMs`` ≙ the reference's 12 h RocksDB TTL,
  ``SessionizeGroupMapFunction.scala:93-104``) — TTL is enforced by the
  state store itself, no processing-time timers, so bounded
  ``availableNow`` replays terminate even with TTL armed;
* composable state variables and timers for richer operators later.

The processor class is defined inside the builder so cloudpickle ships it
by value — executors never need this package importable.

Dependency gate: the transformWithState Python protocol speaks protobuf to
the JVM state server; environments without the ``protobuf`` package get a
clear ImportError up front (the in-worker failure mode is an opaque
"driver worker crashed") and should use ``sessionize_stream``
(applyInPandasWithState — protobuf-free, same semantics) instead.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
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

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("first_sec", LongType()),
        StructField("last_sec", LongType()),
        StructField("count", IntegerType()),
    ]
)


def sessionize_stream_tws(
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
    """Streaming (or bounded) DataFrame → per-event rows + session_id +
    duration, via a ``StatefulProcessor`` keyed on ``key``."""
    try:
        import google.protobuf  # noqa: F401  (state-server wire protocol)
    except ImportError as e:  # pragma: no cover — env-dependent
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package for "
            "its state-server protocol; install protobuf, or use "
            "sessionize_stream (applyInPandasWithState) which has identical "
            "semantics without the dependency"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    tiebreakers = list(tiebreakers)
    carry = [f for f in df.schema.fields]
    out_schema = StructType(
        list(carry)
        + [StructField("session_id", StringType()), StructField("duration", IntegerType())]
    )
    out_cols = [f.name for f in carry] + ["session_id", "duration"]
    ts_col = ts
    state_schema = _STATE_SCHEMA
    ttl_ms = state_ttl_ms

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("session", state_schema, ttl_ms)

        def handleInputRows(self, key_tuple, rows, timerValues):
            import pandas as pd  # local import: ships by value with the class

            if self._state.exists():
                start_us, first_sec, last_sec, count = self._state.get()
            else:
                start_us = first_sec = last_sec = None
                count = 0
            keyv = key_tuple[0]
            for pdf in rows:
                pdf = pdf.sort_values([ts_col, *tiebreakers], kind="mergesort")
                us_vals = pdf[ts_col].astype("int64")
                if str(pdf[ts_col].dtype).endswith("[ns]"):
                    us_vals = us_vals // 1000
                session_ids, durations = [], []
                for us in us_vals.tolist():
                    sec = us // 1_000_000
                    if (
                        first_sec is None
                        or sec - last_sec > gap_seconds  # gap cut, :35
                        or count + 1 >= max_events + 1  # size cut, :47 (Q3)
                        or sec - first_sec > max_duration_seconds  # 12 h cut, :59
                    ):
                        start_us, first_sec, last_sec, count = us, sec, sec, 1
                        durations.append(0)
                    else:
                        last_sec = max(last_sec, sec)  # monotonic guard, :72-77
                        count += 1
                        durations.append(int(sec - first_sec))
                    session_ids.append(f"{keyv}-{start_us}")
                out = pdf.copy()
                out["session_id"] = session_ids
                out["duration"] = pd.array(durations, dtype="int32")
                yield out[out_cols]
            self._state.update((start_us, first_sec, last_sec, count))

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=Sessionizer(),
        outputStructType=out_schema,
        outputMode=output_mode,
        timeMode="None",
    )
