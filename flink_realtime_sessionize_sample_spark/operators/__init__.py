"""Operators: sessionization (core), dedup, similarity, text analysis, multimodal."""

from flink_realtime_sessionize_sample_spark.operators.sessionize import (
    GAP_SECONDS,
    MAX_SESSION_EVENTS,
    MAX_SESSION_DURATION_SECONDS,
    sessionize,
    sessionize_gap_only,
    session_durations,
    user_total_durations,
)

__all__ = [
    "GAP_SECONDS",
    "MAX_SESSION_EVENTS",
    "MAX_SESSION_DURATION_SECONDS",
    "sessionize",
    "sessionize_gap_only",
    "session_durations",
    "user_total_durations",
]
