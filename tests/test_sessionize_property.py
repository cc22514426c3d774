"""Property-based sessionization tests (SURVEY.md §5): the window-function
formulation must equal a direct Python transcription of the reference's
decision procedure (SessionizeGroupMapFunction.scala:19-84, intended-unit
semantics) on arbitrary event sequences — including exact boundary hits
(gap == 1800 s, duration == 43200 s) and duplicate timestamps."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_realtime_sessionize_sample_spark.operators.sessionize import (
    GAP_SECONDS,
    MAX_SESSION_DURATION_SECONDS,
    MAX_SESSION_EVENTS,
    sessionize,
)

BASE_US = 1_500_000_000_000_000  # 2017-07-14, arbitrary


def reference_sessionize(events):
    """Pure-Python transcription of §2.6 over (key, ts_us, event_id) rows,
    processed per key in (ts, event_id) order."""
    out = {}
    by_key: dict = {}
    for key, us, eid in sorted(events, key=lambda r: (r[0], r[1], r[2])):
        sec = us // 1_000_000
        st_ = by_key.get(key)
        if (
            st_ is None
            or sec - st_["last"] > GAP_SECONDS
            or st_["count"] + 1 >= MAX_SESSION_EVENTS + 1
            or sec - st_["first"] > MAX_SESSION_DURATION_SECONDS
        ):
            st_ = {"start_us": us, "first": sec, "last": sec, "count": 1}
            by_key[key] = st_
            out[eid] = (f"{key}-{us}", 0)
        else:
            st_["last"] = max(st_["last"], sec)
            st_["count"] += 1
            out[eid] = (f"{key}-{st_['start_us']}", int(sec - st_["first"]))
    return out


# Deltas engineered to hit the cut boundaries exactly: 1800 s (no cut,
# strict >), 1801 s (cut), 0 (duplicate instant), 43200/43201 via sums.
_DELTAS = st.sampled_from(
    [0, 1, 37, 1_799_999_999, 1_800_000_000, 1_800_000_001, 7_200_000_000, 21_600_000_000]
)


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    eid = 0
    for _ in range(draw(st.integers(1, 3))):  # keys
        key = draw(st.integers(1, 5))
        t = BASE_US + draw(st.integers(0, 10**9))
        for _ in range(n):
            t += draw(_DELTAS)
            rows.append((key, t, eid))
            eid += 1
    return rows


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_sets())
def test_window_formulation_matches_reference_procedure(spark, events):
    df = spark.createDataFrame(
        [
            (k, dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us), e)
            for k, us, e in events
        ],
        "user_id long, ts timestamp, event_id long",
    )
    got = {
        r["event_id"]: (r["session_id"], r["duration"])
        for r in sessionize(df).collect()
    }
    ref = reference_sessionize(events)
    assert got == ref
