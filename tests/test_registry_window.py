"""Invariants on the query-registry iteration order.

The external correctness harness snapshots exactly the first 50 entries of
``queries()``. These tests pin the round-5 rotation: every query that has
no external correctness row through round 4 must sit inside that window,
alongside the continuity anchors and the one round-4 red row
(``array_set_funcs``, driver-comparator limitation fixed this round).
"""

from __future__ import annotations

from flink_realtime_sessionize_sample_spark import plans

# Queries with no external correctness row through round 4 (registered
# late in round 4 behind the full window). Each must occupy the harness's
# first-50 window until it has been externally verified. Rounds 1-4
# verified the other 143 (save array_set_funcs, re-checked below).
ROUND4_BACKLOG = [
    "line_dedup_c4",
    "bootstrap_mean_ci",
    "last_touch_attribution",
    "zorder_cluster_stats",
    "ks_drift_detection",
    "benford_digit_audit",
    "user_value_ewma",
    "pagerank_neardup_3iter",
    "source_unigram_kl",
    "item_cooccurrence_topk",
    "pareto_skyline_parts",
    "psi_value_drift",
    "pipeline_json_sink_roundtrip",
    "stream_stream_interval_join",
    "label_centroid_similarity",
    "session_markov_transitions",
    "negative_sampling_contrastive",
    "doc_chunk_overlap_rag",
    "ab_test_two_proportions",
    "event_outliers_mad",
]

ANCHORS = ["sessionize_events", "user_total_durations", "parse_access_logs"]

# Round 4's only external `err` — arrays rendered to canonical strings in
# both engines this round; must be re-checked in the window.
RECHECK = ["array_set_funcs"]


def test_backlog_inside_driver_window():
    window = set(list(plans.QUERIES)[:50])
    missing = [n for n in ROUND4_BACKLOG + RECHECK if n not in window]
    assert not missing, f"backlog queries outside the first-50 window: {missing}"


def test_anchors_inside_driver_window():
    window = set(list(plans.QUERIES)[:50])
    assert all(a in window for a in ANCHORS)


def test_round5_registrations_inside_driver_window():
    # No new backlog: every query registered in round 5 (anything not
    # externally green through round 4) must be inside the first-50 window.
    externally_green_r1_r4 = set(plans._EXTERNALLY_GREEN_THROUGH_R4)
    window = set(list(plans.QUERIES)[:50])
    out = [
        n
        for n in plans.QUERIES
        if n not in externally_green_r1_r4 and n not in window
    ]
    assert not out, f"unverified queries outside the first-50 window: {out}"


def test_window_names_all_registered():
    unknown = [n for n in plans._DRIVER_WINDOW if n not in plans.QUERIES]
    assert not unknown, f"_DRIVER_WINDOW names with no registered query: {unknown}"


def test_no_duplicate_registrations():
    names = list(plans.QUERIES)
    assert len(names) == len(set(names))


def test_every_query_callable_and_oracle_paired():
    # Every oracle key must correspond to a registered query.
    orphan = [n for n in plans.ORACLES if n not in plans.QUERIES]
    assert not orphan
