"""Invariants on the query-registry iteration order.

The external correctness harness snapshots exactly the first 50 entries of
``queries()``. These tests pin the round-4 rotation: every query that has
no external correctness row through round 3 must sit inside that window,
alongside the continuity anchors.
"""

from __future__ import annotations

from flink_realtime_sessionize_sample_spark import plans

# Queries with no external correctness row through round 3 (old registry
# positions 98-137). Each must occupy the harness's first-50 window until
# it has been externally verified. Rounds 1-3 verified the other 97.
ROUND3_BACKLOG = [
    "session_event_features",
    "session_window_stream_durations",
    "sessionize_dynamic_gap",
    "session_funnel_conversion",
    "profit_by_nation_year",
    "waiting_suppliers_q21",
    "array_set_funcs",
    "setop_intersect_all",
    "setop_except_all",
    "tokenizer_bpe_pair_counts",
    "doc_winnowing_fingerprint",
    "embedding_quantize_int8",
    "doc_bigram_logprob",
    "dedup_containment",
    "embedding_covariance",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "near_dup_triangles",
    "funnel_stage_conversion",
    "retention_cohorts",
    "order_value_histogram",
    "scd2_customer_orders",
    "bm25_doc_search",
    "domain_mixture_sample",
    "sample_weighted_docs",
    "snapshot_diff_cdc",
    "heavy_hitters_bigrams",
    "anomaly_rolling_zscore",
    "value_winsorized",
    "event_sequence_trigrams",
    "data_quality_report",
    "orders_trend_decomposition",
    "token_pmi_cooccurrence",
    "customer_rfm_segments",
    "customer_pareto_abc",
    "event_gap_percentiles",
    "doc_zipf_fit",
    "basket_part_associations",
    "table_fingerprint",
    "heavy_hitters_stream_events",
]

ANCHORS = ["sessionize_events", "user_total_durations", "parse_access_logs"]


def test_backlog_inside_driver_window():
    window = set(list(plans.QUERIES)[:50])
    missing = [n for n in ROUND3_BACKLOG if n not in window]
    assert not missing, f"backlog queries outside the first-50 window: {missing}"


def test_anchors_inside_driver_window():
    window = set(list(plans.QUERIES)[:50])
    assert all(a in window for a in ANCHORS)


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
