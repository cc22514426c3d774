"""Invariants on the query-registry iteration order.

The external correctness harness snapshots exactly the first 50 entries of
``queries()``. These tests pin the round-3 re-prioritization: every query
that had no external correctness row through round 2 must sit inside that
window, alongside the continuity anchors.
"""

from __future__ import annotations

from flink_realtime_sessionize_sample_spark import plans

# Queries with no external correctness row through round 2 (old registry
# positions 51-93). Each must occupy the harness's first-50 window until it
# has been externally verified.
ROUND2_BACKLOG = [
    "ann_ivf_trained_topk",
    "doc_repetition_signals",
    "doc_boilerplate_overlap",
    "doc_unigram_logprob",
    "embedding_mean_pool",
    "multimodal_decode",
    "multimodal_decode_real",
    "multimodal_byte_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "dedup_cluster_canonical",
    "quality_filter_pipeline",
    "corpus_selection_pipeline",
    "scan_json_lines",
    "scan_csv_lines",
    "debug_ts_shift",
    "grouping_sets_revenue",
    "orders_with_heavy_items_semi",
    "price_percentiles",
    "salted_user_event_totals",
    "rolling_30d_customer_spend",
    "pivot_event_type_counts",
    "unpivot_user_value_stats",
    "small_quantity_revenue",
    "latest_event_per_user",
    "time_bucket_rollup",
    "gap_fill_hourly",
    "ranking_family",
    "disjunctive_brand_revenue",
    "bilateral_shipping_volume",
    "embedding_array_stats",
    "salted_skew_join",
    "asof_clicks_views",
    "range_join_error_windows",
    "sample_stratified_docs",
    "doc_chunk_tokens",
    "pii_redact",
    "doc_top_token_ratio",
    "token_frequency_topk",
    "contamination_ngram_overlap",
    "train_val_test_split",
    "sample_k_per_group",
    "pack_sequences",
]

ANCHORS = ["sessionize_events", "user_total_durations", "parse_access_logs"]


def test_backlog_inside_driver_window():
    window = set(list(plans.QUERIES)[:50])
    missing = [n for n in ROUND2_BACKLOG if n not in window]
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
