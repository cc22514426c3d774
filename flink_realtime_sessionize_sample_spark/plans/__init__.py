"""Query plans: the driver-facing registry of (PySpark query, DuckDB oracle SQL) pairs.

Importing this package imports every query module, which registers its
queries as a side effect of the ``@query`` decorators.
"""

from flink_realtime_sessionize_sample_spark.plans.registry import QUERIES, ORACLES, query

# Registration imports (order = SURVEY.md §7 build phases).
from flink_realtime_sessionize_sample_spark.plans import sessionize_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import relational_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import llm_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import coverage_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import temporal_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import pipeline_queries  # noqa: F401
from flink_realtime_sessionize_sample_spark.plans import analytics_queries  # noqa: F401

# The external correctness harness snapshots exactly the first 50 entries of
# this registry (``list(queries())[:50]``). Through round 2 the registry was
# in build-phase order, which pinned the same 50 queries into that window
# every round and left the 43 registered after them without an external
# correctness row. ``_DRIVER_WINDOW`` re-prioritizes the iteration order:
# a few long-green anchor queries for cross-round continuity, then every
# query that has not yet had an external row, then (implicitly) everything
# already verified in earlier rounds. Registration itself is unchanged —
# this only reorders the dict, so names/oracles/semantics are untouched.
# ROUND-4 ROTATION NOTE: after round 3's external check, cumulative
# driver-green should be 97/137 (rounds 1-2's 50 + this window's 47 new).
# The 40 queries registered later in round 3 (sessionize family's
# session_event_features / session_window_stream_durations, the
# analytics_queries module, waiting_suppliers_q21, heavy_hitters_bigrams,
# doc_bigram_logprob, dedup_containment, embedding_covariance,
# ann_pq_adc_topk, ann_ivf_pq_topk, array_set_funcs, data_quality_report,
# sessionize_dynamic_gap, ...) have sf0.01 AND sf0.1 local parity
# but no external row yet — rotate them into this window at the start of
# round 4, keeping the same 3 anchors.
_DRIVER_WINDOW: list[str] = [
    # Anchors — kept in-window every round for continuity.
    "sessionize_events",
    "user_total_durations",
    "parse_access_logs",
    # Round-3 additions (new operators, verified on first registration).
    "sessionize_bucketed",
    "doc_unigram_entropy",
    "embedding_knn_join",
    "doc_tfidf_topk",
    # Backlog: registered in rounds 1-2 but never externally checked
    # (positions 51-93 of the old ordering).
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


def _apply_driver_window() -> None:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW if n in QUERIES}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_window()

__all__ = ["QUERIES", "ORACLES", "query"]
