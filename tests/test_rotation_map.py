"""Pin ``tools/rotation_map.py`` against hand-known ground truth.

The rotation map mechanizes the standing changed-code-re-rotates rule
(``plans/__init__`` docstring): given the files changed in a round, it
computes which registered queries must re-enter the first-50 driver
window. A FALSE NEGATIVE there is the unsafe direction — a query whose
implementation changed silently keeps its stale green row — so the tool
must never be trusted without tests that superset-check its consumer map
against independently hand-derived consumer sets (judge r8 / ADVICE r8:
the ``\\x01`` module-alias-attribute refs were silently dropped, and
exactly this kind of test would have caught it).

Ground truth below is derived by grep + reading the call sites, NOT by
running the tool — keep it that way when extending.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from rotation_map import build_consumer_map  # noqa: E402

PKG = "flink_realtime_sessionize_sample_spark"


@pytest.fixture(scope="module")
def cmap() -> dict[str, list[str]]:
    return build_consumer_map()


def _consumers(cmap: dict[str, list[str]], relpath: str) -> set[str]:
    return set(cmap.get(f"{PKG}/{relpath}", []))


# Queries that call with_global_rank / with_global_prefix_max /
# ntile_from_rank directly (grep over plans/, each call site mapped to
# its enclosing registered query). Hand-derived from call sites — the
# global-order rotation set whenever operators/global_order.py changes.
GLOBAL_ORDER_CONSUMERS = {
    # analytics_queries
    "customer_rfm_segments",
    "customer_pareto_abc",
    "doc_zipf_fit",
    "pareto_skyline_parts",
    "ks_drift_detection",
    "psi_value_drift",
    # ml_eval_queries
    "roc_auc_token_count",
    "conformal_interval_coverage",
    "expected_calibration_error",
    "calibration_reliability_brier",
    "spearman_chars_tokens",
    # llm_queries / pipeline_queries / feature_queries
    "ccnet_perplexity_buckets",
    "token_budget_waterfill",
    "token_gini_concentration",
    "vocab_coverage_curve",
    "equi_depth_histogram",
    "late_data_accounting",
    # staging_r8 (round-8 promotions using the operator)
    "mann_whitney_en_tokens",
    "hill_tail_doc_length",
    "curriculum_pacing_stages",
    "theil_sen_daily_trend",
    "quantile_normalize_lengths",
    "wasserstein_split_drift",
    "brown_forsythe_length_variance",
}

# The four registered streaming-replay twins — the only genuine
# replay_split_stream callers (grep: staging_r8 ×2, llm_queries ×1,
# ml_eval_queries ×1).
REPLAY_CONSUMERS = {
    "stream_naive_bayes_score",
    "stream_gopher_filter",
    "stream_ab_guardrail_welch",
    "stream_cusum_hourly_monitor",
}

# Module-alias attribute users of functions/text.py helpers — the exact
# false negatives ADVICE r8 found dropped (T.h48_duck / T.h48_spark via
# ``from ..functions import text as T``-style aliasing).
TEXT_ALIAS_CONSUMERS = {
    "ab_power_mde",
    "welch_t_chars_ab",
}


def test_global_order_consumers_superset(cmap):
    got = _consumers(cmap, "operators/global_order.py")
    missing = GLOBAL_ORDER_CONSUMERS - got
    assert not missing, (
        f"rotation map misses known with_global_rank consumers "
        f"(FALSE NEGATIVE — stale-row risk): {sorted(missing)}"
    )


def test_replay_consumers_superset(cmap):
    got = _consumers(cmap, "streaming/replay.py")
    missing = REPLAY_CONSUMERS - got
    assert not missing, (
        f"rotation map misses known replay_split_stream consumers: "
        f"{sorted(missing)}"
    )


def test_text_module_alias_consumers_superset(cmap):
    # Regression for the \x01 attribute-ref drop (ADVICE r8, high).
    got = _consumers(cmap, "functions/text.py")
    missing = TEXT_ALIAS_CONSUMERS - got
    assert not missing, (
        f"module-alias attribute deps dropped again (\\x01 regression): "
        f"{sorted(missing)}"
    )


def test_every_query_consumes_its_defining_module(cmap):
    # Minimal self-consistency: a query must rotate when the file that
    # defines it changes.
    from flink_realtime_sessionize_sample_spark import plans

    for qname, fn in plans.QUERIES.items():
        relmod = fn.__module__.replace(".", "/") + ".py"
        assert qname in set(cmap.get(relmod, [])), (
            f"{qname} not listed as a consumer of its own module {relmod}"
        )


def test_registry_change_rotates_everything(cmap):
    # The @query decorator lives in plans/registry.py: every registered
    # query depends on it, so a registry change rotates the full set.
    from flink_realtime_sessionize_sample_spark import plans

    got = _consumers(cmap, "plans/registry.py")
    assert got == set(plans.QUERIES)


# --- changed_symbols (the symbol-granular --since diff) --------------------

from rotation_map import changed_symbols  # noqa: E402


def test_comment_only_edit_rotates_nothing():
    old = "X = 1\n\ndef f():\n    return X\n"
    new = "# a new comment\nX = 1\n\ndef f():\n    # inline comment\n    return X\n"
    syms, whole = changed_symbols(old, new, "m.py")
    assert syms == set() and not whole


def test_docstring_edit_rotates_only_its_symbol():
    old = 'def f():\n    """a"""\n    return 1\n\ndef g():\n    return 2\n'
    new = 'def f():\n    """b"""\n    return 1\n\ndef g():\n    return 2\n'
    syms, whole = changed_symbols(old, new, "m.py")
    assert syms == {"f"} and not whole


def test_body_edit_rotates_only_its_symbol():
    old = "def f():\n    return 1\n\ndef g():\n    return 2\n"
    new = "def f():\n    return 1\n\ndef g():\n    return 3\n"
    syms, whole = changed_symbols(old, new, "m.py")
    assert syms == {"g"} and not whole


def test_import_edit_falls_back_to_whole_module():
    old = "import os\n\ndef f():\n    return os.sep\n"
    new = "import posixpath as os\n\ndef f():\n    return os.sep\n"
    syms, whole = changed_symbols(old, new, "m.py")
    assert whole


def test_new_file_is_whole_module():
    syms, whole = changed_symbols(None, "def f():\n    return 1\n", "m.py")
    assert whole


def test_module_constant_edit_rotates_the_constant():
    old = "K = 1\n\ndef f(K=2):\n    return K\n"
    new = "K = 2\n\ndef f(K=2):\n    return K\n"
    syms, whole = changed_symbols(old, new, "m.py")
    assert syms == {"K"} and not whole
