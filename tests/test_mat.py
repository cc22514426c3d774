"""The r15 materialize() helpers must be SEMANTICS-NEUTRAL: a
localCheckpoint pins physical reuse but may never change any row. Pinned
here on the operator family whose internals lean on it hardest (the exact
PPJoin pipeline with its aggregated positional/suffix bounds and the
barrier-verified intersect) plus the iterative BPE trainer, by running
each twice — checkpoints on vs SPARK_GRAFT_NO_MAT=1 — and requiring
identical rows. This is also what licenses the plan-lint/shape tests to
assert over the NO_MAT plan (tests/test_plan_lint.py)."""

from __future__ import annotations

from flink_realtime_sessionize_sample_spark.operators import dedup as D
from flink_realtime_sessionize_sample_spark.plans.llm_queries import bpe_train_frame


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox leaps over the lazy dog again and again"),
        (4, "completely different text about spark physical plan reuse"),
        (5, "another unrelated document mentioning spark and reuse once"),
        (6, "the lazy dog again and again sleeps while the fox jumps"),
    ]
    return spark.createDataFrame(data, ["doc_id", "text"])


def test_ngram_pairs_identical_with_and_without_checkpoints(spark, monkeypatch):
    docs = _docs(spark)
    with_mat = _rows(D.ngram_jaccard_pairs(docs, threshold=0.5))
    monkeypatch.setenv("SPARK_GRAFT_NO_MAT", "1")
    without = _rows(D.ngram_jaccard_pairs(docs, threshold=0.5))
    assert with_mat == without
    assert with_mat, "fixture must produce at least one verified pair"


def test_containment_pairs_identical_with_and_without_checkpoints(spark, monkeypatch):
    docs = _docs(spark)
    with_mat = _rows(D.containment_pairs(docs, threshold=0.8))
    monkeypatch.setenv("SPARK_GRAFT_NO_MAT", "1")
    without = _rows(D.containment_pairs(docs, threshold=0.8))
    assert with_mat == without


def test_bpe_train_identical_with_and_without_checkpoints(spark, monkeypatch):
    docs = _docs(spark)
    with_mat = _rows(bpe_train_frame(docs, n_merges=3, top_words=20))
    monkeypatch.setenv("SPARK_GRAFT_NO_MAT", "1")
    without = _rows(bpe_train_frame(docs, n_merges=3, top_words=20))
    assert with_mat == without
    assert len(with_mat) == 3


def test_connected_components_identical_with_and_without_checkpoints(
    spark, monkeypatch
):
    # r16: connected_components' raw pair frame and initial edge set are
    # routed through materialize() so the registry plan lint can see the
    # full upstream lineage under SPARK_GRAFT_NO_MAT (the per-round star
    # contraction stays truncated via materialize_loop — exponential
    # lineage growth, see mat.py). This pins that the routing is
    # semantics-neutral end to end (the loop's convergence fingerprint
    # runs at build time under both modes).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (9, 8), (3, 4)],
        ["doc_a", "doc_b"],
    )
    with_mat = _rows(D.connected_components(edges))
    monkeypatch.setenv("SPARK_GRAFT_NO_MAT", "1")
    without = _rows(D.connected_components(edges))
    assert with_mat == without
    labels = {n: l for n, l in with_mat}
    assert labels[4] == 1 and labels[6] == 5 and labels[8] == 8
