"""Incremental corpus-vs-index dedup: verdict fixtures + the two scale
contracts (probe never rescans corpus text; the persisted index side of the
probe join is pre-bucketed, so only the increment shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.operators.incremental import (
    build_dedup_index,
    incremental_dedup,
)
from flink_realtime_sessionize_sample_spark.sources.registry import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _final_plan(df) -> str:
    # AQE's toString prints the Final Plan followed by the Initial Plan;
    # counting exchanges over both double-counts every node.
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog while the sun sets slowly behind distant hills tonight"),
    (2, "completely different corpus content about databases indexes and shuffles in distributed engines"),
]
INCREMENT = [
    # exact copy of corpus doc 1 (normalization: case/trim-insensitive)
    (11, "  The quick brown fox jumps over the lazy dog while the sun sets slowly behind distant hills tonight "),
    # near-dup of corpus doc 1: one appended token, shingle jaccard ~0.95
    (12, "the quick brown fox jumps over the lazy dog while the sun sets slowly behind distant hills tonight again"),
    # novel
    (13, "entirely novel text sharing no phrases with anything stored before now"),
]


def test_incremental_verdicts(spark):
    build_dedup_index(_docs(spark, CORPUS), "t_idx_exact", "t_idx_bands")
    out = {
        r["doc_id"]: (r["verdict"], r["matched_corpus_doc"])
        for r in incremental_dedup(
            spark, _docs(spark, INCREMENT), "t_idx_exact", "t_idx_bands"
        ).collect()
    }
    assert out[11] == ("exact", 1.0)
    assert out[12] == ("near", 1.0)
    assert out[13] == ("unique", None)


def test_incremental_probe_reads_index_not_corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    build_dedup_index(docs.filter(F.col("doc_id") % 10 < 8), "t_idx_exact2", "t_idx_bands2")
    res = incremental_dedup(
        spark, docs.filter(F.col("doc_id") % 10 >= 8), "t_idx_exact2", "t_idx_bands2"
    )
    res.collect()
    plan = _final_plan(res)
    # Every documents.parquet scan in the probe carries the increment
    # predicate — the corpus text is never re-read.
    doc_scans = [l for l in plan.splitlines() if "documents.parquet" in l]
    assert doc_scans and all("% 10) >= 8" in l for l in doc_scans), doc_scans
    # Both index tables are read through their bucketed layout.
    assert plan.count("Bucketed: true") >= 2, plan


def test_incremental_probe_index_side_never_shuffles(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    build_dedup_index(docs.filter(F.col("doc_id") % 10 < 8), "t_idx_exact3", "t_idx_bands3")
    # At test scale AQE broadcasts the tiny index (also shuffle-free for
    # the index side); disable broadcast to surface the 100 TB plan — a
    # sort-merge join where ONLY the increment side exchanges into the
    # index's bucketing.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        res = incremental_dedup(
            spark, docs.filter(F.col("doc_id") % 10 >= 8), "t_idx_exact3", "t_idx_bands3"
        )
        res.collect()
        plan = _final_plan(res)
        assert "SortMergeJoin" in plan
        # One exchange per probe key — the increment's — and none for the
        # bucketed index side.
        assert plan.count("Exchange hashpartitioning(content_hash") == 1, plan
        assert plan.count("Exchange hashpartitioning(bsig") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
