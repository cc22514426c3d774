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


def test_stream_index_update_dedups_across_batches(spark, tmp_path):
    """Grow-as-you-ingest sequencing: a batch-2 doc identical to a doc
    ACCEPTED in batch 1 must be rejected (its fingerprints indexed once,
    canonical = the batch-1 id), because batch 2 probes the grown index."""
    import os
    import time

    from flink_realtime_sessionize_sample_spark.operators.incremental import (
        build_plain_index,
        stream_index_update_writer,
    )

    corpus = _docs(spark, [(1, "corpus content entirely its own thing here today")])
    build_plain_index(corpus, "t_ui_exact", "t_ui_bands")
    novel = "fresh text that no corpus document contains at all right now"
    batch_a = _docs(spark, [(10, novel)])
    batch_b = _docs(spark, [(20, novel), (21, "another brand new unique document body")])
    src = tmp_path / "src"
    batch_a.coalesce(1).write.parquet(str(src / "a"))
    batch_b.coalesce(1).write.parquet(str(src / "b"))
    now = time.time()
    for sub, age in (("a", 20.0), ("b", 10.0)):
        for f in os.listdir(src / sub):
            os.utime(src / sub / f, (now - age, now - age))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    h = (
        stream_index_update_writer(spark, stream, "t_ui_exact", "t_ui_bands")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert h.awaitTermination(600)
    ex = {
        r["content_hash"]: r["canonical_doc_id"]
        for r in spark.table("t_ui_exact").collect()
    }
    # 3 hashes total: corpus doc, novel (canonical = 10, NOT 20), doc 21.
    assert len(ex) == 3
    assert 10 in ex.values() and 21 in ex.values() and 20 not in ex.values()
