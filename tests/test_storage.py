"""Physical-layout tests: plan-shape assertions that the declared storage
layout actually removes work — the 100 TB design points made checkable at
test scale (shuffle-free bucketed join, directory-pruned partitioned scan).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.operators.storage import (
    join_bucketed,
    read_pruned,
    write_bucketed,
    write_partitioned,
)
from flink_realtime_sessionize_sample_spark.sources.registry import load_table


def _executed_plan(df) -> str:
    # Materialize first so AQE finalizes the plan, then read the live plan.
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_small, tmp_path):
    o = load_table(spark, sf_small, "orders")
    c = load_table(spark, sf_small, "customer")
    write_bucketed(o.withColumnRenamed("o_custkey", "custkey"), "b_orders", ["custkey"], 8)
    write_bucketed(c.withColumnRenamed("c_custkey", "custkey"), "b_customer", ["custkey"], 8)
    # At sf0.001 AQE would broadcast the tiny side, hiding the property under
    # test; disable broadcast so the plan is the bucket-local SortMergeJoin a
    # 100 TB fact-fact join would use.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = join_bucketed(spark, "b_orders", "b_customer", ["custkey"])
        plan = _executed_plan(j)
        # Both sides are pre-partitioned by the bucket spec: the join plans
        # with zero shuffle exchanges (bucket-local sort-merge join).
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        # Cross-check the result against the plain (shuffling) join.
        expected = (
            load_table(spark, sf_small, "orders")
            .withColumnRenamed("o_custkey", "custkey")
            .join(
                load_table(spark, sf_small, "customer").withColumnRenamed(
                    "c_custkey", "custkey"
                ),
                "custkey",
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_scan_prunes(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])

    pruned = read_pruned(spark, out, "lang = 'en'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # The lang predicate must land in PartitionFilters (directory pruning),
    # NOT in the row-level PushedFilters.
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]

    expected = docs.filter(F.col("lang") == "en").count()
    assert pruned.count() == expected
    # Only the en=... directory is read. DataFrame.inputFiles() reports the
    # relation's full file list pre-pruning, so check the files actually
    # touched at runtime via input_file_name().
    all_files = set(spark.read.parquet(out).inputFiles())
    pruned_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert len(pruned_files) < len(all_files)
    assert all("lang=en" in f for f in pruned_files)


def test_bucketed_agg_has_no_shuffle(spark, sf_small, tmp_path):
    """Aggregation on the bucket key also skips its shuffle: the hash
    aggregate's distribution requirement is satisfied by the bucketing."""
    ev = load_table(spark, sf_small, "events")
    write_bucketed(ev, "b_events", ["user_id"], 8)
    try:
        agg = (
            spark.table("b_events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )
        plan = _executed_plan(agg)
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == ev.select("user_id").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events")


def test_scan_pushdown_projection_and_filter(spark, sf_small):
    """Scale discipline check: a 2-column projection with a predicate must
    reach the parquet reader as PushedFilters + a pruned ReadSchema — the
    difference between scanning 2 columns and scanning the whole table."""
    docs = load_table(spark, sf_small, "documents")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan") :]
    assert "PushedFilters" in scan and "EqualTo(lang,en)" in scan
    rs = scan[scan.index("ReadSchema") : scan.index("ReadSchema") + 200]
    assert "doc_id" in rs and "lang" in rs and "text" not in rs


def test_orc_round_trip_with_pushdown(spark, sf_small, tmp_path):
    """ORC sink/source parity: write→read preserves rows, and ORC scans get
    the same predicate pushdown treatment as parquet."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "lang", "text")
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == docs.count()
    assert back.schema == docs.schema
    q = back.filter(F.col("lang") == "en").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan
    assert q.count() == docs.filter("lang = 'en'").count()


def test_schema_evolution_merge_scan(spark, sf_small, tmp_path):
    """Schema-on-read across generations: a table directory whose older
    files lack a column added later must scan under mergeSchema=true with
    the unioned schema, null-backfilled for old files — the operational
    reality of any long-lived 100 TB table (the engine's own testdata went
    through exactly such a generation change, TESTDATA ts encoding)."""
    from pyspark.sql import functions as F

    from flink_realtime_sessionize_sample_spark.sources.registry import load_table

    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    gen1 = ev.filter(F.col("event_id") % 2 == 0)
    gen2 = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "quality_score", F.round(F.col("value") / 100, 6)
    )
    tbl = str(tmp_path / "evolving")
    gen1.write.parquet(tbl)
    gen2.write.mode("append").parquet(tbl)

    merged = spark.read.option("mergeSchema", "true").parquet(tbl)
    assert "quality_score" in merged.columns
    assert merged.count() == ev.count()
    n_old = gen1.count()
    assert merged.filter(F.col("quality_score").isNull()).count() == n_old
    # new-generation rows keep their values
    assert merged.filter(F.col("quality_score").isNotNull()).count() == ev.count() - n_old


def test_small_file_compaction_preserves_data_and_clusters(spark, sf_small, tmp_path):
    """Small-files compaction — the table-maintenance pass every streaming
    ingest needs (each micro-batch writes a file per partition; at 100 TB
    the NameNode/manifest and scan-task overhead of millions of tiny files
    dominates). Compaction = read → repartitionByRange(cluster key) →
    rewrite: file count drops to the target, the fingerprint proves no
    row was lost or duplicated, and range partitioning leaves each output
    file covering a disjoint key span (the min/max-stats pruning property
    ZORDER generalizes to multiple dimensions)."""
    import glob

    from pyspark.sql import functions as F

    from flink_realtime_sessionize_sample_spark.sources.registry import load_table

    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)  # simulate micro-batch litter
    n_small = len(glob.glob(f"{frag}/part-*.parquet"))
    assert n_small >= 32

    compacted = str(tmp_path / "compacted")
    spark.read.parquet(frag).repartitionByRange(4, "user_id").write.parquet(compacted)
    n_big = len(glob.glob(f"{compacted}/part-*.parquet"))
    assert n_big <= 4

    def fp(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(event_id, user_id))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    assert fp(spark.read.parquet(compacted)) == fp(ev)

    # Range clustering: per-file user_id spans must be disjoint.
    spans = []
    for f in glob.glob(f"{compacted}/part-*.parquet"):
        row = spark.read.parquet(f).agg(
            F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
        ).collect()[0]
        if row["lo"] is not None:
            spans.append((row["lo"], row["hi"]))
    spans.sort()
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
