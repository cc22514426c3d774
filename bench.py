#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <dir>, "events_per_sec": N}

Each query is forced end-to-end with the noop sink (full column
materialization, no write cost). One warmup pass at sf0.001 amortizes JVM/
codegen startup so the numbers reflect steady-state engine throughput, which
is what BASELINE.md's 720k records/s design target speaks to.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_realtime_sessionize_sample_spark import get_spark
from flink_realtime_sessionize_sample_spark import plans

HEADLINE = [
    # the reference's own workload
    "sessionize_events",
    "sessionize_gap_only",
    "user_total_durations",
    # relational surface
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "top_orders_per_customer",
    "customer_order_distribution",
    "events_hourly_windows",
    # LLM-data operators (dedup / similarity / text analysis)
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "doc_quality_score",
    # temporal joins + argmax dedup + rollup
    "asof_clicks_views",
    "latest_event_per_user",
    "time_bucket_rollup",
]
WARMUP_SF = "/root/testdata/sf0.001"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in plans.QUERIES]

    for name in names:  # warmup: JIT + codegen cache at tiny sf
        force(plans.QUERIES[name](spark, WARMUP_SF))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        force(plans.QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    total = round(sum(timings.values()), 3)
    events_per_sec = round(n_events / timings["sessionize_events"]) if timings.get("sessionize_events") else None

    # Sustained sessionize throughput at volume: sf0.1 wall times are
    # fixed-cost-dominated (~1s of scheduling/scan setup on 100k rows), so
    # also measure a 10× in-memory replication (distinct users per copy) —
    # the number comparable to BASELINE.md's 720k records/s design target.
    from pyspark.sql import functions as F
    from flink_realtime_sessionize_sample_spark.operators.sessionize import sessionize
    from flink_realtime_sessionize_sample_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    big = ev.withColumn("_c", F.explode(F.array(*[F.lit(i) for i in range(10)]))).select(
        (F.col("user_id") + F.col("_c") * 100000).alias("user_id"), "ts", "event_id"
    )
    n_big = n_events * 10
    sustained = sessionize(big, key="user_id", ts="ts", tiebreakers=("event_id",))
    force(sustained)  # warm
    t0 = time.perf_counter()
    force(sustained)
    sustained_eps = round(n_big / (time.perf_counter() - t0))

    # Streaming path: availableNow replay of sf events through the
    # applyInPandasWithState per-event sessionizer (the reference's actual
    # runtime shape) — throughput of the stateful operator incl. state
    # store, micro-batch planning, and the Arrow state channel.
    import shutil
    import tempfile

    from flink_realtime_sessionize_sample_spark.streaming import (
        build_events_file_stream,
        sessionize_stream,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = f"{tmp}/src"
        import os as _os

        _os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", f"{src}/events.parquet")
        stream = build_events_file_stream(spark, src)
        t0 = time.perf_counter()
        q = (
            sessionize_stream(stream.withWatermark("ts", "60 seconds"))
            .writeStream.format("noop")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "streaming replay must terminate"
        streaming_eps = round(n_events / (time.perf_counter() - t0))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "headline query wall time (noop-sink forced), warm session",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "events_per_sec_sessionize": events_per_sec,
                "events_per_sec_sessionize_sustained_10x": sustained_eps,
                "events_per_sec_sessionize_streaming": streaming_eps,
            }
        )
    )


if __name__ == "__main__":
    main()
