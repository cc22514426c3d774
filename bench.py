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
    print(
        json.dumps(
            {
                "metric": "headline query wall time (noop-sink forced), warm session",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "events_per_sec_sessionize": events_per_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
