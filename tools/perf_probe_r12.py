"""Round-12 perf attribution probe (judge r11 "What's wrong #1"):
per-stage timings for corpus_selection_pipeline and customer_rfm_segments
on the bench-identical session, best-of-3 warm, with loadavg evidence.

Run FROM /tmp:  python /tmp/perf_probe.py [repo_path]
Optionally point repo_path at an old checkout (git worktree) to measure
the identical stages under round-6-era code on the same machine/data.
"""
import os
import sys
import time

repo = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from flink_realtime_sessionize_sample_spark.session import get_spark  # noqa: E402
from flink_realtime_sessionize_sample_spark.sources.registry import load_table  # noqa: E402
from flink_realtime_sessionize_sample_spark import plans  # noqa: E402
from flink_realtime_sessionize_sample_spark.operators import dedup as D  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def load():
    with open("/proc/loadavg") as fh:
        return fh.read().split()[:3]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def best3(label, fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(fn())
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: best={min(ts)} runs={ts}", flush=True)
    return min(ts)


def main():
    print("repo:", repo, "| loadavg start:", load(), flush=True)
    spark = get_spark(
        app_name="perf_probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("corpus_selection_pipeline", "customer_rfm_segments",
                 "sessionize_events", "quality_filter_pipeline",
                 "dedup_minhash_lsh"):
        if name in plans.QUERIES:
            force(plans.QUERIES[name](spark, WARM))

    # control
    best3("control sessionize_events", lambda: plans.QUERIES["sessionize_events"](spark, SF))

    # --- corpus_selection_pipeline stages ---
    docs = load_table(spark, SF, "documents")
    best3("csp full", lambda: plans.QUERIES["corpus_selection_pipeline"](spark, SF))
    best3("csp stage quality_filter_pipeline",
          lambda: plans.QUERIES["quality_filter_pipeline"](spark, SF))
    best3("csp stage near_dup_clusters",
          lambda: D.near_dup_clusters(docs, threshold=0.5))
    best3("csp sibling dedup_minhash_lsh",
          lambda: plans.QUERIES["dedup_minhash_lsh"](spark, SF))

    # CC iteration count (instrumented rerun of the convergence loop)
    edges = D.minhash_lsh_pairs(docs, threshold=0.5) if hasattr(D, "minhash_lsh_pairs") else None
    if edges is not None:
        e = (edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
             .filter(F.col("u") != F.col("v")).distinct().localCheckpoint())
        def fp(df):
            r = df.agg(F.count(F.lit(1)).alias("n"),
                       F.expr("bit_xor(xxhash64(u, v))").alias("h")).collect()[0]
            return (r["n"], r["h"])
        t0 = time.perf_counter()
        prev, iters = fp(e), 0
        for _ in range(25):
            e = D._small_star(D._large_star(e)).localCheckpoint()
            cur = fp(e); iters += 1
            if cur == prev:
                break
            prev = cur
        print(f"csp CC: iterations={iters} edge_rows={prev[0]}"
              f" wall={round(time.perf_counter()-t0,3)}", flush=True)

    # --- customer_rfm_segments stages ---
    from flink_realtime_sessionize_sample_spark.operators.global_order import (
        with_global_rank, ntile_from_rank,
    )
    from flink_realtime_sessionize_sample_spark.plans.analytics_queries import _cents

    o = load_table(spark, SF, "orders")
    def per_cust():
        return o.groupBy("o_custkey").agg(
            F.max(F.datediff(F.to_date("o_orderdate"),
                             F.lit("1970-01-01").cast("date"))).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(_cents("o_totalprice")).alias("monetary_cents"),
        )
    best3("rfm stage per_cust agg", per_cust)

    def one_rank():
        return with_global_rank(per_cust(), ["last_day", "o_custkey"],
                                rank_col="_rk", total_col="_n").select(
            "o_custkey", ntile_from_rank(F.col("_rk"), F.col("_n"), 5).alias("r"))
    best3("rfm stage one global-rank pass", one_rank)
    best3("rfm full", lambda: plans.QUERIES["customer_rfm_segments"](spark, SF))

    print("loadavg end:", load(), flush=True)


if __name__ == "__main__":
    main()
