"""Round-16 optimization harness: isolate named headline queries.

For each query name given on argv: build the DataFrame against
$SPARK_GRAFT_SF_DIR (default sf0.1), capture `.explain("formatted")` to
plans/r16/<name>_<tag>.txt, force it end-to-end with the noop sink
(bench.py's exact timed action), and print one JSON line per query with
best-of-N wall seconds plus the run list. A cpu_calib probe brackets the
session so every number carries its machine-speed context
(tools/cpu_calib.py's discipline).

Usage:
    python tools/perf_r16.py <tag> <query> [query ...]
    PERF_RUNS=3 python tools/perf_r16.py after dedup_survivor_corpus

`tag` is the plan-file suffix ("before" / "after"). Timing methodology is
identical to bench.py: warmup pass at sf0.001, then best-of-N (default 2)
noop-forced runs at the target SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_realtime_sessionize_sample_spark import get_spark, plans  # noqa: E402

WARMUP_SF = "/root/testdata/sf0.001"


def _calib() -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    runs_n = int(os.environ.get("PERF_RUNS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    plan_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(plan_dir, exist_ok=True)

    print(json.dumps({"cpu_calib_start_sec": _calib()}), flush=True)
    spark = get_spark(
        app_name=f"perf_r16_{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = plans.QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name} [{tag}] warmup")
        force(fn(spark, WARMUP_SF))  # JIT/codegen warm at tiny sf
        df = fn(spark, sf_dir)
        jqe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(jqe.explainString(mode.fromString("formatted")))
        wall = []
        for i in range(runs_n):
            spark.sparkContext.setJobDescription(f"{name} [{tag}] run {i}")
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            wall.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps({"query": name, "tag": tag, "best": min(wall), "runs": wall}),
            flush=True,
        )
    print(json.dumps({"cpu_calib_end_sec": _calib()}), flush=True)


if __name__ == "__main__":
    main()
