"""Round-16 interleaved A/B harness.

The box has sat in an ambient co-tenancy episode since round 14 (calib
0.11-0.19 vs the 0.077-0.103 quiet band), so single before/after walls
across sessions are +-40% noise. This harness builds BOTH variants of a
query in ONE SparkSession (variants differ by an env var read at
plan-build time), then alternates noop-forced runs A,B,A,B,... so ambient
drift hits both equally; compare the mins (and the pairwise deltas).

Usage:
    python tools/ab_r16.py ENVVAR <query> [query ...]
      variant A = ENVVAR unset (current code path)
      variant B = ENVVAR=1     (alternate code path)
    AB_ROUNDS=4 python tools/ab_r16.py SPARK_GRAFT_GO_B2OLD customer_pareto_abc
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
    envvar = sys.argv[1]
    names = sys.argv[2:]
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    print(json.dumps({"cpu_calib_start_sec": _calib()}), flush=True)
    spark = get_spark(
        app_name="ab_r16",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = plans.QUERIES[name]
        os.environ.pop(envvar, None)

        def build_a(sf=sf_dir):
            os.environ.pop(envvar, None)
            return fn(spark, sf)

        def build_b(sf=sf_dir):
            os.environ[envvar] = "1"
            try:
                return fn(spark, sf)
            finally:
                os.environ.pop(envvar, None)

        # Warm both variants at tiny sf (JIT + codegen).
        spark.sparkContext.setJobDescription(f"{name} warmup A")
        force(build_a(WARMUP_SF))
        spark.sparkContext.setJobDescription(f"{name} warmup B")
        force(build_b(WARMUP_SF))

        runs_a, runs_b = [], []
        for i in range(rounds):
            spark.sparkContext.setJobDescription(f"{name} A run {i}")
            t0 = time.perf_counter()
            force(build_a())
            runs_a.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name} B run {i}")
            t0 = time.perf_counter()
            force(build_b())
            runs_b.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "env": envvar,
                    "A_min": min(runs_a),
                    "B_min": min(runs_b),
                    "A_runs": runs_a,
                    "B_runs": runs_b,
                    "winner": "A" if min(runs_a) <= min(runs_b) else "B",
                }
            ),
            flush=True,
        )
    print(json.dumps({"cpu_calib_end_sec": _calib()}), flush=True)


if __name__ == "__main__":
    main()
