"""Stage decomposition for item_cooccurrence_topk (r16, guide §1).

Times each successive prefix of the pipeline with the noop sink so the
dominant stage is identified before anything is changed:
  s1  distinct (order, part) frame           (scan + distinct)
  s2  s1 + self-join + (i, j) count agg      (the pair generation)
  s3  s2 + mirror explode + marginals joins  (scoring)
  s4  full query (s3 + top-3 window)
Each stage best-of-2 after a tiny-sf warmup of the full query.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F, Window  # noqa: E402

from flink_realtime_sessionize_sample_spark import get_spark, plans  # noqa: E402
from flink_realtime_sessionize_sample_spark.sources import load_table  # noqa: E402
from flink_realtime_sessionize_sample_spark.operators.mat import materialize  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stages(spark, sf_dir):
    bp = materialize(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    s1 = bp
    cnt = bp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    b2 = bp.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("j"))
    half = (
        bp.join(b2, (bp.l_orderkey == b2.ok) & (bp.l_partkey < b2.j))
        .groupBy(F.col("l_partkey").alias("i"), "j")
        .agg(F.count(F.lit(1)).alias("cooc"))
    )
    s2 = half
    pairs = half.select(
        F.explode(
            F.array(
                F.struct(F.col("i").alias("i"), F.col("j").alias("j")),
                F.struct(F.col("j").alias("i"), F.col("i").alias("j")),
            )
        ).alias("p"),
        "cooc",
    ).select("p.i", "p.j", "cooc")
    scored = (
        pairs.join(cnt.select(F.col("l_partkey").alias("i"), F.col("c").alias("ci")), "i")
        .join(cnt.select(F.col("l_partkey").alias("j"), F.col("c").alias("cj")), "j")
        .select(
            "i", "j", "cooc",
            (F.round(F.col("cooc") / F.sqrt(F.col("ci") * F.col("cj")), 6) + F.lit(0.0)).alias("cosine"),
        )
    )
    s3 = scored
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    s4 = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(F.col("i").alias("part_i"), F.col("j").alias("part_j"), "cooc", "cosine")
    )
    return {"s1_distinct": s1, "s2_pairs_agg": s2, "s3_scored": s3, "s4_full": s4}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="probe_itemcooc", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    force(plans.QUERIES["item_cooccurrence_topk"](spark, "/root/testdata/sf0.001"))
    for name, df in stages(spark, sf_dir).items():
        runs = []
        for i in range(2):
            d = stages(spark, sf_dir)[name]  # fresh frame per run (no reuse)
            spark.sparkContext.setJobDescription(f"itemcooc {name} run {i}")
            t0 = time.perf_counter()
            force(d)
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"stage": name, "best": min(runs), "runs": runs}), flush=True)


if __name__ == "__main__":
    main()
