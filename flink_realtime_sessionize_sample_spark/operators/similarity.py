"""Similarity search over embedding columns (`array<float>`).

Rebuild scope beyond the reference (SURVEY.md §2.9): approximate-nearest-
neighbor top-k over the `embeddings` table.

Scale shape:

* **Brute-force top-k** — the exact baseline. The (small) query set is
  broadcast; each corpus partition scores its rows against every query and
  the per-query top-k is taken with a ranking window. One pass over the
  corpus, one narrow shuffle keyed by query id (rows already filtered to
  candidates ≪ corpus). This is the right plan whenever |queries| is small
  — 1000 executors each stream their parquet split once.
* **Sign-bucket LSH top-k** — random-hyperplane LSH restricted to
  axis-aligned planes (deterministic, engine-portable): corpus and queries
  bucket by the sign bits of the first ``nbits`` dims, and scoring joins on
  bucket equality, cutting scored pairs ~2^nbits-fold at recall cost. At
  real scale you'd use multiple hash tables / multi-probe; the single-table
  variant keeps the oracle deterministic.

Cosines are computed in double precision and rounded to 6dp BEFORE ranking,
with vec_id as tiebreaker, so ordering is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.functions import text as T
from flink_realtime_sessionize_sample_spark.operators.dedup import fan_out


def _with_norm(emb: DataFrame, vec_col: str, id_col: str, prefix: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}_v"),
        F.expr(T.norm_spark(vec_col)).alias(f"{prefix}_nrm"),
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nbits: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    ``queries`` is a (small) DataFrame with the same (id, vector) shape —
    broadcast to every corpus partition. ``nbits=None`` scores the full
    corpus (exact); with ``nbits`` set, both sides bucket by sign-bit LSH
    and only same-bucket rows are scored (approximate).
    Output: (query_id, neighbor_id, rank, cosine).
    """
    c = _with_norm(fan_out(emb), vec_col, id_col, "c")
    q = _with_norm(queries, vec_col, id_col, "q")
    if nbits is not None:
        c = c.withColumn("bucket", F.expr(T.sign_bucket_spark("c_v", nbits)))
        q = q.withColumn("bucket", F.expr(T.sign_bucket_spark("q_v", nbits)))
        joined = c.join(F.broadcast(q), "bucket")
    else:
        joined = c.crossJoin(F.broadcast(q))
    cos = F.expr(T.dot_spark("c_v", "q_v")) / (F.col("c_nrm") * F.col("q_nrm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        joined.filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )
