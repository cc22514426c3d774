"""Distributed sufficient statistics over embedding columns.

The whitening/PCA/feature-standardization pass of an embedding pipeline
needs the d×d covariance of a corpus whose row count is unbounded — the
classic one-pass sufficient-statistics reduction (n, Σx, ΣxxT). The
reference has nothing comparable (SURVEY.md §2.9); this is beyond-parity
scope for the training-data north star.

Scale design: the naive relational formulation explodes every row into d²
(i, j, x_i·x_j) tuples — a 4096× row blowup at d=64 that shuffles the whole
corpus. Here each Arrow batch is reduced with BLAS (``X.T @ X`` on a dense
float64 matrix) inside ``mapInPandas``, so the per-partition output is ONE
(n, Σx, ΣxxT-flattened) row regardless of batch count; the merge explodes
only those ~#partitions partial rows (d² doubles each) into a positional
hash aggregate. Corpus bytes crossing the shuffle: zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Sample covariance matrix of an ``array<float>`` column.

    Output: one row per (i, j), 0-based, i ≤ j: ``i``, ``j``,
    ``cov`` = Σxy − ΣxΣy/n over n−1, rounded to 6dp.
    """
    vecs = df.select(F.col(vec_col).alias("v"))

    # Closure-only kernel (workers cannot import this repo).
    def gen(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim, dtype=np.float64)
        m = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            n += X.shape[0]
            s += X.sum(axis=0)
            m += X.T @ X
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "m": [m.ravel().tolist()]})

    partials = vecs.mapInPandas(gen, schema="n long, s array<double>, m array<double>")

    total_n = partials.agg(F.sum("n").alias("n"))
    sums = (
        partials.select(F.posexplode("s").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("ssum"))
    )
    prods = (
        partials.select(F.posexplode("m").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("msum"))
        .select(
            (F.col("pos") / dim).cast("long").alias("i"),
            (F.col("pos") % dim).alias("j"),
            "msum",
        )
        .filter(F.col("i") <= F.col("j"))
    )
    si = sums.select(F.col("pos").alias("i"), F.col("ssum").alias("si"))
    sj = sums.select(F.col("pos").alias("j"), F.col("ssum").alias("sj"))
    return (
        prods.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(total_n))
        .select(
            "i",
            "j",
            (
                F.round(
                    (F.col("msum") - F.col("si") * F.col("sj") / F.col("n"))
                    / (F.col("n") - 1),
                    6,
                )
                + F.lit(0.0)  # collapse IEEE -0.0 (near-zero covariances)
            ).alias("cov"),
        )
    )
