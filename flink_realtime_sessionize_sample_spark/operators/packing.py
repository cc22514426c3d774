"""Context-window sequence packing for training-data pipelines.

Greedy next-fit bin packing of documents into fixed token-capacity bins —
the step between chunking and the trainer (maximize tokens per context
window, minimize padding). The reference has nothing like it (SURVEY.md
§2.9); this is beyond-parity scope for the 100 TB north star.

Distributed design: packing is inherently sequential (bin state carries
from doc to doc), so the unit of sequential work must be bounded and
deterministic. Documents are assigned to ``buckets`` LOGICAL buckets by a
portable content hash (md5-48 of doc_id — NOT by physical partition, so the
result is identical on 1 executor or 1000), and next-fit runs per bucket in
hash-then-id order via ``applyInPandas``. Each bucket's loop is O(docs in
bucket); buckets are the parallelism knob. Determinism makes the operator
oracle-checkable: DuckDB replays the identical walk with a recursive CTE
(``plans/pipeline_queries.py::pack_sequences``).

Why next-fit (not first-fit-decreasing): FFD packs ~2% tighter but needs
random access to open bins; next-fit is single-pass streaming with O(1)
state — the only shape that stays exact under bounded memory at corpus
scale. Over-capacity docs open their own bin (and the next doc starts a
fresh one), matching the standard trainer behavior of truncating oversized
examples downstream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from flink_realtime_sessionize_sample_spark.functions import text as T

DEFAULT_CAPACITY = 128
# The bucket count is PART OF THE RESULT CONTRACT, not a tuning knob:
# bin_idx is defined by the deterministic greedy walk WITHIN a bucket, so
# changing `buckets` changes every (bucket, bin_idx) assignment. It is
# therefore a fixed constant — never derived from cluster size
# (defaultParallelism would make the packing non-reproducible across
# deployments). 256 sizes the default for real clusters: 256 independent
# walks keep hundreds of executors busy while each walk still packs
# thousands of docs per bucket at corpus scale (at 100 TB ≈ billions of
# docs, ~millions per bucket — the Python walk touches only (id, n_tokens)
# pairs, ~16 bytes/doc). Deployments that need a different granularity pass
# `buckets` explicitly and record it alongside the output.
DEFAULT_BUCKETS = 256


def pack_next_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = DEFAULT_CAPACITY,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Assign every doc a (bucket, bin_idx): greedy next-fit over docs in
    deterministic (hash, id) order within each logical bucket.

    Output: (doc_id, n_tokens, bucket, bin_idx). One shuffle (groupBy
    bucket); the per-bucket Python loop touches only (id, n_tokens) pairs —
    the text never reaches Python.
    """
    # NULL text must not poison the walk: size(NULL) is NULL (or -1 under
    # legacy sizeOfNull), which would violate the non-null schema or make
    # `fill` DECREASE mid-walk, diverging from the oracle CTE. Coalesce to
    # '' and clamp — the DuckDB oracle applies the identical guard.
    safe_text = f"coalesce({text_col}, '')"
    n_tokens = f"greatest(0L, size({T.tokens_spark(safe_text)}))"
    base = docs.select(
        F.col(id_col),
        F.expr(n_tokens).cast("long").alias("n_tokens"),
        F.expr(f"{T.h48_spark(f'cast({id_col} AS STRING)')} % {buckets}").alias("bucket"),
        F.expr(T.h48_spark(f"cast({id_col} AS STRING)")).alias("_h"),
    )
    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType, False),
            StructField("n_tokens", LongType(), False),
            StructField("bucket", LongType(), False),
            StructField("bin_idx", LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", id_col], kind="mergesort").reset_index(drop=True)
        fill = capacity + 1  # force a new bin for the first doc
        bin_idx = -1
        bins = []
        for n in pdf["n_tokens"]:
            if fill + n > capacity:
                bin_idx += 1
                fill = int(n)
            else:
                fill += int(n)
            bins.append(bin_idx)
        return pdf.assign(bin_idx=pd.array(bins, dtype="int64"))[
            [id_col, "n_tokens", "bucket", "bin_idx"]
        ]

    return base.groupBy("bucket").applyInPandas(pack, schema=schema)
