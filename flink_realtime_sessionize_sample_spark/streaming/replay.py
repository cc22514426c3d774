"""Deterministic file-stream replay harness for streaming-twin queries.

Several registered queries prove "streaming ≡ batch" by replaying a half
of a batch table as a 2-micro-batch file stream, applying a per-batch
transform inside ``foreachBatch``, and appending the results to a managed
warehouse table that outlives the temp source dir (no driver-side
materialization). ``stream_naive_bayes_score`` and
``stream_gopher_filter`` previously each carried a near-verbatim copy of
this ~35-line scaffold (round-7 review); this module is the single
implementation.

The scaffold is itself part of the verified surface: the oracle for each
twin is the batch SQL over the same replayed half, so the split
(``doc_id % 4 ∈ {1, 3}`` inside the caller's odd-id half → two files →
two micro-batches under ``maxFilesPerTrigger=1``) must stay deterministic
and identical across both users.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.operators.incremental import (
    _drop_stale_table,
)


def replay_split_stream(
    spark: SparkSession,
    held: DataFrame,
    schema: str,
    batch_fn: Callable[[DataFrame], DataFrame],
    sink_table: str,
    split_col: str = "doc_id",
    src_prefix: str = "replay_src_",
    timeout_sec: int = 600,
) -> DataFrame:
    """Replay ``held`` (the caller's ``doc_id % 2 == 1`` half) as a
    deterministic 2-micro-batch file stream; each micro-batch runs
    ``batch_fn`` and appends to the managed table ``sink_table``; returns
    the table as a DataFrame (it outlives the temp source dir).

    ``awaitTermination``'s return value is asserted — a hang under
    ``availableNow`` returns False without raising and would otherwise
    look like success with stale rows (verify-skill gotcha)."""
    src = tempfile.mkdtemp(prefix=src_prefix)
    _drop_stale_table(spark, sink_table)
    try:
        # coalesce(1): under maxFilesPerTrigger=1 the micro-batch count
        # equals the data-file count, so each half must land in exactly
        # one part file or the "2 micro-batches" contract would vary with
        # write parallelism (ADVICE r7). Cheap here: the replay source is
        # a test-scale half-table by construction, never a corpus.
        held.filter(F.col(split_col) % 4 == 1).coalesce(1).write.parquet(f"{src}/a")
        held.filter(F.col(split_col) % 4 == 3).coalesce(1).write.parquet(f"{src}/b")

        def _writer(batch_df: DataFrame, _batch_id: int) -> None:
            batch_fn(batch_df).write.mode("append").format("parquet").saveAsTable(
                sink_table
            )

        h = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .writeStream.foreachBatch(_writer)
            .trigger(availableNow=True)
            .start()
        )
        if not h.awaitTermination(timeout_sec):
            h.stop()
            raise RuntimeError(f"{sink_table}: stream replay hung")
        return spark.table(sink_table)
    finally:
        shutil.rmtree(src, ignore_errors=True)
