"""Incremental (new-batch-vs-corpus) dedup against a persisted fingerprint
index.

Every other dedup operator in this package recomputes over the full corpus;
a production pipeline ingests an INCREMENT and dedups it against what the
corpus already contains — without rescanning 100 TB of text. The pattern
(no reference analog; the reference has no dedup at all — SURVEY.md §2.9):

1. **Index build, once per corpus epoch** — two narrow fingerprint tables:
   an exact tier (48-bit content hash → canonical doc) and a near tier
   (MinHash band signature → canonical doc, one row per DISTINCT band sig).
   Both are written as BUCKETED managed tables on their probe key
   (`operators/storage.py::write_bucketed`), so every future probe join
   finds the index pre-partitioned: the index side of the join needs NO
   exchange, ever. Index size is O(distinct fingerprints) — a few tens of
   bytes per corpus document, ~10,000× smaller than the text.
2. **Probe, per increment** — hash + band the increment (per-row codegen,
   no corpus access), LEFT-join both index tables, and grade each incoming
   doc ``exact`` (content hash already in corpus), ``near`` (shares ≥ 1
   MinHash band with a corpus doc — the standard LSH dedup decision at
   index scale, where re-verifying against corpus text would defeat the
   no-rescan point), or ``unique``. The only shuffle is the increment's
   own (narrow fingerprint rows, partitioned into the index's bucketing);
   at 100 TB corpus / 1 TB increment the job touches the 1 TB increment
   plus the fingerprint index and nothing else.

The DuckDB oracle for the registered query computes the same verdicts
directly from the full corpus (no index) — the green row IS the proof that
probe-vs-index ≡ full-corpus dedup restricted to the increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_sessionize_sample_spark.functions import text as T
from flink_realtime_sessionize_sample_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    fan_out,
    minhash_band_frame,
    with_shingles,
)
from flink_realtime_sessionize_sample_spark.operators.storage import write_bucketed


def _content_hash(text_col: str) -> F.Column:
    return F.expr(T.h48_spark(f"lower(trim({text_col}))"))


def _drop_stale_table(spark: SparkSession, table: str) -> None:
    """Make ``saveAsTable(mode=overwrite)`` idempotent across SESSIONS: a
    fresh session's catalog has no entry for ``table``, but the previous
    run's warehouse directory survives on disk and table creation then
    fails with LOCATION_ALREADY_EXISTS. Drop the catalog entry if present
    and clear an orphaned local warehouse dir (non-local warehouse URIs —
    a real cluster's HDFS/S3 metastore — never orphan this way because the
    catalog there is persistent too, so the rmtree path is local-only)."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme in ("", "file") and wh.path:
        shutil.rmtree(os.path.join(wh.path, table.lower()), ignore_errors=True)


def _band_keys(
    docs: DataFrame, text_col: str, id_col: str, k: int, num_hashes: int, bands: int
) -> DataFrame:
    """(id, bsig) band keys; band_idx folded into the string so the probe
    join has ONE key column — the bucketed-layout requirement. Works on
    both batch and streaming frames (the partition-spread probe uses
    ``.rdd``, which streaming forbids — a streaming micro-batch already
    arrives pre-split by the source)."""
    spread = docs if docs.isStreaming else fan_out(docs)
    base = (
        with_shingles(spread, text_col, k)
        .filter(F.size("toks") >= k)
        .select(id_col, "sh")
    )
    bf = minhash_band_frame(base, id_col, num_hashes, bands)
    return bf.select(
        F.col(id_col),
        F.concat_ws("|", F.col("band_idx").cast("string"), "sig").alias("bsig"),
    )


def build_dedup_index(
    corpus: DataFrame,
    exact_table: str = "dedup_idx_exact",
    bands_table: str = "dedup_idx_bands",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n_buckets: int = 8,
) -> None:
    """Persist the two-tier fingerprint index for ``corpus``.

    ``exact_table``: (content_hash, canonical_doc_id) — one row per
    distinct normalized text, bucketed by content_hash.
    ``bands_table``: (bsig, canonical_doc_id) — one row per distinct
    MinHash band signature (min doc id wins), bucketed by bsig.
    Both aggregates collapse map-side before their single exchange, which
    doubles as the bucketed write's required partitioning. ``n_buckets``
    is test-scale; size it to ~one task per bucket at target scale.
    """
    _drop_stale_table(corpus.sparkSession, exact_table)
    _drop_stale_table(corpus.sparkSession, bands_table)
    exact = (
        corpus.select(F.col(id_col), _content_hash(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_doc_id"))
    )
    write_bucketed(exact, exact_table, ["content_hash"], n_buckets)
    bsigs = (
        _band_keys(corpus, text_col, id_col, k, num_hashes, bands)
        .groupBy("bsig")
        .agg(F.min(id_col).alias("canonical_doc_id"))
    )
    write_bucketed(bsigs, bands_table, ["bsig"], n_buckets)


def incremental_dedup(
    spark: SparkSession,
    increment: DataFrame,
    exact_table: str = "dedup_idx_exact",
    bands_table: str = "dedup_idx_bands",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Grade every increment doc against the persisted index — no corpus
    text is read.

    Output: (doc_id, verdict ∈ {exact, near, unique}, matched_corpus_doc)
    where matched_corpus_doc is the exact tier's canonical doc, else the
    MINIMUM canonical doc over all matching band signatures, else NULL.
    Increment-internal duplicates are deliberately not graded here — run
    the batch dedup operators within the increment, then this against the
    corpus (the two compose; documented contract).
    """
    inc_hash = increment.select(
        F.col(id_col), _content_hash(text_col).alias("content_hash")
    )
    exact_idx = spark.table(exact_table)
    exact_m = inc_hash.join(exact_idx, "content_hash", "left").select(
        F.col(id_col), F.col("canonical_doc_id").alias("_exact_doc")
    )
    bands_idx = spark.table(bands_table)
    near_m = (
        _band_keys(increment, text_col, id_col, k, num_hashes, bands)
        .join(bands_idx, "bsig")
        .groupBy(id_col)
        .agg(F.min("canonical_doc_id").alias("_near_doc"))
    )
    verdict = (
        F.when(F.col("_exact_doc").isNotNull(), F.lit("exact"))
        .when(F.col("_near_doc").isNotNull(), F.lit("near"))
        .otherwise(F.lit("unique"))
    )
    return (
        exact_m.join(near_m, id_col, "left")
        .select(
            F.col(id_col),
            verdict.alias("verdict"),
            # double, not bigint: the column is nullable, and nullable int
            # columns round-trip as float64 through the driver comparator's
            # pandas path — emit float on both engines (oracle ::DOUBLE).
            F.coalesce("_exact_doc", "_near_doc")
            .cast("double")
            .alias("matched_corpus_doc"),
        )
    )


def incremental_probe_streams(
    spark: SparkSession,
    increment_stream: DataFrame,
    exact_table: str = "dedup_idx_exact",
    bands_table: str = "dedup_idx_bands",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """The STREAMING probe: fingerprint each arriving increment doc and
    join it against the persisted index — both joins are STATELESS
    stream-static joins (the static index side re-resolves per
    micro-batch, reading through its bucketed layout), so this runs in
    append mode with no watermark and no state store: the Kafka-ingest
    dedup shape, where every micro-batch's verdicts ship to the sink as
    they arrive.

    Returns two streaming frames (grouping a stream needs event-time
    machinery the decision doesn't; the per-doc min over band matches is
    the CONSUMER's rollup — see the registered query):
      * exact matches: (id, _exact_doc nullable) — one row per doc;
      * near candidates: (id, _near_doc) — one row per matching band sig.
    """
    inc_hash = increment_stream.select(
        F.col(id_col), _content_hash(text_col).alias("content_hash")
    )
    exact = inc_hash.join(spark.table(exact_table), "content_hash", "left").select(
        F.col(id_col), F.col("canonical_doc_id").alias("_exact_doc")
    )
    near = (
        _band_keys(increment_stream, text_col, id_col, k, num_hashes, bands)
        .join(spark.table(bands_table), "bsig")
        .select(F.col(id_col), F.col("canonical_doc_id").alias("_near_doc"))
    )
    return exact, near


def build_plain_index(
    corpus: DataFrame,
    exact_table: str,
    bands_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> None:
    """Index epoch for the APPEND-maintained variant: plain managed tables
    (no bucket spec) so streaming micro-batches can ``insertInto`` them.
    Production operates exactly this way — appends land unbucketed and a
    periodic compaction job rewrites the epoch bucketed
    (``build_dedup_index``); the probe meanwhile pays one extra index-side
    exchange, the classic freshness-vs-layout trade."""
    spark = corpus.sparkSession
    _drop_stale_table(spark, exact_table)
    _drop_stale_table(spark, bands_table)
    exact = (
        corpus.select(F.col(id_col), _content_hash(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_doc_id"))
    )
    exact.write.mode("overwrite").saveAsTable(exact_table)
    bsigs = (
        _band_keys(corpus, text_col, id_col, k, num_hashes, bands)
        .groupBy("bsig")
        .agg(F.min(id_col).alias("canonical_doc_id"))
    )
    bsigs.write.mode("overwrite").saveAsTable(bands_table)


def stream_index_update_writer(
    spark: SparkSession,
    increment_stream: DataFrame,
    exact_table: str,
    bands_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
):
    """GROW the fingerprint index from a stream: per micro-batch,
    probe-then-append inside ``foreachBatch`` — the index-maintenance half
    of incremental dedup (the probe query is the read half).

    Per batch: a document is ACCEPTED iff its content hash misses the
    exact tier AND none of its MinHash bands hit the band tier — probed
    against the index AS OF the previous batch, so batch 2 correctly
    dedups against batch 1's accepted docs (grow-as-you-ingest). Accepted
    docs contribute ALL their fingerprints (grouped min within the
    batch); rejected duplicates contribute nothing — their canonical is
    already indexed. Appends are plain ``insertInto`` (see
    ``build_plain_index`` for the compaction story).

    Returns the ``DataStreamWriter`` (caller picks trigger/checkpoint).
    """

    def _update(batch_df, _batch_id) -> None:
        hashes = batch_df.select(
            F.col(id_col), _content_hash(text_col).alias("content_hash")
        )
        bkeys = _band_keys(batch_df, text_col, id_col, k, num_hashes, bands)
        exact_hit = hashes.join(
            spark.table(exact_table), "content_hash", "left_semi"
        ).select(id_col)
        band_hit = bkeys.join(
            spark.table(bands_table), "bsig", "left_semi"
        ).select(id_col)
        dup_ids = exact_hit.union(band_hit).distinct()
        # FREEZE the accepted set under the as-of-previous-batch index by
        # spilling it to a per-batch temp parquet and re-reading. Anything
        # lazier breaks: plain lineage re-evaluates `unique` for the
        # second append AFTER the exact tier already contains this
        # batch's own hashes (every doc self-matches, zero band rows —
        # observed); a cache does not survive either, because
        # `insertInto` refreshes the target table which invalidates every
        # cached plan referencing it (observed: cached frame recounted 0
        # post-insert). The spill is tiny (accepted fingerprint columns
        # only) and is the standard freeze pattern inside foreachBatch.
        import shutil as _shutil
        import tempfile as _tempfile

        tmp = _tempfile.mkdtemp(prefix="idx_update_batch_")
        try:
            batch_df.join(dup_ids, id_col, "left_anti").write.mode(
                "overwrite"
            ).parquet(f"{tmp}/uniq")
            unique = spark.read.parquet(f"{tmp}/uniq")
            (
                unique.select(
                    F.col(id_col), _content_hash(text_col).alias("content_hash")
                )
                .groupBy("content_hash")
                .agg(F.min(id_col).alias("canonical_doc_id"))
                .write.mode("append")
                .insertInto(exact_table)
            )
            (
                _band_keys(unique, text_col, id_col, k, num_hashes, bands)
                .groupBy("bsig")
                .agg(F.min(id_col).alias("canonical_doc_id"))
                .write.mode("append")
                .insertInto(bands_table)
            )
        finally:
            _shutil.rmtree(tmp, ignore_errors=True)

    return increment_stream.writeStream.foreachBatch(_update)
