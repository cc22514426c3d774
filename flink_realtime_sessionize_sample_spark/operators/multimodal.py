"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Rebuild scope beyond the reference (SURVEY.md §2.9): a training-data
pipeline carries images/audio/video as opaque ``binary`` columns with typed
metadata, and decode / feature-extract runs as Arrow-batched Pandas
functions over ``mapInPandas``.

What is REAL here (and tested): the Spark-side plumbing — binary column
construction, schema handling, Arrow batch transfer of bytes into pandas,
``mapInPandas`` batch iteration, typed nullable output schema, and the
partition-parallel execution shape (decode is per-row CPU work with zero
shuffles — the ideal Spark workload; executors stream parquet splits and
emit fixed-width metadata rows).

What is STUBBED (this container has no image/audio codecs): the actual
byte decoding. ``fake_decode`` derives deterministic pseudo-metadata from
the byte length — arithmetic an oracle can replicate — and
``real_decode`` raises ``NotImplementedError`` with the intended
PIL/soundfile/av wiring documented, so swapping in real codecs is a
one-function change.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        # image/video geometry; NULL for audio
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        # video only
        StructField("n_frames", IntegerType(), True),
        # audio only
        StructField("sample_rate", IntegerType(), True),
    ]
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pack each document's UTF-8 bytes as an opaque binary payload with a
    media_type derived from the id — the multimodal table shape
    (id, media_type, payload binary)."""
    mt = (
        F.when(F.col(id_col) % 3 == 0, F.lit(MEDIA_TYPES[0]))
        .when(F.col(id_col) % 3 == 1, F.lit(MEDIA_TYPES[1]))
        .otherwise(F.lit(MEDIA_TYPES[2]))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _make_fake_decode():
    # Factory-produced closure: cloudpickle ships closures BY VALUE, so the
    # decode function works on executors that can't import this package
    # (the engine is used as plain .py files, not an installed wheel —
    # a module-level def would pickle as an import reference and fail on
    # any worker whose sys.path lacks the repo root).
    def fake_decode(doc_id: int, media_type: str, payload: bytes) -> tuple:
        """Deterministic stand-in for codec decode: metadata derived purely
        from byte length (so a SQL oracle can verify the full pipeline)."""
        n = len(payload)
        if media_type == "image/png":
            return (doc_id, media_type, n, 64 + n % 577, 64 + (n * 31) % 433, None, None)
        if media_type == "audio/wav":
            return (doc_id, media_type, n, None, None, None, 8000 + (n % 5) * 8000)
        return (doc_id, media_type, n, 64 + n % 577, 64 + (n * 31) % 433, 1 + n % 240, None)

    return fake_decode


fake_decode = _make_fake_decode()


def real_decode(doc_id: int, media_type: str, payload: bytes) -> tuple:
    """Swap-in point for real codecs (not available in this container)."""
    raise NotImplementedError(
        "real decode needs codec libraries: PIL.Image.open(io.BytesIO(payload)) "
        "for images, soundfile.read for audio, av.open for video frame sampling; "
        "install them and pass decode_fn=real_decode"
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("nibble_hist", ArrayType(IntegerType()), False),
    ]
)


def extract_byte_features(df: DataFrame) -> DataFrame:
    """REAL feature extraction over the raw payload (no codec needed): a
    16-bin histogram of the high nibble of every byte — the shape of a
    codec-side feature extractor (numpy over Arrow-delivered bytes, zero
    copies, per-partition). Output: (doc_id, n_bytes, nibble_hist[16])."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # ships by value with the closure

        for pdf in batches:
            hists, sizes = [], []
            for p in pdf["payload"]:
                b = np.frombuffer(p, dtype=np.uint8)
                sizes.append(len(b))
                hists.append(np.bincount(b >> 4, minlength=16).astype("int32").tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bytes": sizes, "nibble_hist": hists}
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_media(df: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Resize stub with real byte plumbing: truncate each payload to
    ``max_bytes`` (a real resizer would decode → scale → re-encode; the
    byte-level dataflow — slice, re-emit, content-id — is identical).
    ``content_md5`` is md5 over the lowercase hex rendering so the oracle
    can reproduce it without blob functions."""
    truncated = F.expr(f"substring(payload, 1, {max_bytes})")
    return df.select(
        "doc_id",
        "media_type",
        F.least(F.length("payload"), F.lit(max_bytes)).cast("long").alias("n_bytes_out"),
        F.md5(F.lower(F.hex(truncated)).cast("binary")).alias("content_md5"),
    )


def sample_frames(df: DataFrame, frame_bytes: int = 256, every_n: int = 2) -> DataFrame:
    """Frame sampling over video payloads: split the byte stream into
    fixed-size frames, keep every ``every_n``-th, one output row per
    sampled frame — the explode shape of real video frame extraction
    (frame decode itself would replace the md5 content id)."""
    n_frames = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("int")
    idxs = F.expr(
        f"case when length(payload) = 0 then array() "
        f"else sequence(0, cast(ceil(length(payload) / {frame_bytes}) as int) - 1, {every_n}) end"
    )
    chunk = F.expr(f"substring(payload, frame_idx * {frame_bytes} + 1, {frame_bytes})")
    return (
        df.filter(F.col("media_type") == "video/mp4")
        .select("doc_id", "payload", F.explode(idxs).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.md5(F.lower(F.hex(chunk)).cast("binary")).alias("frame_md5"),
        )
    )


def decode_media(
    df: DataFrame, decode_fn: Callable[[int, str, bytes], tuple] = fake_decode
) -> DataFrame:
    """Decode binary payloads to typed metadata via Arrow-batched
    ``mapInPandas`` — per-partition, no shuffle; batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "sample_rate"]
        for pdf in batches:
            rows = [
                decode_fn(i, m, p)
                for i, m, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(rows, columns=cols)
            for c in ("width", "height", "n_frames", "sample_rate"):
                out[c] = out[c].astype("Int32")
            yield out

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
