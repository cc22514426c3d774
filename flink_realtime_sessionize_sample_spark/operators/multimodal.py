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

Two decode tiers:

* ``real_decode`` — REAL stdlib binary parsers: PNG signature/IHDR walk
  with CRC verification, RIFF/WAVE chunk walk, recursive ISO-BMFF box walk
  (mvhd/tkhd). They parse any spec-conforming file; paired with
  ``attach_real_media`` (which synthesizes valid PNG/WAV/MP4 bytes from
  doc_id formulas) the full encode → Arrow → parse round trip is
  oracle-checked (``multimodal_decode_real``). Full pixel/sample decoding
  would still need PIL/soundfile/av — header/metadata extraction is the
  part a 100 TB triage pass actually runs per object.
* ``fake_decode`` — byte-length-derived pseudo-metadata for the oracle
  tier that exercises arbitrary (non-media) payloads.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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


def _make_media_builders():
    """Stdlib encoders for three REAL container formats — valid PNG
    (zlib-compressed IDAT, correct CRCs), RIFF/WAVE PCM, and minimal
    ISO-BMFF MP4 (ftyp + moov{mvhd, trak{tkhd}} + mdat). Factory-produced
    closures so they pickle BY VALUE into executor-side mapInPandas (a
    module-level def would pickle as an import reference and fail on
    workers whose sys.path lacks the repo root)."""
    import struct
    import zlib

    def png_chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def build_png(width: int, height: int) -> bytes:
        """Valid 8-bit grayscale PNG: signature, IHDR, one zlib IDAT of
        filter-0 scanlines (deterministic gradient pixels), IEND."""
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        raw = b"".join(
            b"\x00" + bytes(((x + y) % 251 for x in range(width)))
            for y in range(height)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + png_chunk(b"IHDR", ihdr)
            + png_chunk(b"IDAT", zlib.compress(raw, 6))
            + png_chunk(b"IEND", b"")
        )

    def build_wav(sample_rate: int, n_samples: int) -> bytes:
        """Valid RIFF/WAVE, PCM 16-bit mono: canonical fmt + data chunks
        with a deterministic sawtooth payload."""
        data = struct.pack(
            f"<{n_samples}h", *(((i * 97) % 2048) - 1024 for i in range(n_samples))
        )
        fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
        riff_body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    def mp4_box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    def build_mp4(width: int, height: int, n_frames: int, fps: int = 24) -> bytes:
        """Minimal valid ISO-BMFF: ftyp; moov with mvhd v0 (timescale=fps,
        duration=n_frames → duration/timescale = seconds) and trak/tkhd v0
        (width/height as 16.16 fixed point); mdat with n_frames byte-stub
        samples."""
        mvhd = mp4_box(
            b"mvhd",
            struct.pack(">B3x", 0)                       # version 0, flags
            + struct.pack(">IIIII", 0, 0, fps, n_frames, 0x00010000)  # ctime mtime timescale duration rate
            + struct.pack(">H2x8x36xI24x", 0x0100, 2),    # volume, matrix pad, next_track_id
        )
        tkhd = mp4_box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII4xI", 0, 0, 1, 0, n_frames)  # ctime mtime track_id rsvd duration
            + b"\x00" * 52                                    # rsvd/layer/volume/matrix
            + struct.pack(">II", width << 16, height << 16),
        )
        moov = mp4_box(b"moov", mvhd + mp4_box(b"trak", tkhd))
        ftyp = mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        mdat = mp4_box(b"mdat", bytes((i % 251 for i in range(n_frames))))
        return ftyp + moov + mdat

    return build_png, build_wav, build_mp4


build_png, build_wav, build_mp4 = _make_media_builders()


def _make_real_decode():
    """REAL stdlib binary parsers (no codec libraries needed): PNG signature
    + IHDR walk with CRC verification, RIFF/WAVE chunk walk to `fmt `, and a
    recursive ISO-BMFF box walk to moov/mvhd + trak/tkhd. They parse any
    spec-conforming file of these formats, not just our builders' output
    (pixel/sample DECODING would still need PIL/soundfile/av — metadata
    extraction is the part a 100 TB triage pass actually runs). Factory
    closure for by-value pickling (see _make_media_builders)."""
    import struct
    import zlib

    def parse_png(p: bytes) -> tuple:
        if p[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("bad PNG signature")
        (n,) = struct.unpack(">I", p[8:12])
        tag, body = p[12:16], p[16:16 + n]
        (crc,) = struct.unpack(">I", p[16 + n:20 + n])
        if tag != b"IHDR":
            raise ValueError("first PNG chunk must be IHDR")
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError("IHDR CRC mismatch")
        w, h = struct.unpack(">II", body[:8])
        return int(w), int(h)

    def parse_wav(p: bytes) -> int:
        if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            raise ValueError("bad RIFF/WAVE header")
        off = 12
        while off + 8 <= len(p):
            tag = p[off:off + 4]
            (n,) = struct.unpack("<I", p[off + 4:off + 8])
            if tag == b"fmt ":
                (rate,) = struct.unpack("<I", p[off + 12:off + 16])
                return int(rate)
            off += 8 + n + (n & 1)  # RIFF chunks are word-aligned
        raise ValueError("no fmt chunk")

    def walk_boxes(p: bytes, start: int, end: int):
        off = start
        while off + 8 <= end:
            (n,) = struct.unpack(">I", p[off:off + 4])
            if n < 8:
                raise ValueError("bad box size")
            yield p[off + 4:off + 8], off + 8, off + n
            off += n

    def parse_mp4(p: bytes) -> tuple:
        width = height = n_frames = None
        for tag, s, e in walk_boxes(p, 0, len(p)):
            if tag != b"moov":
                continue
            for t2, s2, e2 in walk_boxes(p, s, e):
                if t2 == b"mvhd":
                    version = p[s2]
                    base = s2 + 4 + (8 if version == 1 else 0)
                    timescale, duration = struct.unpack(
                        ">II", p[base + 8:base + 16]
                    ) if version == 0 else (
                        struct.unpack(">I", p[base + 16:base + 20])[0],
                        struct.unpack(">Q", p[base + 20:base + 28])[0],
                    )
                    if timescale <= 0:
                        raise ValueError("bad mvhd timescale")
                    n_frames = int(duration)  # our builders: 1 unit = 1 frame
                elif t2 == b"trak":
                    for t3, s3, e3 in walk_boxes(p, s2, e2):
                        if t3 == b"tkhd":
                            w_fp, h_fp = struct.unpack(">II", p[e3 - 8:e3])
                            width, height = w_fp >> 16, h_fp >> 16
        if n_frames is None:
            raise ValueError("no moov/mvhd box")
        return width, height, n_frames

    def real_decode(doc_id: int, media_type: str, payload: bytes) -> tuple:
        n = len(payload)
        if media_type == "image/png":
            w, h = parse_png(payload)
            return (doc_id, media_type, n, w, h, None, None)
        if media_type == "audio/wav":
            return (doc_id, media_type, n, None, None, None, parse_wav(payload))
        if media_type == "video/mp4":
            w, h, frames = parse_mp4(payload)
            return (doc_id, media_type, n, w, h, frames, None)
        raise NotImplementedError(f"no parser for media_type {media_type!r}")

    return real_decode


real_decode = _make_real_decode()


def attach_real_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL media payloads (valid PNG / WAV / minimal MP4 bytes)
    with geometry derived from doc_id by portable integer formulas — so a
    SQL oracle can predict what the real parsers must extract:

    - ``id % 3 == 0`` → PNG,  width = 16 + id % 32, height = 16 + (id*7) % 32
    - ``id % 3 == 1`` → WAV,  sample_rate = 8000 + (id % 5) * 4000
    - ``id % 3 == 2`` → MP4,  width/height as PNG, n_frames = 1 + id % 60

    Encoding runs in Arrow-batched ``mapInPandas`` — per-partition, zero
    shuffle, the same execution shape as a real transcode pass."""
    build_png_, build_wav_, build_mp4_ = build_png, build_wav, build_mp4
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def make(i: int) -> tuple:
            if i % 3 == 0:
                return ("image/png", build_png_(16 + i % 32, 16 + (i * 7) % 32))
            if i % 3 == 1:
                return ("audio/wav", build_wav_(8000 + (i % 5) * 4000, 64))
            return ("video/mp4", build_mp4_(16 + i % 32, 16 + (i * 7) % 32, 1 + i % 60))

        for pdf in batches:
            made = [make(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": [m for m, _ in made],
                    "payload": [p for _, p in made],
                }
            )

    return docs.select(id_col).mapInPandas(run, schema=schema)


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
