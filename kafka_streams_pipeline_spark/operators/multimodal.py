"""Multimodal column operators (SURVEY.md §2.9 / north-star).

Media assets are opaque ``binary`` payloads plus typed metadata
(schema.MEDIA_SCHEMA). The Spark-side plumbing — schemas, Arrow batch
shape, ``mapInPandas`` signatures, partition sizing — is real and
tested. Decode status:

- **audio: REAL** — ``decode_wav`` is a stdlib-only RIFF/WAVE chunk
  walker + PCM16 sample decoder (struct + numpy, no codec libs), fed
  by genuine WAV payloads from ``wav_from_documents``.
- image resize / video frame-sample: STUBBED (PIL/ffmpeg are not in
  this container): ``decode_stub="fake"`` → deterministic fake
  output (tests); ``decode_stub="raise"`` → NotImplementedError
  naming the needed lib.

Design for 100 TB: payloads never shuffle — metadata extraction is a
narrow mapInPandas; anything aggregate-shaped first projects payload
OUT, so only small typed columns move. ``maxRecordsPerBatch`` bounds
Arrow batch memory when payloads are large.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("feat_mean", DoubleType()),  # decoded-feature summary
        StructField("feat_dim", LongType()),
    ]
)


def binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-JVM metadata over opaque binary: byte length + md5.
    No Python, no decode — the cheap 'what is this blob' pass."""
    return df.select(
        "asset_id",
        "media_type",
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder: md5-seeded pseudo
    features. Keeps every pipeline stage testable without codecs."""
    h = hashlib.md5(payload).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    decode_stub: str = "fake",
    feat_dim: int = 8,
    max_records_per_batch: int = 64,
) -> DataFrame:
    """mapInPandas feature extraction over media payloads.

    Real deployments replace ``_fake_features`` with PIL/librosa/
    ffmpeg decode + model features; the Arrow batching, schema, and
    partition behavior here are exactly what that code inherits.
    """
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records_per_batch)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires PIL/librosa/ffmpeg — not in this "
                    "container; pass decode_stub='fake' for the test path"
                )
            feats = pdf[payload_col].map(
                lambda b: _fake_features(bytes(b), feat_dim)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "payload_md5": pdf[payload_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat_mean": feats.map(lambda v: sum(v) / len(v)),
                    "feat_dim": feat_dim,
                }
            )

    return df.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 4,
    height: int = 4,
    payload_col: str = "payload",
    decode_stub: str = "fake",
) -> DataFrame:
    """mapInPandas image resize (1 row → 1 row, payload-sized output).

    Real deployments: PIL decode → resize → re-encode. The stub emits
    a deterministic width×height byte grid derived from the payload
    md5, so schema, batch shape and partition behavior are the real
    thing. Payloads stay partition-local — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image resize requires PIL — not in this container; "
                    "pass decode_stub='fake' for the test path"
                )
            n = width * height

            def fake_resize(b: bytes) -> bytes:
                h = hashlib.md5(bytes(b)).digest()
                return (h * (n // len(h) + 1))[:n]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "resized": pdf[payload_col].map(fake_resize),
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 3,
    frame_interval_ms: int = 1000,
    payload_col: str = "payload",
    decode_stub: str = "fake",
) -> DataFrame:
    """mapInPandas frame sampling (1 video row → N frame rows).

    Real deployments: ffmpeg keyframe extraction. The stub emits
    ``n_frames`` deterministic md5-derived frames per asset,
    exercising the row-expanding Arrow batch shape (the part that
    actually bites at scale: output rows ≫ input rows, so
    maxRecordsPerBatch must bound the INPUT side)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "frame sampling requires ffmpeg — not in this container; "
                    "pass decode_stub='fake' for the test path"
                )
            out = {"asset_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for aid, payload in zip(pdf["asset_id"], pdf[payload_col]):
                for i in range(n_frames):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * frame_interval_ms)
                    out["frame"].append(
                        hashlib.md5(bytes(payload) + bytes([i])).digest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


# --- Real audio decode: stdlib RIFF/WAVE parser -----------------------------

WAV_SAMPLE_RATE = 8000


def _wav_bytes(samples: np.ndarray, sample_rate: int, with_list_chunk: bool) -> bytes:
    """Serialize int16 mono samples as a standard RIFF/WAVE file.
    ``with_list_chunk`` inserts a LIST metadata chunk before `data`
    (as real encoders do) so decoders must actually walk chunks."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    extra = b""
    if with_list_chunk:
        info = b"INFOISFT" + struct.pack("<I", 6) + b"kspsp\x00"
        extra = struct.pack("<4sI", b"LIST", len(info)) + info
    body = b"WAVE" + fmt + extra + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def parse_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse one RIFF/WAVE payload → (channels, rate, bits, samples).

    A real (if minimal) WAV reader: validates the RIFF/WAVE magic,
    walks the chunk list honoring sizes + word alignment (so LIST/
    fact/bext chunks are skipped, not tripped over), and decodes the
    PCM16 little-endian data chunk. stdlib+numpy only — this is the
    decode kernel itself, not a stub."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    channels = rate = bits = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[0:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAVE format code {audio_fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only PCM16 supported, got {bits}-bit")
    return channels, rate, bits, np.frombuffer(data, dtype="<i2")


WAV_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("peak_abs", LongType()),
        StructField("sum_samples", LongType()),
    ]
)


def decode_wav(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas audio decode: RIFF header fields + exact integer
    PCM stats per asset. Stats stay integral (peak, sum) so every
    downstream derivation (mean, dBFS) is order-independent and
    oracle-exact; payloads never leave their partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in WAV_STATS_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf[payload_col]):
                channels, rate, bits, samples = parse_wav(bytes(payload))
                s64 = samples.astype(np.int64)
                rows["asset_id"].append(aid)
                rows["n_channels"].append(channels)
                rows["sample_rate"].append(rate)
                rows["bits_per_sample"].append(bits)
                rows["n_samples"].append(len(samples))
                rows["duration_ms"].append(len(samples) * 1000 // rate)
                rows["peak_abs"].append(
                    int(np.abs(s64).max()) if len(samples) else 0
                )
                rows["sum_samples"].append(int(s64.sum()))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, WAV_STATS_SCHEMA)


def wav_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize genuine PCM16 WAV payloads from the documents
    fixture: per doc, n = doc_id % 50 + 10 samples of the integer
    recurrence s_i = ((doc_id*31 + i*7) mod 65536) − 32768. The
    payloads are standard WAV files (every 4th carries a LIST chunk so
    chunk-walking is exercised); the recurrence makes the decoded
    stats recomputable exactly in the DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 50 + 10
                i = np.arange(n, dtype=np.int64)
                samples = (did * 31 + i * 7) % 65536 - 32768
                out["asset_id"].append(did)
                out["payload"].append(
                    _wav_bytes(samples, WAV_SAMPLE_RATE, with_list_chunk=did % 4 == 0)
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        run,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media-shaped frame from the documents fixture (text
    bytes as payload) — deterministic, no new data generation."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
