"""Multimodal column operators (SURVEY.md §2.9 / north-star).

Media assets are opaque ``binary`` payloads plus typed metadata
(schema.MEDIA_SCHEMA). The Spark-side plumbing — schemas, Arrow batch
shape, ``mapInPandas`` signatures, partition sizing — is real and
tested; the actual image/audio decode is STUBBED because codec
libraries are not in this container:

- ``decode_stub="fake"``   → deterministic fake features (tests)
- ``decode_stub="raise"``  → NotImplementedError naming the needed lib

Design for 100 TB: payloads never shuffle — metadata extraction is a
narrow mapInPandas; anything aggregate-shaped first projects payload
OUT, so only small typed columns move. ``maxRecordsPerBatch`` bounds
Arrow batch memory when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
