"""Multimodal column operators (SURVEY.md §2.9 / north-star).

Media assets are opaque ``binary`` payloads plus typed metadata
(schema.MEDIA_SCHEMA). The Spark-side plumbing — schemas, Arrow batch
shape, ``mapInPandas`` signatures, partition sizing — is real and
tested. Decode status:

- **audio: REAL** — ``decode_wav`` is a stdlib-only RIFF/WAVE chunk
  walker + PCM16 sample decoder (struct + numpy, no codec libs), fed
  by genuine WAV payloads from ``wav_from_documents``.
- **image: REAL** — ``decode_bmp`` is a stdlib-only Windows BMP
  (BITMAPINFOHEADER, 24-bit) parser that honors bottom-up row order
  and 4-byte row padding, fed by genuine BMP payloads from
  ``bmp_from_documents``; ``resize_bmp`` is a real nearest-neighbor
  resize over the decoded pixel grid (numpy), re-encoded as BMP.
- **video: REAL** — ``parse_avi`` is a stdlib-only uncompressed-AVI
  reader (recursive RIFF LIST walk, 24-bit DIB frame decode) fed by
  genuine AVI payloads from ``avi_from_documents``;
  ``sample_avi_frames`` does stride frame-sampling with timestamps
  from the container's own dwMicroSecPerFrame.
- compressed formats (JPEG/PNG/MP4/H.264): STUBBED (PIL/ffmpeg are
  not in this container): ``decode_stub="fake"`` → deterministic
  fake output (tests); ``decode_stub="raise"`` → NotImplementedError
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

# --- Real image decode: stdlib Windows BMP (24-bit) parser ------------------


def _bmp_bytes(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array as a standard bottom-up
    24-bit Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER). Rows
    are padded to 4-byte boundaries exactly as the format requires,
    so parsers must handle both the padding and the row flip."""
    h, w, _ = pixels.shape
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)
    body = b"".join(pixels[y].tobytes() + pad for y in range(h - 1, -1, -1))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_header + info + body


def parse_bmp(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse one 24-bit BMP payload → (width, height, bpp, pixels).

    A real (if minimal) BMP reader: validates the 'BM' magic, reads
    both headers, honors the pixel-array offset, strips per-row
    padding, and un-flips bottom-up storage (positive biHeight) so
    the returned (h, w, 3) array is in logical top-down order with
    components in stored (B, G, R) order. stdlib+numpy only — this is
    the decode kernel itself, not a stub."""
    if len(payload) < 54 or payload[0:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    header_size, w, h_raw = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if header_size < 40 or planes != 1 or compression != 0:
        raise ValueError("unsupported BMP variant")
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}-bit")
    h, bottom_up = abs(h_raw), h_raw > 0
    row_stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_stride, offset=data_offset
    ).reshape(h, row_stride)[:, : w * 3]
    pixels = raw.reshape(h, w, 3)
    if bottom_up:
        pixels = pixels[::-1]
    return w, h, bpp, np.ascontiguousarray(pixels)


BMP_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bits_per_pixel", LongType()),
        StructField("n_pixels", LongType()),
        StructField("sum_c0", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
        StructField("weighted_sum", LongType()),
        StructField("peak", LongType()),
    ]
)


def decode_bmp(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas image decode: BMP header fields + exact integer
    pixel stats per asset. ``weighted_sum`` weights each component by
    its logical top-down linear index k = (y*w + x)*3 + c, so a
    parser that mishandles row order or padding produces a different
    number even when the plain channel sums collide. All stats stay
    integral — order-independent and oracle-exact; payloads never
    leave their partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in BMP_STATS_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf[payload_col]):
                w, h, bpp, px = parse_bmp(bytes(payload))
                flat = px.reshape(-1).astype(np.int64)
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["bits_per_pixel"].append(bpp)
                rows["n_pixels"].append(w * h)
                for c in range(3):
                    rows[f"sum_c{c}"].append(int(flat[c::3].sum()))
                rows["weighted_sum"].append(
                    int((flat * np.arange(len(flat), dtype=np.int64)).sum())
                )
                rows["peak"].append(int(flat.max()) if len(flat) else 0)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


def resize_bmp(
    df: DataFrame,
    width: int = 4,
    height: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize: parse the BMP, nearest-neighbor sample the
    pixel grid (out pixel (X, Y) ← in pixel (X*w // W, Y*h // H) —
    the floor-index convention an oracle can replicate exactly),
    re-encode as BMP. Pure stdlib+numpy; 1 row → 1 row; payloads stay
    partition-local."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "media_type": [], "width": [], "height": [], "resized": []}
            for aid, mtype, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf[payload_col]
            ):
                w, h, _, px = parse_bmp(bytes(payload))
                xs = (np.arange(width) * w) // width
                ys = (np.arange(height) * h) // height
                out["asset_id"].append(aid)
                out["media_type"].append(mtype)
                out["width"].append(width)
                out["height"].append(height)
                out["resized"].append(_bmp_bytes(px[np.ix_(ys, xs)]))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)


def bmp_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize genuine 24-bit BMP payloads from the documents
    fixture: per doc, a (doc_id % 7 + 2) × (doc_id % 5 + 2) image
    whose component at logical linear index k is
    (doc_id*17 + k*29) mod 256. Standard BMP encoding (bottom-up,
    padded rows) makes the parser walk real structure; the recurrence
    makes every decoded stat recomputable exactly in the DuckDB
    oracle via generate_series."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "media_type": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 5 + 2, did % 7 + 2
                k = np.arange(h * w * 3, dtype=np.int64)
                px = ((did * 17 + k * 29) % 256).astype(np.uint8).reshape(h, w, 3)
                out["asset_id"].append(did)
                out["media_type"].append("image")
                out["payload"].append(_bmp_bytes(px))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        run,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("media_type", StringType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )

# --- Real video frame-sampling: stdlib uncompressed AVI (RIFF) parser -------

AVI_US_PER_FRAME = 40_000  # 25 fps


def _avi_bytes(frames: np.ndarray, us_per_frame: int = AVI_US_PER_FRAME) -> bytes:
    """Serialize an (nf, h, w, 3) uint8 array as a standard
    uncompressed AVI: RIFF 'AVI ' → LIST hdrl (avih + LIST strl with
    'vids'/'DIB ' headers) → LIST movi with one '00db' DIB chunk per
    frame (bottom-up rows, 4-byte padded — the same layout as BMP
    pixel arrays). A real container: parsers must recurse into LIST
    chunks and honor sizes/alignment to find the frames."""
    nf, h, w, _ = frames.shape
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)
    dibs = [
        b"".join(f[y].tobytes() + pad for y in range(h - 1, -1, -1)) for f in frames
    ]
    frame_size = h * row_stride

    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, frame_size * 1_000_000 // us_per_frame, 0, 0,
        nf, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ", 0, 0, 0, 0, us_per_frame, 1_000_000, 0, nf,
        frame_size, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    return struct.pack("<4sI", b"RIFF", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def parse_avi(payload: bytes) -> tuple[int, int, int, list[np.ndarray]]:
    """Parse one uncompressed AVI payload → (width, height,
    us_per_frame, frames), each frame an (h, w, 3) top-down array.

    A real (if minimal) AVI reader: validates RIFF/'AVI ' magic,
    recursively walks LIST chunks honoring sizes + word alignment,
    reads geometry from 'avih', requires 24-bit uncompressed 'strf',
    and un-flips each bottom-up padded '00db' DIB frame. stdlib+numpy
    only — this is the decode kernel itself, not a stub."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    geo: dict = {}
    dibs: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type
            elif cid == b"avih":
                us, _, _, _, nf, _, _, _, w, h = struct.unpack(
                    "<10I", payload[body_start : body_start + 40]
                )
                geo.update(us_per_frame=us, n_frames=nf, w=w, h=h)
            elif cid == b"strf":
                bpp = struct.unpack("<H", payload[body_start + 14 : body_start + 16])[0]
                compression = struct.unpack(
                    "<I", payload[body_start + 16 : body_start + 20]
                )[0]
                if bpp != 24 or compression != 0:
                    raise ValueError("only uncompressed 24-bit AVI supported")
            elif cid == b"00db":
                dibs.append(payload[body_start : body_start + size])
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, 8 + struct.unpack("<I", payload[4:8])[0])
    if not geo or not dibs:
        raise ValueError("missing avih/movi content")
    w, h = geo["w"], geo["h"]
    row_stride = (w * 3 + 3) & ~3
    frames = [
        np.ascontiguousarray(
            np.frombuffer(d, dtype=np.uint8, count=h * row_stride)
            .reshape(h, row_stride)[:, : w * 3]
            .reshape(h, w, 3)[::-1]
        )
        for d in dibs
    ]
    return w, h, geo["us_per_frame"], frames


VIDEO_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_px", LongType()),
        StructField("weighted_sum", LongType()),
        StructField("peak", LongType()),
    ]
)


def sample_avi_frames(
    df: DataFrame, stride: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """REAL video frame sampling: parse the AVI container, keep every
    ``stride``-th frame, emit exact integer pixel stats per sampled
    frame (1 video row → ceil(nf/stride) frame rows). frame_ts_ms
    comes from the container's dwMicroSecPerFrame — real timing
    metadata, not an assumed constant. The index-weighted checksum
    makes frame-order or row-flip mistakes observable. Payloads stay
    partition-local; only small typed rows leave the operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in VIDEO_FRAME_STATS_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf[payload_col]):
                w, h, us, frames = parse_avi(bytes(payload))
                for idx in range(0, len(frames), stride):
                    flat = frames[idx].reshape(-1).astype(np.int64)
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(idx * us // 1000)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_px"].append(int(flat.sum()))
                    rows["weighted_sum"].append(
                        int((flat * np.arange(len(flat), dtype=np.int64)).sum())
                    )
                    rows["peak"].append(int(flat.max()))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, VIDEO_FRAME_STATS_SCHEMA)


def avi_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize genuine uncompressed AVI payloads from the documents
    fixture: per doc, nf = doc_id % 4 + 2 frames of (doc_id % 5 + 2) ×
    (doc_id % 3 + 2) pixels whose component at logical linear index k
    in frame f is (doc_id*23 + f*101 + k*29) mod 256. Standard AVI
    encoding makes the parser walk real nested-LIST structure; the
    recurrence makes every sampled-frame stat recomputable exactly in
    the DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "media_type": [], "payload": []}
            for did in pdf["doc_id"]:
                did = int(did)
                nf, w, h = did % 4 + 2, did % 3 + 2, did % 5 + 2
                k = np.arange(h * w * 3, dtype=np.int64)
                frames = np.stack(
                    [
                        ((did * 23 + f * 101 + k * 29) % 256)
                        .astype(np.uint8)
                        .reshape(h, w, 3)
                        for f in range(nf)
                    ]
                )
                out["asset_id"].append(did)
                out["media_type"].append("video")
                out["payload"].append(_avi_bytes(frames))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        run,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("media_type", StringType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )

ENERGY_FRAME = 20  # samples per energy frame


def audio_frame_energy(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Windowed audio analysis: decode the WAV, split PCM into fixed
    ENERGY_FRAME-sample frames, emit per-frame exact integer energy
    (Σ s²) and peak — the decode→window→feature chain a speech
    pipeline runs before VAD/embedding. 1 row → ceil(n/frame) rows;
    stats are integers so the oracle is exact; payloads stay
    partition-local."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("n_samples", LongType()),
            StructField("energy", LongType()),
            StructField("peak_abs", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in schema.fields}
            for aid, payload in zip(pdf["asset_id"], pdf[payload_col]):
                _, _, _, samples = parse_wav(bytes(payload))
                s64 = samples.astype(np.int64)
                for f in range(0, len(s64), ENERGY_FRAME):
                    chunk = s64[f : f + ENERGY_FRAME]
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(f // ENERGY_FRAME)
                    rows["n_samples"].append(len(chunk))
                    rows["energy"].append(int((chunk * chunk).sum()))
                    rows["peak_abs"].append(int(np.abs(chunk).max()))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema)
