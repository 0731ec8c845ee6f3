"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata. The Spark
side — schemas, partition-friendly batch iteration, Arrow batch shapes, UDF
signatures — is real and tested; the actual codec calls are STUBBED because
no image/audio libraries ship in this container:

- ``extract_binary_meta``: real (byte length, sha256, magic-byte sniff).
- ``decode_image`` / ``extract_audio_features`` / ``sample_video_frames``:
  deterministic fakes behind ``allow_stub=True``, else NotImplementedError —
  swap the marked inner function for PIL/ffmpeg on a real cluster; the
  surrounding mapInPandas plumbing does not change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]


def _sniff(payload: bytes) -> str:
    for magic, mime in _MAGIC:
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


META_SCHEMA_FIELDS = [
    StructField("n_bytes", LongType(), True),
    StructField("sha256", StringType(), True),
    StructField("mime", StringType(), True),
]


def extract_binary_meta(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """(id, n_bytes, sha256, mime) via mapInPandas — streams Arrow batches,
    never loads more than one batch of payloads per worker."""
    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [StructField(id_col, by_name[id_col].dataType, True)] + META_SCHEMA_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Arrow may surface binary cells as uint8 ndarrays — normalize.
            payloads = pdf[payload_col].map(
                lambda b: bytes(b) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "mime": payloads.map(
                        lambda b: _sniff(b) if b is not None else None
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


IMAGE_FEATURES_SCHEMA_FIELDS = [
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("features", ArrayType(DoubleType()), True),
]


def decode_image_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_size: tuple[int, int] | None = (32, 32),
    feature_dim: int = 8,
    allow_stub: bool = True,
) -> DataFrame:
    """(id, width, height, features[feature_dim]) — decode + resize +
    feature-extract. The decode step is the marked stub; everything around it
    (schema, batching, vectorized feature math) is production-shaped.
    ``target_size=None`` means no resize: native (mixed) per-image sizes,
    exercising the per-row fallback a real decoder needs."""
    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [StructField(id_col, by_name[id_col].dataType, True)]
        + IMAGE_FEATURES_SCHEMA_FIELDS
    )

    def _decode(payload: bytes) -> np.ndarray:
        # STUB — replace with PIL.Image.open(...) [+ .resize(target_size)
        # when set] on a cluster with imaging libraries installed.
        if not allow_stub:
            raise NotImplementedError("image decoding requires PIL/opencv")
        digest = hashlib.sha256(payload).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        if target_size is None:  # "native" size, deterministic per payload
            size = (16 + digest[4] % 17, 16 + digest[5] % 17)
        else:
            size = target_size
        return rng.randint(0, 256, (*size, 3)).astype(np.uint8)

    def _frame_feats(frame: np.ndarray) -> np.ndarray:
        flat = frame.astype(np.float64).mean(axis=2).reshape(-1)
        pools = np.array_split(flat, feature_dim)
        return np.array([p.mean() for p in pools]) / 255.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            decoded = [_decode(bytes(p)) for p in pdf[payload_col]]
            # Decode is one codec call per payload (irreducible). A real
            # decoder without a resize step returns mixed (H, W) shapes;
            # mirroring the audio path, the batched math runs only on
            # uniform batches (this stub resizes, and so do real image
            # pipelines) and mixed shapes fall back to per-row pooling with
            # per-row width/height — same split boundaries either way, so
            # values are bit-identical between the two paths.
            shapes = {img.shape for img in decoded}
            if len(shapes) == 1:
                imgs = np.stack(decoded).astype(np.float64)
                flat = imgs.mean(axis=3).reshape(len(imgs), -1)
                pools = np.array_split(flat, feature_dim, axis=1)
                feats = list(
                    np.stack([p.mean(axis=1) for p in pools], axis=1) / 255.0
                )
                widths = np.full(len(imgs), imgs.shape[2], dtype=np.int32)
                heights = np.full(len(imgs), imgs.shape[1], dtype=np.int32)
            else:
                feats = [_frame_feats(img) for img in decoded]
                widths = np.array([img.shape[1] for img in decoded], np.int32)
                heights = np.array([img.shape[0] for img in decoded], np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": widths,
                    "height": heights,
                    "features": feats,
                },
                columns=[f.name for f in schema.fields],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


AUDIO_FEATURES_SCHEMA_FIELDS = [
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_s", DoubleType(), True),
    StructField("features", ArrayType(DoubleType()), True),
]


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    feature_dim: int = 8,
    allow_stub: bool = True,
) -> DataFrame:
    """(id, sample_rate, duration_s, features[feature_dim]) — decode +
    band-energy feature extraction. The decode step is the marked stub
    (soundfile/librosa on a real cluster); the batched Arrow plumbing and
    vectorized pooled-energy math are the production shape."""
    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [StructField(id_col, by_name[id_col].dataType, True)]
        + AUDIO_FEATURES_SCHEMA_FIELDS
    )

    def _decode(payload: bytes) -> tuple[np.ndarray, int]:
        # STUB — replace with soundfile.read(io.BytesIO(payload)) on a
        # cluster with audio libraries installed.
        if not allow_stub:
            raise NotImplementedError("audio decoding requires soundfile/librosa")
        digest = hashlib.sha256(payload).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        sr = 16_000
        return rng.uniform(-1.0, 1.0, sr // 4).astype(np.float64), sr

    def _row_feats(samples: np.ndarray) -> list[float]:
        pools = np.array_split(samples, feature_dim)
        return [float(np.sqrt(np.mean(p**2))) for p in pools]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            decoded = [_decode(bytes(p)) for p in pdf[payload_col]]
            # Real decoders return variable-length clips; when the batch is
            # uniform (fixed-duration corpora, and this stub) the pooled-RMS
            # math runs ONCE per Arrow batch — same split boundaries as the
            # per-row path, so values are bit-identical. Mixed lengths fall
            # back to per-row pooling (the decode still dominates there).
            lengths = {len(s) for s, _ in decoded}
            if len(lengths) == 1:
                S = np.stack([s for s, _ in decoded])
                pools = np.array_split(S, feature_dim, axis=1)
                feats = [
                    list(row)
                    for row in np.stack(
                        [np.sqrt(np.mean(p**2, axis=1)) for p in pools], axis=1
                    )
                ]
            else:
                feats = [_row_feats(s) for s, _ in decoded]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "sample_rate": np.array([sr for _, sr in decoded], dtype=np.int32),
                    "duration_s": np.array(
                        [len(s) / sr for s, sr in decoded], dtype=np.float64
                    ),
                    "features": feats,
                },
                columns=[f.name for f in schema.fields],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_frames: int = 4,
    allow_stub: bool = True,
) -> DataFrame:
    """(id, frame_idx, frame) — evenly sample frames from a video payload.
    Frame extraction is the marked stub (ffmpeg on a real cluster); the
    exploded one-row-per-frame shape is the real contract downstream
    (per-frame decode -> features joins back on (id, frame_idx))."""
    by_name = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [
            StructField(id_col, by_name[id_col].dataType, True),
            StructField("frame_idx", IntegerType(), True),
            StructField("frame", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if not allow_stub:
                    raise NotImplementedError("video decoding requires ffmpeg")
                # STUB — deterministic byte slices standing in for frames.
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    rows.append(
                        {
                            id_col: rid,
                            "frame_idx": i,
                            "frame": data[i * step : (i + 1) * step] or b"\x00",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, payload_col).mapInPandas(run, schema)
