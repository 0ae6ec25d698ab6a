"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Engine analog of the reference's raster ingest (PDF → PIL image,
invoicenet/acp/data.py:244; image-file branch gui/extractor.py:433-436).
The container has no image/audio libraries, so the *decode* step is stubbed
— either a clearly-marked NotImplementedError (real-codec path) or a
deterministic fake decoder (testing path) — while all Spark-side plumbing is
real and tested: schemas, mapInPandas batch shape, partition sizing, and the
vectorized UDF signatures a real decoder would drop into.

Schema convention:
    media(media_id long, kind string, payload binary,
          meta struct<width int, height int, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

DECODED_SCHEMA = "media_id long, kind string, shape array<int>, checksum string"
RESIZED_SCHEMA = "media_id long, width int, height int, checksum string"
FRAMES_SCHEMA = "media_id long, frame_idx int, checksum string"

REAL_CODECS = False  # flipped if PIL/soundfile ever appear in the image


def _fake_decode(payload: bytes, kind: str, meta) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → ndarray whose values are
    a pure function of the bytes (so pipelines are testable end-to-end).
    A real implementation replaces this with PIL/libsndfile/pyav."""
    if REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("real codecs not available in this image")
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    if kind == "image":
        h = int(meta["height"] or 8)
        w = int(meta["width"] or 8)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if kind == "audio":
        n = int(meta["sample_rate"] or 8000) // 100
        return (rng.standard_normal(n) * 0.1).astype(np.float32)
    if kind == "video":
        n = int(meta["n_frames"] or 4)
        return rng.integers(0, 256, size=(n, 4, 4, 3), dtype=np.uint8)
    raise ValueError(f"unknown media kind: {kind}")


def _checksum(arr: np.ndarray) -> str:
    return hashlib.md5(arr.tobytes()).hexdigest()[:16]


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode + feature extraction: binary → (shape, checksum).
    Batch shape: iterator of pandas frames; one decode per row but all
    numpy inside — the Arrow boundary is the only Python crossing."""

    def run(batches):
        for pdf in batches:
            shapes, sums = [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                arr = _fake_decode(bytes(payload), kind, meta)
                shapes.append(list(arr.shape))
                sums.append(_checksum(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "shape": shapes,
                    "checksum": sums,
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_images(media: DataFrame, width: int = 4, height: int = 4) -> DataFrame:
    """Image resize via stride sampling (stand-in for a real resampler;
    deterministic, so downstream fixtures can pin checksums)."""

    def run(batches):
        for pdf in batches:
            out = []
            for payload, kind, meta, mid in zip(
                pdf["payload"], pdf["kind"], pdf["meta"], pdf["media_id"]
            ):
                if kind != "image":
                    continue
                arr = _fake_decode(bytes(payload), kind, meta)
                ys = np.linspace(0, arr.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, arr.shape[1] - 1, width).astype(int)
                small = arr[np.ix_(ys, xs)]
                out.append((int(mid), width, height, _checksum(small)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "checksum"])

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: every k-th frame → (frame_idx, checksum)."""

    def run(batches):
        for pdf in batches:
            out = []
            for payload, kind, meta, mid in zip(
                pdf["payload"], pdf["kind"], pdf["meta"], pdf["media_id"]
            ):
                if kind != "video":
                    continue
                arr = _fake_decode(bytes(payload), kind, meta)
                for i in range(0, arr.shape[0], every):
                    out.append((int(mid), i, _checksum(arr[i])))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "checksum"])

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def synthetic_media(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Deterministic media fixture rows (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        meta = {
            "width": 8 if kind == "image" else None,
            "height": 6 if kind == "image" else None,
            "sample_rate": 8000 if kind == "audio" else None,
            "n_frames": 6 if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
