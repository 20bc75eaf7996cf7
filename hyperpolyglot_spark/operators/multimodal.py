"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (this container ships no image/audio libs):
``decode_image`` raises NotImplementedError unless a deterministic fake
decoder is requested. Everything Spark-side is real and tested — the
schema, the mapInPandas batch shape, the partition-friendly layout, and
the metadata/feature extraction — so swapping in PIL/torchaudio later
is a one-function change inside the UDF.

Layout stance for 100 TB of media: binary payloads live in their own
column so Parquet column pruning means metadata-only queries never read
the bytes; fan-out decode uses mapInPandas (per-batch, bounded memory)
rather than a scalar UDF so one task never materializes more than one
Arrow batch of payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int,"
    " sample_rate int, duration_ms int"
)

FEATURE_DIM = 16


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWxC uint8.

    STUB: real decoding needs an image library not present in this
    container. With fake=True returns a deterministic pseudo-image
    derived from the payload hash (same shape contract), so the full
    distributed pipeline is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library; "
            "re-run with fake=True for the deterministic stub"
        )
    d = hashlib.blake2b(payload, digest_size=48).digest()
    side = 4
    arr = np.frombuffer(d, dtype=np.uint8)[: side * side * 3]
    return arr.reshape(side, side, 3).copy()


def media_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake_decode: bool = True,
) -> DataFrame:
    """(id, byte_len, sha, feature vector) per media row via
    mapInPandas. Feature = per-channel means/stds of the (stub-)decoded
    pixels padded to FEATURE_DIM — the real extractor slots in here."""

    out_schema = (
        f"{id_col} long, byte_len long, sha string, features array<float>"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, shas, feats = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                ids.append(mid)
                lens.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                img = decode_image(b, fake=fake_decode)
                f = np.concatenate(
                    [img.mean(axis=(0, 1)), img.std(axis=(0, 1))]
                )
                f = np.pad(f, (0, FEATURE_DIM - len(f)))
                feats.append(f.astype(np.float32).tolist())
            yield pd.DataFrame(
                {id_col: ids, "byte_len": lens, "sha": shas, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)


def resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize of an HxWxC array — pure numpy index
    math (REAL, not stubbed: only the payload->array decode needs an
    external library). Matches the standard floor-scaling grid."""
    ih, iw = img.shape[0], img.shape[1]
    rows = np.arange(h) * ih // h
    cols = np.arange(w) * iw // w
    return img[rows][:, cols]


def media_resized(
    df: DataFrame,
    height: int,
    width: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake_decode: bool = True,
) -> DataFrame:
    """(id, height, width, pixels) with every image resized to a fixed
    target — the batch-shape normalization step before any ML featurize.
    Same mapInPandas boundary as media_features: one Arrow batch of
    payloads in flight per task, payload column pruned for metadata-only
    consumers."""
    out_schema = f"{id_col} long, height int, width int, pixels binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                img = decode_image(b, fake=fake_decode)
                ids.append(mid)
                pix.append(resize_image(img, height, width).tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "height": [height] * len(ids),
                    "width": [width] * len(ids),
                    "pixels": pix,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, out_schema)


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame_ts) —
    JVM-side sequence/explode, no Python. The decode of each frame is
    the same stubbed boundary as decode_image."""
    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
