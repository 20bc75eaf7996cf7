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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (palette intentionally unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_ppm(b: bytes) -> np.ndarray:
    """Netpbm binary decode (P6 RGB / P5 greyscale, 8-bit) — public
    format, header is ASCII tokens with '#' comments, then raw pixels."""
    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        tokens.append(b[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if b[:2] == b"P6" else 1
    arr = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=i)
    return arr.reshape(h, w, ch).copy()


def _unfilter_png(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (spec 9.2): vectorized None/Sub/Up
    (Sub is a per-lane prefix sum mod 256), per-pixel loops only for
    Average and Paeth, which have true sequential data dependencies."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft, row = int(rows[y, 0]), rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: prefix sum over pixels within each lane
            lanes = row.reshape(-1, bpp)
            rec = (np.cumsum(lanes, axis=0) % 256).reshape(stride)
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (a + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                bb = prev[x]
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = bb
                else:
                    pr = c
                rec[x] = (row[x] + pr) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
    return out


def _decode_png(b: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decode: 8-bit greyscale/RGB(+alpha),
    non-interlaced (the shapes a training-data pipeline normalizes to
    anyway). Palette and 16-bit stay NotImplementedError."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    i, w = 8, None
    idat = []
    while i + 8 <= len(b):
        (length,) = np.frombuffer(b, dtype=">u4", count=1, offset=i)
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + int(length)]
        if ctype == b"IHDR":
            w, h = (
                int(x) for x in np.frombuffer(data, dtype=">u4", count=2)
            )
            depth, color, _, _, interlace = data[8:13]
            if depth != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError("palette PNG not supported")
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + int(length)  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (w * ch + 1):
        raise ValueError("PNG pixel payload size mismatch")
    return _unfilter_png(raw, h, w * ch, ch).reshape(h, w, ch).copy()


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWxC uint8.

    REAL decode for the public stdlib-feasible formats: PNG (zlib
    inflate + numpy unfilter; 8-bit grey/RGB/RGBA, non-interlaced) and
    binary netpbm (P6/P5). Other formats (JPEG's DCT entropy coding
    needs a real imaging library this container doesn't ship) raise
    NotImplementedError unless fake=True, which returns a deterministic
    pseudo-image derived from the payload hash (same shape contract) so
    the full distributed pipeline stays testable end-to-end."""
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if not fake:
        raise NotImplementedError(
            "native decode covers PNG and binary netpbm; other formats "
            "need an imaging library (re-run with fake=True for the "
            "deterministic stub)"
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
