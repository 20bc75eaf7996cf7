"""Deterministic synthetic audio payloads (RIFF/WAVE PCM16 mono).

The driver testdata carries no audio column, so the audio query
synthesizes payloads from doc_id — the same trick canonical_url_dedup
uses for URLs. Samples are pure integer math (Knuth multiplicative
hash), so the oracle can recompute the exact decoded waveform without
touching the WAV container: the query then verifies BOTH the RIFF
encode/decode round-trip and the feature math.
"""

from __future__ import annotations

import struct

import numpy as np

RATE = 16_000


def synth_samples(doc_id: int) -> np.ndarray:
    """int16 mono waveform, 400..800 samples, deterministic."""
    n = 400 + (doc_id % 5) * 100
    k = np.arange(n, dtype=np.uint64)
    v = (np.uint64(doc_id + 1) * (k + np.uint64(1)) * np.uint64(2654435761)) % np.uint64(
        65536
    )
    return (v.astype(np.int64) - 32768).astype(np.int16)


def synth_wav(doc_id: int) -> bytes:
    """The samples wrapped as a minimal RIFF/WAVE PCM16 mono file."""
    body = synth_samples(doc_id).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, RATE, RATE * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
