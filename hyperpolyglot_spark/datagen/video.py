"""Deterministic MJPEG-in-AVI video fixtures (round 6, VERDICT r5 #5).

Each doc_id yields a short greyscale clip whose frames are 8x8
BLOCK-CONSTANT with a unit quantization table: a constant block's DCT
has all its energy in the integer DC coefficient, so baseline JPEG
encode -> decode reproduces the pixels EXACTLY (no quantization loss).
That makes the clip the video analog of the PCM16 audio fixture: the
frozen oracle recomputes features from the RAW frames
(``synth_frames``) while the Spark query goes through the full
container-parse -> per-frame JPEG decode path — the round-trip is
byte-exact by construction, so any mismatch is a real parser/decoder
bug, never codec loss.

The JPEG encoder here is written from the public ITU-T T.81 spec
(baseline sequential, greyscale, custom canonical Huffman tables: 12
four-bit DC category codes and a single one-bit AC EOB code — legal
tables, and sufficient because block-constant frames have zero AC
coefficients). The AVI container follows the public RIFF/AVI layout:
LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf BITMAPINFO)),
LIST movi with one '00dc' chunk per frame.
"""

from __future__ import annotations

import struct

import numpy as np

WIDTH = 16
HEIGHT = 16
N_FRAMES = 6
FPS = 10  # -> dwMicroSecPerFrame = 100_000


def synth_frames(doc_id: int) -> list[np.ndarray]:
    """N_FRAMES greyscale (HEIGHT, WIDTH) uint8 frames, 8x8
    block-constant, integer math only. Frame-to-frame block drift is
    the planted 'motion' the feature extractor must measure."""
    frames = []
    for f in range(N_FRAMES):
        img = np.zeros((HEIGHT, WIDTH), dtype=np.uint8)
        bi = 0
        for by in range(0, HEIGHT, 8):
            for bx in range(0, WIDTH, 8):
                v = ((doc_id * 37 + f * 11 + bi * 53) % 224) + 16
                img[by : by + 8, bx : bx + 8] = v
                bi += 1
        frames.append(img)
    return frames


# ----------------------------------------------------------------------
# minimal from-spec baseline JPEG encoder (greyscale, unit quant)
# ----------------------------------------------------------------------

# canonical Huffman: DC = 12 category symbols, all 4-bit codes
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
# AC = single EOB symbol (0x00) with a 1-bit code — all ACs are zero
_AC_BITS = [1] + [0] * 15
_AC_VALS = [0x00]


def _canonical_codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_mjpeg_frame(img: np.ndarray) -> bytes:
    """Baseline greyscale JPEG of an 8x8 BLOCK-CONSTANT image with a
    unit quant table — exact by construction (DC-only blocks)."""
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT q=1
    out += _seg(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )  # SOF0: 1 component, 1x1 sampling, quant table 0
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            v = int(img[by, bx])
            dc = 8 * (v - 128)  # orthonormal DCT DC of a constant block
            diff = dc - prev_dc
            prev_dc = dc
            mag = abs(diff)
            t = mag.bit_length()
            code, length = _DC_CODES[t]
            bw.write(code, length)
            if t:
                bits = diff if diff > 0 else diff + (1 << t) - 1
                bw.write(bits, t)
            code, length = _AC_CODES[0x00]  # EOB: all ACs zero
            bw.write(code, length)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------------
# AVI container (public RIFF layout)
# ----------------------------------------------------------------------

def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def synth_avi(doc_id: int) -> bytes:
    """MJPEG AVI clip for ``doc_id``: N_FRAMES '00dc' JPEG frames."""
    frames = [encode_mjpeg_frame(f) for f in synth_frames(doc_id)]
    usec = 1_000_000 // FPS
    avih = struct.pack(
        "<10I4I",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, WIDTH, HEIGHT,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        FPS, 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, WIDTH, HEIGHT, 1, 24, 0, 0, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
