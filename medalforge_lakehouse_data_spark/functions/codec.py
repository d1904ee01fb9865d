"""Deterministic numpy image codecs (raw + lossy block-DCT).

The sandbox has no Pillow/OpenCV, so the engine owns its codec — the
role image decode plays in the BASELINE.json north_star ("decode,
re-encode, pHash verification ... PSNR>=40dB for lossy"). Two formats:

  raw   MFR1: zlib-compressed uint8 HxWxC — bit-exact roundtrip
  lossy MFL1: 8x8 block DCT, JPEG-style quantization at high quality,
              int16 coefficients, zlib — PSNR well above 40 dB

All math is vectorized numpy over whole images (batched 8x8 blocks via
matmul broadcasting); these kernels run inside Arrow-batched pandas
UDFs, never per-row Python at the Spark layer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_RAW = b"MFR1"
MAGIC_LOSSY = b"MFL1"

# Standard JPEG luminance quantization table (public domain, ITU T.81 Annex K)
_JPEG_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: D @ x applies DCT along axis 0."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0, :] = np.sqrt(1.0 / n)
    return d.astype(np.float32)


_D8 = _dct_matrix(8)


def _quant_table(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_JPEG_Q * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.float32)


# Default zlib level per format. Measured on 64x64x3 images: for the
# lossy format's quantized DCT coefficients level 6 costs 1770us/image
# vs 284us at level 1 for only ~3% more bytes — the coefficient entropy
# is mostly irreducible, so heavy deflate buys nothing. Raw pixels DO
# deflate well, so raw keeps 6. The level is not in the header
# (inflate is level-agnostic); override per table with the
# codec.zlib-level property (maintenance/transcode.py).
ZLEVEL_RAW = 6
ZLEVEL_LOSSY = 1


def encode_raw(pixels: np.ndarray, zlevel: int = ZLEVEL_RAW) -> bytes:
    """pixels: uint8 array (h, w, c) or (h, w)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    payload = zlib.compress(
        np.ascontiguousarray(pixels, dtype=np.uint8).tobytes(), zlevel)
    return MAGIC_RAW + struct.pack("<HHH", h, w, c) + payload


def encode_lossy(pixels: np.ndarray, quality: int = 96,
                 zlevel: int = ZLEVEL_LOSSY) -> bytes:
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    ph, pw = (-h) % 8, (-w) % 8
    x = np.pad(
        pixels.astype(np.float32) - 128.0,
        ((0, ph), (0, pw), (0, 0)),
        mode="edge",
    )
    H, W = x.shape[:2]
    q = _quant_table(quality)
    # (H/8, W/8, 8, 8, c) batched blocks; DCT via broadcast matmul
    blocks = x.reshape(H // 8, 8, W // 8, 8, c).transpose(0, 2, 4, 1, 3)
    coeffs = _D8 @ blocks @ _D8.T
    quant = np.round(coeffs / q).astype(np.int16)
    payload = zlib.compress(quant.tobytes(), zlevel)
    return MAGIC_LOSSY + struct.pack("<HHHB", h, w, c, quality) + payload


def decode(data: bytes) -> np.ndarray:
    """Decode either format → uint8 (h, w, c)."""
    magic = bytes(data[:4])
    if magic == MAGIC_RAW:
        h, w, c = struct.unpack("<HHH", data[4:10])
        arr = np.frombuffer(zlib.decompress(data[10:]), dtype=np.uint8)
        return arr.reshape(h, w, c)
    if magic == MAGIC_LOSSY:
        h, w, c, quality = struct.unpack("<HHHB", data[4:11])
        H, W = h + ((-h) % 8), w + ((-w) % 8)
        quant = np.frombuffer(zlib.decompress(data[11:]), dtype=np.int16).reshape(
            H // 8, W // 8, c, 8, 8
        )
        q = _quant_table(quality)
        blocks = _D8.T @ (quant.astype(np.float32) * q) @ _D8
        x = blocks.transpose(0, 3, 1, 4, 2).reshape(H, W, c)
        return np.clip(np.round(x + 128.0), 0, 255).astype(np.uint8)[:h, :w, :]
    raise ValueError(f"unknown image magic {magic!r}")


def encode(pixels: np.ndarray, fmt: str, quality: int = 96,
           zlevel: int | None = None) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels, ZLEVEL_RAW if zlevel is None else zlevel)
    if fmt == "lossy":
        return encode_lossy(pixels, quality,
                            ZLEVEL_LOSSY if zlevel is None else zlevel)
    raise ValueError(f"unknown format {fmt!r} (expected raw|lossy)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
