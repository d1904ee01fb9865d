"""64-bit DCT perceptual hash (classic pHash) in pure numpy.

Pipeline: grayscale → 32x32 area-average resample → 32x32 DCT-II →
top-left 8x8 low-frequency block → threshold at the median (DC term
excluded from the median) → 64 bits packed into a signed int64 (Spark
LongType-compatible; the bit pattern is what matters).

Used by the graft for: Z-order clustering key (phash, w, h), near-dup
detection via Hamming distance, and pHash verification after
re-encode (BASELINE.json north_star).
"""

from __future__ import annotations

import numpy as np

from medalforge_lakehouse_data_spark.functions.codec import _dct_matrix

_D32 = _dct_matrix(32)


def _to_gray(pixels: np.ndarray) -> np.ndarray:
    if pixels.ndim == 3:
        return pixels.astype(np.float32).mean(axis=2)
    return pixels.astype(np.float32)


def _resize_area_32(g: np.ndarray) -> np.ndarray:
    """Area-average resample to 32x32 (integral-image based, any size)."""
    h, w = g.shape
    if h < 32 or w < 32:
        # nearest-neighbor upsample first
        ri = (np.arange(max(32, h)) * h // max(32, h)).clip(0, h - 1)
        ci = (np.arange(max(32, w)) * w // max(32, w)).clip(0, w - 1)
        g = g[ri][:, ci]
        h, w = g.shape
    # integral image for exact box sums at fractional-free integer edges
    re = np.linspace(0, h, 33).astype(np.int64)
    ce = np.linspace(0, w, 33).astype(np.int64)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
    sums = (
        ii[re[1:], :][:, ce[1:]]
        - ii[re[:-1], :][:, ce[1:]]
        - ii[re[1:], :][:, ce[:-1]]
        + ii[re[:-1], :][:, ce[:-1]]
    )
    areas = (re[1:] - re[:-1])[:, None] * (ce[1:] - ce[:-1])[None, :]
    return (sums / areas).astype(np.float32)


_FLAT_STD = 1.0  # low-freq energy floor; typical images are in the hundreds


def phash64(pixels: np.ndarray) -> int:
    """Perceptual hash of a decoded image → Python int (int64 range).

    Flat/ultra-low-contrast images get the canonical hash 0: their DCT
    block is numerical noise (~1e-4), so median-thresholding would turn
    codec rounding into random bits and any tiny perturbation would flip
    half the hash. The 0 hash makes all flat images mutual duplicates,
    which is the behavior dedup pipelines want for blank frames."""
    small = _resize_area_32(_to_gray(pixels))
    d = _D32 @ small @ _D32.T
    low = d[:8, :8].flatten()
    spread = np.std(low[1:])
    if spread < _FLAT_STD:
        return 0
    med = np.median(low[1:])
    # Noise margin: for smooth images most AC coefficients are ~0 and the
    # median sits in the codec-noise floor — a raw (low > med) comparison
    # turns rounding noise into coin-flip bits. Requiring coefficients to
    # clear the median by 2% of the block's spread makes near-zero
    # coefficients stably 0 while leaving substantial ones untouched.
    # the absolute floor (3.0) covers lossy-codec quantization noise on
    # sparse-spectrum images where one big coefficient dwarfs the spread
    bits = (low > med + max(0.02 * spread, 3.0)).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:  # 64 iterations, negligible
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = (a.astype(np.int64).view(np.uint64)) ^ (b.astype(np.int64).view(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
