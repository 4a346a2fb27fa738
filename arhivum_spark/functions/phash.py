"""64-bit DCT perceptual hash (pure numpy).

Classic pHash construction: grayscale -> area-mean resize to 32x32 -> 2-D
DCT-II -> top-left 8x8 low-frequency block (excluding the DC term for the
median) -> bit = coefficient > median. Robust to re-encoding and small
perturbations; used as the cheap verification key for LSH candidates
(the graft analogue of the reference's `verifyHash` recompute-and-compare,
HashService.java:151-154).
"""

from __future__ import annotations

import numpy as np

from arhivum_spark.functions.minhash import to_gray

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT = _dct_matrix(_N)


def _resize_area(gray: np.ndarray, out: int = _N) -> np.ndarray:
    """Area-mean resize to (out, out).

    Fast path: crop to a multiple of `out` and reshape-mean (sequential
    reads, vectorized). Fallback for images smaller than `out` or with a
    sub-tile remainder: `np.add.at` index binning (the scatter path is
    ~20x slower — measured dominating the whole signature kernel — so it
    is reserved for the rare ragged case).
    """
    h, w = gray.shape
    if h >= out and w >= out:
        bh, bw = h // out, w // out
        return (
            gray[: out * bh, : out * bw]
            .reshape(out, bh, out, bw)
            .mean(axis=(1, 3), dtype=np.float32)
        )
    ys = (np.arange(h) * out // h).clip(max=out - 1)
    xs = (np.arange(w) * out // w).clip(max=out - 1)
    acc = np.zeros((out, out), dtype=np.float64)
    cnt = np.zeros((out, out), dtype=np.float64)
    np.add.at(acc, (ys[:, None], xs[None, :]), gray)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    return acc / np.maximum(cnt, 1.0)


def phash64(pixels: np.ndarray) -> int:
    """(h, w, 3) uint8 pixels (or (h, w) precomputed gray) -> int64 hash."""
    small = _resize_area(to_gray(pixels) if pixels.ndim == 3 else pixels)
    coeffs = _DCT @ small @ _DCT.T
    block = coeffs[:8, :8].reshape(-1)
    med = np.median(block[1:])  # exclude DC
    bits = block > med
    sig = np.uint64(0)
    for j in np.nonzero(bits)[0]:
        sig |= np.uint64(1) << np.uint64(j)
    return int(sig.astype(np.int64))
