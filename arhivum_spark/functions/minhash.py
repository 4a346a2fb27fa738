"""MinHash over pixel-block shingles (pure numpy kernels).

The reference's set fingerprint is "SHA-256 of the sorted member hashes"
(CodeProjectScannerService.java:221-254) — order-invariant but all-or-nothing.
MinHash is its LSH-able generalization: E[signature agreement] = Jaccard of
the shingle sets (docs/shared/CODE_DETECTION.md:216-256 documents the true
Jaccard this estimates), so near-duplicate images survive re-encoding and
small pixel perturbations.

Shingling: grayscale -> block x block tiles -> per-tile mean quantized by
gray_qstep -> shingle id = (tile_index << 8) | quantized_level. Position is
part of the shingle so Jaccard == fraction of unchanged tiles; the coarse
quantization absorbs lossy-codec noise (step q=8 shifts a 64-pixel tile mean
by sigma ~0.3, far below gray_qstep=16).

All kernels are vectorized numpy; Spark-side use is via mapInPandas in
functions/signatures.py (no per-row Python at the DataFrame level).
"""

from __future__ import annotations

import numpy as np

MERSENNE_P = (1 << 61) - 1


def permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients (a, b) for k permutations, seeded."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.int64)
    return a, b


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) float32 luma (ITU-R 601 weights)."""
    return (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    ).astype(np.float32)


def block_shingles(pixels: np.ndarray, block: int = 8, qstep: int = 16) -> np.ndarray:
    """Pixel-block shingle ids for one image: (n_tiles,) int64, deduplicated.

    Tiles that don't fill a full block (ragged edges) are dropped — at the
    target scale images are >> block size, and signature config is pinned so
    both sides of any comparison drop the same tiles.
    """
    gray = to_gray(pixels)
    h, w = gray.shape
    th, tw = h // block, w // block
    if th == 0 or tw == 0:
        return np.array([0], dtype=np.int64)
    tiles = gray[: th * block, : tw * block].reshape(th, block, tw, block)
    means = tiles.mean(axis=(1, 3))  # (th, tw)
    levels = np.minimum(means / qstep, 255).astype(np.int64)
    idx = np.arange(th * tw, dtype=np.int64)
    return np.unique((idx << 8) | levels.reshape(-1))


def minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(m,) shingles x (k,) coefficients -> (k,) int64 signature."""
    return minhash_batch([shingles], a, b)[0]


def minhash_batch(
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash for a batch of shingle sets -> (n, k) int64.

    Flattens all sets into one vectorized hash pass, then segment-min —
    one numpy kernel per Arrow batch instead of per row.
    """
    if not shingle_sets:
        return np.empty((0, len(a)), dtype=np.int64)
    lens = np.array([len(s) for s in shingle_sets])
    flat = np.concatenate(shingle_sets).astype(np.uint64)
    k = len(a)
    hm = _universal_hash(flat, a, b)  # (k, total), exact uint64 Mersenne mod
    sig = np.empty((len(shingle_sets), k), dtype=np.int64)
    off = 0
    for i, n in enumerate(lens):
        sig[i] = hm[:, off : off + n].min(axis=1)
        off += n
    return sig


def _universal_hash(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod 2^61-1 computed exactly in uint64 arithmetic.

    Split a*x into 128-bit via 32-bit limbs, then Mersenne-fold: for
    p = 2^61-1, (hi*2^64 + lo) mod p == (hi*8 + lo) folded by repeated
    (v >> 61) + (v & p).
    """
    x = x.astype(np.uint64)
    a = a.astype(np.uint64)
    p = np.uint64(MERSENNE_P)
    a_lo = a & np.uint64(0xFFFFFFFF)
    a_hi = a >> np.uint64(32)
    x_lo = x & np.uint64(0xFFFFFFFF)
    x_hi = x >> np.uint64(32)
    # a*x = a_hi*x_hi*2^64 + (a_hi*x_lo + a_lo*x_hi)*2^32 + a_lo*x_lo
    ll = a_lo[:, None] * x_lo[None, :]
    lh = a_lo[:, None] * x_hi[None, :]
    hl = a_hi[:, None] * x_lo[None, :]
    hh = a_hi[:, None] * x_hi[None, :]
    mid = lh + hl
    lo = ll + ((mid & np.uint64(0xFFFFFFFF)) << np.uint64(32))
    carry = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> np.uint64(32)) + carry
    # fold 128-bit (hi, lo) mod 2^61-1: 2^64 ≡ 8 (mod p)
    v = (lo & p) + (lo >> np.uint64(61)) + (hi << np.uint64(3) & p) + (
        hi >> np.uint64(58)
    )
    v = (v & p) + (v >> np.uint64(61))
    v = (v & p) + (v >> np.uint64(61))
    v = v + b.astype(np.uint64)[:, None]
    v = (v & p) + (v >> np.uint64(61))
    v = np.where(v == p, np.uint64(0), v)
    return v.astype(np.int64)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing signature positions — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))
