"""MinHash over pixel-block shingles (pure numpy kernels).

The reference's set fingerprint is "SHA-256 of the sorted member hashes"
(CodeProjectScannerService.java:221-254) — order-invariant but all-or-nothing.
MinHash is its LSH-able generalization: E[signature agreement] = Jaccard of
the shingle sets (docs/shared/CODE_DETECTION.md:216-256 documents the true
Jaccard this estimates), so near-duplicate images survive re-encoding and
small pixel perturbations.

Shingling: grayscale -> block x block tiles -> the four quadrant means of
each tile quantized by gray_qstep (default 32) -> shingle id =
(tile_index << 32) | (4 quantized levels packed 8 bits each). Position is
part of the shingle so Jaccard == fraction of unchanged tiles; the coarse
quantization absorbs lossy-codec noise, and the four-level packing keeps
random-pair collisions ~p^4 (see block_shingles). Images smaller than one
block get content-dependent per-pixel shingles in a disjoint marker space
— never a shared constant (two different tiny images must not hash
identical).

All kernels are vectorized numpy; Spark-side use is via mapInPandas in
functions/signatures.py (no per-row Python at the DataFrame level).
"""

from __future__ import annotations

import numpy as np

MERSENNE_P = (1 << 31) - 1


def permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash coefficients (a, b) for k permutations, seeded.

    31-bit Mersenne-prime family: products of two 31-bit values fit a
    uint64 exactly, so the hash is ~6 vectorized ops with no 128-bit limb
    splitting (the 61-bit variant cost 10+ large temporaries per batch and
    dominated the signature kernel). Within-set collision odds at ~10^3
    shingles/image are ~1e-4 per permutation — noise far below the k=128
    estimator's own sigma.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.int64)
    return a, b


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) float32 luma (ITU-R 601 weights).

    Deliberately BLAS-free (a matmul triggers multithreaded BLAS inside
    every pandas-UDF worker — nested-threading thrash at 32-way process
    parallelism) and copy-light: uint8 slices upcast per-op, no full
    float32 pixel copy. The signature kernel is memory-bandwidth-bound at
    high parallelism on one box, so every avoided temporary is throughput.
    """
    gray = pixels[..., 0] * np.float32(0.299)
    gray += pixels[..., 1] * np.float32(0.587)
    gray += pixels[..., 2] * np.float32(0.114)
    return gray


def block_shingles(pixels: np.ndarray, block: int = 8, qstep: int = 32) -> np.ndarray:
    """Pixel-block shingle ids for one image: (n_tiles,) int64, deduplicated.

    Shingle = tile index + the packed quantized means of the tile's four
    quadrants (block/2 x block/2 each). A single whole-tile mean is too
    low-entropy: random tile means concentrate near 128 with sigma ~9, so
    coarse levels collide on ~30% of tiles between UNRELATED images, which
    inflates random-pair Jaccard to ~0.2 and floods LSH with candidate
    edges (measured: 25 candidate edges/image at 20k rows — quadratic
    death at 10^12). Four quadrant levels multiply the per-tile entropy
    (collision ~= p^4), pushing random-pair Jaccard to ~0.02 while the
    coarse qstep keeps lossy-codec noise (quadrant-mean sigma ~0.6 at
    encode qstep 8) inside one level for most quadrants.

    Tiles that don't fill a full block (ragged edges) are dropped — at the
    target scale images are >> block size, and signature config is pinned so
    both sides of any comparison drop the same tiles.

    Images smaller than one block in either dimension have no tiles;
    falling back to a shared sentinel would give EVERY sub-block image an
    identical signature (Jaccard 1.0 between a 4x4 black and a 4x4 white
    image — a false merge). Instead they shingle per PIXEL in a disjoint
    marker space (bit 62 set): shingle = marker | (pixel_index << 8) |
    quantized_level. A zero-pixel image gets its own distinct sentinel
    (bit 61) — minhash_batch requires a non-empty set.
    """
    gray = to_gray(pixels) if pixels.ndim == 3 else pixels
    h, w = gray.shape
    half = block // 2
    th, tw = h // block, w // block
    if th == 0 or tw == 0:
        if gray.size == 0:
            return np.array([np.int64(1) << 61], dtype=np.int64)
        lv = np.minimum(gray / qstep, 255).astype(np.int64).reshape(-1)
        pos = np.arange(lv.size, dtype=np.int64)
        return np.unique((np.int64(1) << 62) | (pos << 8) | lv)
    quads = gray[: th * block, : tw * block].reshape(th, 2, half, tw, 2, half)
    qmeans = quads.mean(axis=(2, 5))  # (th, 2, tw, 2)
    levels = np.minimum(qmeans / qstep, 255).astype(np.int64)
    packed = (
        (levels[:, 0, :, 0] << 24)
        | (levels[:, 0, :, 1] << 16)
        | (levels[:, 1, :, 0] << 8)
        | levels[:, 1, :, 1]
    )  # (th, tw)
    idx = np.arange(th * tw, dtype=np.int64)
    return np.unique((idx << 32) | packed.reshape(-1))


def minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(m,) shingles x (k,) coefficients -> (k,) int32 signature (31-bit
    hash space — see minhash_batch's int32 note)."""
    return minhash_batch([shingles], a, b)[0]


def minhash_batch(
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash for a batch of shingle sets -> (n, k) int64.

    Flattens all sets into one vectorized hash pass, then segment-min —
    one numpy kernel per Arrow batch instead of per row.
    """
    if not shingle_sets:
        return np.empty((0, len(a)), dtype=np.int32)
    # int32 on purpose: 31-bit hash space means every signature value fits,
    # and signature arrays ride through every shuffle/checkpoint — half the
    # bytes of int64 end to end
    out = np.empty((len(shingle_sets), len(a)), dtype=np.int32)
    # Process sets in small chunks so the (k, n_shingles) hash matrix and
    # its temporaries stay cache-resident: hashing a whole 256-row Arrow
    # batch at once materializes ~40 MB x several temporaries per batch —
    # pure DRAM traffic that throttles 32-way parallelism on one box.
    chunk = 16
    for c0 in range(0, len(shingle_sets), chunk):
        sets = shingle_sets[c0 : c0 + chunk]
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        # reduceat silently returns the NEXT set's first hash for an empty
        # segment (and raises IndexError on a trailing one) — an empty
        # shingle set is a caller bug, fail loudly instead of corrupting
        # the signature
        if not (lens > 0).all():
            raise ValueError(
                "minhash_batch: empty shingle set at batch index "
                f"{c0 + int(np.argmin(lens > 0))}; callers must substitute "
                "a sentinel shingle for empty inputs"
            )
        flat = np.concatenate(sets).astype(np.uint64)
        hm = _universal_hash(flat, a, b)  # (k, chunk_total)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out[c0 : c0 + chunk] = np.minimum.reduceat(hm, offsets, axis=1).T
    return out


def _universal_hash(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*(x mod p) + b) mod p for p = 2^31-1, exact in uint64.

    31-bit operands keep a*x < 2^62, so the Mersenne reduction is two
    shift-and-mask folds (2^31 === 1 mod p) — no limb splitting.
    """
    p = np.uint64(MERSENNE_P)
    s = np.uint64(31)
    x = x.astype(np.uint64) % p
    a = a.astype(np.uint64)
    v = a[:, None] * x[None, :]
    v += b.astype(np.uint64)[:, None]
    hi = v >> s
    v &= p
    v += hi
    hi = v >> s  # second fold, reusing buffers (in-place: bandwidth)
    v &= p
    v += hi
    np.subtract(v, p, out=v, where=v >= p)
    return v


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing signature positions — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))
