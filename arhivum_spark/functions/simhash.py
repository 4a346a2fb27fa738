"""SimHash over caption tokens (pure numpy kernels).

64-bit SimHash: each token hashes to 64 bits (blake2b, deterministic across
processes — no PYTHONHASHSEED dependence); the signature bit j is the sign of
the sum over tokens of (+1 if bit j set else -1). Near-duplicate captions
differ in a few tokens => small Hamming distance. The Hamming check itself
stays JVM-side in Spark (`bit_count(simhash_a ^ simhash_b)`), only signature
computation is Python (Arrow-batched).
"""

from __future__ import annotations

import hashlib

import numpy as np

_BITS = np.arange(64, dtype=np.uint64)


def token_hash64(token: str) -> int:
    """Stable 64-bit token hash (blake2b-8)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )


def simhash64(tokens: list[str]) -> int:
    """Signed int64 SimHash of a token sequence (empty -> 0)."""
    if not tokens:
        return 0
    hashes = np.array([token_hash64(t) for t in tokens], dtype=np.uint64)
    bits = (hashes[:, None] >> _BITS[None, :]) & np.uint64(1)  # (n, 64)
    votes = bits.sum(axis=0) * 2 - len(tokens)  # (+1/-1 majority)
    sig = np.uint64(0)
    for j in np.nonzero(votes > 0)[0]:
        sig |= np.uint64(1) << np.uint64(j)
    return int(sig.astype(np.int64))


def simhash_batch(captions: list[str]) -> np.ndarray:
    """SimHash for a batch of captions -> (n,) int64 (whitespace tokenized)."""
    return np.array(
        [simhash64(c.split() if c else []) for c in captions], dtype=np.int64
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
