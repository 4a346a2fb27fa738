"""SimHash over caption tokens (pure numpy kernels).

64-bit SimHash (Charikar, STOC'02): each token hashes to 64 bits; signature
bit j is the sign of the sum over tokens of (+1 if bit j set else -1).
Near-duplicate captions differ in a few tokens => small Hamming distance.
The Hamming check itself stays JVM-side in Spark
(`bit_count(simhash_a ^ simhash_b)`), only signature computation is Python
(Arrow-batched).

Token hash = splitmix64(polynomial-in-bytes mod 2^64) — the same
deterministic, PYTHONHASHSEED-free scheme as the MinHash gram kernel
(operators/dedup_text._gram_hash_batch), so the whole batch hashes in one
vectorized pass over the concatenated byte buffer (the round-2 kernel was
per-caption Python with a per-token hashlib call — the exact
row-at-a-time class the gram kernel fix removed). `simhash64` remains the
scalar reference implementation; tests assert the batch kernel matches it
bit-for-bit.

Tokenization contract: ASCII whitespace (space/tab/LF/CR/VT/FF), runs
collapsed. This is NARROWER than str.split(), which also treats
\x1c-\x1f and unicode spaces as separators — the byte-scan kernel owns
the contract; tests tokenize with the same class.
"""

from __future__ import annotations

import numpy as np

from arhivum_spark.functions.tokens import (
    splitmix64_np as _splitmix64_np,  # re-exported; tests import it here
    token_hashes_batch,
)

_BITS = np.arange(64, dtype=np.uint64)
_POLY_B = 0x100000001B3  # odd multiplier, wraps mod 2^64
_MASK64 = (1 << 64) - 1
# ~2 MB bit-matrix bound per chunk: numpy temporaries must stay
# cache-resident at 32-way parallelism (docs/ENGINEERING_NOTES.md)
_CHUNK_TOKENS = 4096


def _splitmix64_int(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & _MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    return z ^ (z >> 31)


def token_hash64(token: str) -> int:
    """Stable 64-bit token hash — scalar reference for the batch kernel.

    hash = splitmix64(sum_i byte_i * B^i mod 2^64), identical to the
    vectorized path's per-token polynomial.
    """
    h, p = 0, 1
    for byte in token.encode("utf-8"):
        h = (h + byte * p) & _MASK64
        p = (p * _POLY_B) & _MASK64
    return _splitmix64_int(h)


def simhash64(tokens: list[str]) -> int:
    """Signed int64 SimHash of a token sequence (empty -> 0) — scalar
    reference implementation (tests assert simhash_batch matches it)."""
    if not tokens:
        return 0
    hashes = np.array([token_hash64(t) for t in tokens], dtype=np.uint64)
    bits = (hashes[:, None] >> _BITS[None, :]) & np.uint64(1)  # (n, 64)
    # signed accumulation: uint64 votes would underflow for minority bits
    # (the round-2 kernel had exactly that bug — bit set iff 2*ones != n)
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(tokens)
    sig = np.uint64(0)
    for j in np.nonzero(votes > 0)[0]:
        sig |= np.uint64(1) << np.uint64(j)
    return int(sig.astype(np.int64))


def simhash_batch(captions: list[str]) -> np.ndarray:
    """SimHash for a whole Arrow batch -> (n,) int64, in ONE numpy pass.

    Token boundaries, polynomial token hashes, and per-doc bit votes are
    all computed over the concatenated byte buffer (reduceat for the
    segment sums); the (tokens x 64) vote matrix is chunked along doc
    boundaries so temporaries stay L3-resident.
    """
    n_docs = len(captions)
    out = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        return out
    # tokenization + token hashing: the ONE shared byte-scan kernel
    # (functions/tokens.py — doc boundaries from per-doc lengths, NUL-safe)
    tok_hash, _doc_of_tok, n_tok = token_hashes_batch(captions)
    if len(tok_hash) == 0:
        return out
    tok_offsets = np.concatenate(([0], np.cumsum(n_tok)))

    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        while (
            d1 < n_docs
            and tok_offsets[d1 + 1] - tok_offsets[d0] <= _CHUNK_TOKENS
        ):
            d1 += 1
        t0, t1 = int(tok_offsets[d0]), int(tok_offsets[d1])
        if t1 > t0:
            bits = (
                (tok_hash[t0:t1, None] >> _BITS[None, :]) & np.uint64(1)
            ).astype(np.int64)
            # reduceat offsets must be strictly valid: zero-token docs are
            # DROPPED from the segment list (their offset would duplicate a
            # neighbor's — or, for a trailing empty doc, equal len(bits)
            # and corrupt the previous doc's segment when clipped) and
            # their output stays 0; results scatter back via `present`.
            nchunk = n_tok[d0:d1]
            present = np.flatnonzero(nchunk > 0)
            seg = (tok_offsets[d0:d1] - t0)[present]
            ones = np.add.reduceat(bits, seg, axis=0)
            sig_bits = 2 * ones > nchunk[present, None]
            packed = (sig_bits.astype(np.uint64) << _BITS[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[d0 + present] = packed.view(np.int64)
        d0 = d1
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")
