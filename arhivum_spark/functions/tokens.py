"""Shared vectorized tokenizer + token-hash kernel (ONE implementation).

This is the contract-critical byte-scan both Arrow batch kernels build on
(functions/simhash.simhash_batch and operators/dedup_text._gram_hash_batch
previously carried bit-identical private copies — a silent-drift risk for
the cross-engine tokenization contract). The contract, stated once:

TOKENIZATION: a token is a maximal run of non-whitespace bytes, where
whitespace is exactly the six ASCII separators space/tab/LF/VT/FF/CR
(0x20, 0x09-0x0D — all single bytes in UTF-8, so the vectorized byte scan
handles them for free). Runs of separators collapse; there are no empty
tokens. NARROWER than Python str.split(): \\x1c-\\x1f and Unicode-only
spaces (NBSP, EM SPACE, ...) are NOT separators.

TOKEN HASH: splitmix64(sum_i byte_i * B^i mod 2^64) with B = 0x100000001B3
(odd, wraps mod 2^64) — deterministic, PYTHONHASHSEED-free; scalar
reference is functions/simhash.token_hash64, and the property tests
(tests/test_property_kernels.py) assert batch/scalar agreement.

Doc boundaries come from per-doc encoded LENGTHS, not a sentinel byte: an
embedded NUL (legal in Spark strings) hashes as an ordinary token
character and must not shift later docs' boundaries.
"""

from __future__ import annotations

import numpy as np

POLY_B = np.uint64(0x100000001B3)  # odd multiplier, wraps mod 2^64


def splitmix64_np(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set) —
    full-avalanche mixing of 64-bit lanes, wrapping uint64 arithmetic."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def token_hashes_batch(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize + hash a whole Arrow batch in ONE numpy pass.

    Returns ``(tok_hash, doc_of_tok, n_tok_per_doc)``:
      - ``tok_hash``: uint64 hash per token, all docs concatenated in
        document order (tokens of doc d are contiguous);
      - ``doc_of_tok``: int64 doc index per token;
      - ``n_tok_per_doc``: int64 token count per doc (len == len(texts)).

    ``None`` texts are treated as "" (zero tokens).
    """
    n_docs = len(texts)
    empty = (
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.int64),
        np.zeros(n_docs, dtype=np.int64),
    )
    if n_docs == 0:
        return empty
    enc = [("" if t is None else t).encode() for t in texts]
    lengths = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n_docs)
    arr = np.frombuffer(b"".join(enc), dtype=np.uint8)
    is_sep = (
        (arr == 32) | (arr == 9) | (arr == 10) | (arr == 13)
        | (arr == 11) | (arr == 12)
    )
    nonsep = ~is_sep
    if not nonsep.any():
        return empty

    prev_sep = np.empty(len(arr), dtype=bool)
    prev_sep[0] = True
    prev_sep[1:] = is_sep[:-1]
    doc_starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    prev_sep[doc_starts[lengths > 0]] = True  # tokens never span docs
    tok_start = nonsep & prev_sep  # first char of every token
    doc_of_char = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)

    # token hashes: polynomial over bytes, wrapped mod 2^64
    idx = np.flatnonzero(nonsep)
    starts = np.flatnonzero(tok_start)
    tok_of_char = np.cumsum(tok_start)[idx] - 1  # token id per nonsep char
    pos_in_tok = idx - starts[tok_of_char]
    max_len = int(pos_in_tok.max()) + 1
    pow_table = np.empty(max_len, dtype=np.uint64)
    pow_table[0] = 1
    if max_len > 1:
        np.cumprod(
            np.full(max_len - 1, POLY_B, dtype=np.uint64), out=pow_table[1:]
        )
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the point
        terms = arr[idx].astype(np.uint64) * pow_table[pos_in_tok]
        # reduceat offsets: positions (in compressed space) where tokens
        # begin — tok_start sliced to the nonsep index set
        tok_begin = np.flatnonzero(tok_start[idx])
        tok_hash = splitmix64_np(np.add.reduceat(terms, tok_begin))

    doc_of_tok = doc_of_char[starts]
    n_tok_per_doc = np.bincount(doc_of_tok, minlength=n_docs)
    return tok_hash, doc_of_tok, n_tok_per_doc
