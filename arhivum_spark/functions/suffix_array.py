"""Suffix array construction + exact-substring search (pure numpy).

The graft requires a "suffix-array pass for exact substring duplicates"
over captions (BASELINE.json north_star). Two layers:

1. This module: a real suffix array (prefix-doubling, O(n log^2 n), fully
   vectorized numpy) over a concatenated caption corpus, with binary-search
   substring lookup. Used *within* a partition/bucket via applyInPandas —
   the per-group imperative core.
2. operators/dedup_text.py `substring_pairs`: the distributed driver — a
   token-window hash join that routes candidate (contained, container)
   caption pairs to the same bucket, so corpus size per suffix array stays
   bounded at 10^12 scale.
"""

from __future__ import annotations

import numpy as np


def build_suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of int sequence s (prefix doubling with numpy lexsort)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        pair = np.stack([rank[order], key2[order]], axis=1)
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.any(pair[1:] != pair[:-1], axis=1)
        ranks_sorted = np.concatenate([[0], np.cumsum(changed)])
        new_rank[order] = ranks_sorted
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2
        if k >= 2 * n:  # safety; cannot happen
            return order.astype(np.int64)


def contains_query(
    corpus: np.ndarray, sa: np.ndarray, query: np.ndarray
) -> bool:
    """True iff `query` occurs as a contiguous subsequence of `corpus`,
    using binary search over the suffix array."""
    n, m = len(corpus), len(query)
    if m == 0 or m > n:
        return m == 0
    lo, hi = 0, n
    # lower bound: first suffix >= query
    while lo < hi:
        mid = (lo + hi) // 2
        suf = corpus[sa[mid] : sa[mid] + m]
        if _less(suf, query):
            lo = mid + 1
        else:
            hi = mid
    if lo == n:
        return False
    suf = corpus[sa[lo] : sa[lo] + m]
    return len(suf) == m and bool(np.array_equal(suf, query))


def _less(a: np.ndarray, b: np.ndarray) -> bool:
    m = min(len(a), len(b))
    neq = np.nonzero(a[:m] != b[:m])[0]
    if len(neq):
        i = neq[0]
        return bool(a[i] < b[i])
    return len(a) < len(b)


def find_contained(
    docs: list[np.ndarray],
) -> list[tuple[int, int]]:
    """All (i, j) with i != j and docs[i] a contiguous subsequence of docs[j].

    Builds one generalized suffix array over the concatenation with unique
    separators. Intended for bounded per-bucket corpora (the distributed
    layer routes candidates here).
    """
    if not docs:
        return []
    # offset all symbols above separator range
    seps = np.arange(len(docs), dtype=np.int64)
    shift = len(docs)
    parts, bounds = [], []
    pos = 0
    for d, sep in zip(docs, seps):
        parts.append(d + shift)
        parts.append(np.array([sep], dtype=np.int64))
        bounds.append((pos, pos + len(d)))
        pos += len(d) + 1
    corpus = np.concatenate(parts)
    owner = np.empty(len(corpus), dtype=np.int64)
    for j, (s, e) in enumerate(bounds):
        owner[s : e + 1] = j
    sa = build_suffix_array(corpus)
    out = []
    for i, d in enumerate(docs):
        if len(d) == 0:
            continue
        q = d + shift
        for j in _owners_containing(corpus, sa, owner, q):
            if j != i:
                out.append((i, j))
    return out


def _owners_containing(
    corpus: np.ndarray, sa: np.ndarray, owner: np.ndarray, query: np.ndarray
) -> set[int]:
    """Owners of every suffix whose prefix equals `query` (SA range scan)."""
    n, m = len(corpus), len(query)
    lo, hi = 0, n
    while lo < hi:  # lower bound
        mid = (lo + hi) // 2
        if _less(corpus[sa[mid] : sa[mid] + m], query):
            lo = mid + 1
        else:
            hi = mid
    start = lo
    hi = n
    while lo < hi:  # upper bound: first suffix with prefix > query
        mid = (lo + hi) // 2
        suf = corpus[sa[mid] : sa[mid] + m]
        if len(suf) == m and np.array_equal(suf, query):
            lo = mid + 1
        elif _less(suf, query):
            lo = mid + 1
        else:
            hi = mid
    return {int(owner[sa[k]]) for k in range(start, lo)}
