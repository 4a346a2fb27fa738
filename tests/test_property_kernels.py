"""Property-based tests (hypothesis) for the vectorized numpy kernels.

Each batch kernel must agree with its readable scalar reference on
ARBITRARY inputs — unicode, whitespace runs, empty docs, single chars —
not just the seeded corpora the integration tests use. Kernel bugs here
corrupt signatures silently (dedup recall loss, not crashes), so the
reference-equivalence property is the real safety net.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import re

# the kernels' documented tokenization contract: ASCII whitespace
# (space/tab/LF/CR/VT/FF), runs collapsed — NARROWER than str.split()
_TOKEN_RE = re.compile(r"[^ \t\n\r\x0b\x0c]+")


def _contract_tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)

# text without NUL (the kernel's internal separator can't appear in
# python strings destined for real corpora anyway) or lone surrogates
# (not UTF-8 encodable, impossible in Spark string columns)
texts = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_characters="\x00", blacklist_categories=("Cs",)
        ),
        max_size=60,
    ),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_simhash_batch_equals_scalar(caps):
    from arhivum_spark.functions import simhash as sh

    ref = np.array(
        [sh.simhash64(_contract_tokens(c)) for c in caps], dtype=np.int64
    )
    got = sh.simhash_batch(caps)
    assert got.dtype == np.int64
    assert (got == ref).all()


def _gram_ref(text: str, ngram: int) -> set:
    """Readable reference for _gram_hash_batch: same polynomial/splitmix
    arithmetic, per-token python ints."""
    from arhivum_spark.functions.simhash import _splitmix64_int

    B = 0x100000001B3
    P = 0x9E3779B97F4A7C15
    M = (1 << 64) - 1

    def tok_hash(t: str) -> int:
        h, p = 0, 1
        for byte in t.encode("utf-8"):
            h = (h + byte * p) & M
            p = (p * B) & M
        return _splitmix64_int(h)

    toks = [tok_hash(t) for t in _contract_tokens(text)]
    if not toks:
        return {1}
    grams = []
    if len(toks) >= ngram:
        for i in range(len(toks) - ngram + 1):
            h = 0
            for j in range(ngram):
                h = (h * P + toks[i + j]) & M
            grams.append(h)
    else:
        h = 0
        for t in toks:
            h = (h * P + t) & M
        grams.append(h)
    out = set()
    for g in grams:
        v = _splitmix64_int(g)
        out.add(v - (1 << 64) if v >= (1 << 63) else v)
    return out


@settings(max_examples=150, deadline=None)
@given(texts, st.integers(min_value=1, max_value=4))
def test_gram_hash_batch_equals_reference(docs, ngram):
    from arhivum_spark.operators.dedup_text import _gram_hash_batch

    got = _gram_hash_batch(docs, ngram)
    assert len(got) == len(docs)
    for text, g in zip(docs, got):
        assert set(int(x) for x in g) == _gram_ref(text, ngram)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        max_size=60,
    )
)
def test_star_cc_equals_union_find(edges):
    """connected_components_star AND the default label-prop+pointer-jump
    algorithm against a classic driver-side union-find on arbitrary small
    graphs (run on a shared local session)."""
    from tests.conftest import get_shared_spark
    from arhivum_spark.operators.connected_components import (
        connected_components,
        connected_components_star,
    )

    spark = get_shared_spark()
    n = 41
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in range(n)}

    vertices = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    e = [(a, b) for a, b in edges if a != b]
    if e:
        edf = spark.createDataFrame(e, ["src", "dst"])
    else:
        edf = spark.createDataFrame([], "src int, dst int")
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(vertices, edf, id_col="id").collect()
    }
    assert got == expect
    got_lp = {
        r["id"]: r["component"]
        for r in connected_components(
            vertices, edf, id_col="id", fallback_star=False
        ).collect()
    }
    assert got_lp == expect
