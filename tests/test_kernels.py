"""Unit tests for the pure-numpy signature kernels (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest

from arhivum_spark import codec
from arhivum_spark.config import DedupConfig
from arhivum_spark.datagen import GenParams, build_row, cohort_of
from arhivum_spark.functions import minhash as mh
from arhivum_spark.functions import phash as ph
from arhivum_spark.functions import simhash as sh
from arhivum_spark.functions import suffix_array as sa

CFG = DedupConfig()


def _img(seed=0, hw=64):
    return np.random.default_rng(seed).integers(0, 256, (hw, hw, 3), dtype=np.uint8)


class TestCodec:
    def test_lossless_roundtrip(self):
        px = _img(1)
        assert np.array_equal(codec.decode(codec.encode_lossless(px)), px)

    def test_lossy_psnr_bound(self):
        px = _img(2)
        for q, floor in [(4, 46.0), (8, 40.0)]:
            out = codec.decode(codec.encode_lossy(px, q))
            assert codec.psnr(px, out) >= floor

    def test_header_sniff(self):
        px = _img(3, hw=32)
        assert codec.header(codec.encode_lossless(px)) == ("png", 32, 32)
        assert codec.header(codec.encode_lossy(px, 8)) == ("jpeg", 32, 32)

    def test_deterministic(self):
        px = _img(4)
        assert codec.encode_lossy(px, 8) == codec.encode_lossy(px, 8)


class TestMinHash:
    def test_identical_images_identical_signature(self):
        px = _img(5)
        a, b = mh.permutations(CFG.num_perm, CFG.minhash_seed)
        s1 = mh.minhash(mh.block_shingles(px), a, b)
        s2 = mh.minhash(mh.block_shingles(px.copy()), a, b)
        assert np.array_equal(s1, s2)

    def test_reencode_high_agreement(self):
        px = _img(6)
        re = codec.decode(codec.encode_lossy(px, 8))
        a, b = mh.permutations(CFG.num_perm, CFG.minhash_seed)
        s1 = mh.minhash(mh.block_shingles(px), a, b)
        s2 = mh.minhash(mh.block_shingles(re), a, b)
        assert mh.estimate_jaccard(s1, s2) >= 0.8

    def test_perturbed_blocks_agreement_tracks_jaccard(self):
        px = _img(7)
        pert = px.copy()
        pert[0:8, 0:8] = 255 - pert[0:8, 0:8]  # flip 1 of 64 tiles
        sh1 = mh.block_shingles(px)
        sh2 = mh.block_shingles(pert)
        true_j = len(np.intersect1d(sh1, sh2)) / len(np.union1d(sh1, sh2))
        assert true_j >= 0.9
        a, b = mh.permutations(CFG.num_perm, CFG.minhash_seed)
        est = mh.estimate_jaccard(mh.minhash(sh1, a, b), mh.minhash(sh2, a, b))
        assert abs(est - true_j) < 0.15

    def test_distinct_images_low_agreement(self):
        a, b = mh.permutations(CFG.num_perm, CFG.minhash_seed)
        s1 = mh.minhash(mh.block_shingles(_img(8)), a, b)
        s2 = mh.minhash(mh.block_shingles(_img(9)), a, b)
        assert mh.estimate_jaccard(s1, s2) < 0.3


class TestSimHash:
    def test_deterministic_and_order_sensitive_majority(self):
        t = "a photo of a dog on the beach".split()
        assert sh.simhash64(t) == sh.simhash64(list(t))

    def test_near_duplicate_small_hamming(self):
        a = "sunset over the ocean with golden clouds and birds flying high".split()
        b = a[:-1] + ["low"]
        assert sh.hamming64(sh.simhash64(a), sh.simhash64(b)) <= 12

    def test_distinct_large_hamming(self):
        a = sh.simhash64("one two three four five six seven".split())
        b = sh.simhash64("alpha beta gamma delta epsilon zeta".split())
        assert sh.hamming64(a, b) > 12

    def test_empty(self):
        assert sh.simhash64([]) == 0


class TestPHash:
    def test_reencode_stable(self):
        px = _img(10)
        re = codec.decode(codec.encode_lossy(px, 8))
        d = bin((ph.phash64(px) ^ ph.phash64(re)) & (2**64 - 1)).count("1")
        assert d <= 6

    def test_distinct_images_far(self):
        d = bin((ph.phash64(_img(11)) ^ ph.phash64(_img(12))) & (2**64 - 1)).count("1")
        assert d > 10

    def test_resize_invariance_of_constant(self):
        const = np.full((48, 80, 3), 128, dtype=np.uint8)
        assert isinstance(ph.phash64(const), int)


class TestSuffixArray:
    def test_banana(self):
        s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
        got = sa.build_suffix_array(s)
        assert list(got) == [5, 3, 1, 0, 4, 2]

    def test_contains(self):
        s = np.frombuffer(b"the quick brown fox", dtype=np.uint8).astype(np.int64)
        arr = sa.build_suffix_array(s)
        q1 = np.frombuffer(b"quick", dtype=np.uint8).astype(np.int64)
        q2 = np.frombuffer(b"quack", dtype=np.uint8).astype(np.int64)
        assert sa.contains_query(s, arr, q1)
        assert not sa.contains_query(s, arr, q2)

    def test_find_contained(self):
        docs = [
            np.array([1, 2, 3], dtype=np.int64),
            np.array([9, 1, 2, 3, 4], dtype=np.int64),
            np.array([7, 8], dtype=np.int64),
            np.array([1, 2], dtype=np.int64),
        ]
        got = set(sa.find_contained(docs))
        assert (0, 1) in got and (3, 1) in got and (3, 0) in got
        assert not any(a == 2 or b == 2 for a, b in got)


class TestDatagen:
    P = GenParams(n=500, img_hw=32)

    def test_exact_cohort_byte_identical(self):
        from arhivum_spark.datagen import base_of

        lo = int(500 * 0.70)
        row = build_row(lo, self.P)
        base = build_row(base_of(lo, self.P), self.P)
        assert cohort_of(lo, self.P) == "exact"
        assert row["bytes"] == base["bytes"]
        assert row["caption"] == base["caption"]
        assert row["image_id"] != base["image_id"]

    def test_reenc_cohort_psnr_invariant(self):
        from arhivum_spark.datagen import base_of, base_pixels

        lo = int(500 * 0.78)
        assert cohort_of(lo, self.P) == "reenc"
        row = build_row(lo, self.P)
        orig = base_pixels(base_of(lo, self.P), self.P)
        dec = codec.decode(bytes(row["bytes"]))
        assert codec.psnr(orig, dec) >= 40.0

    def test_rows_deterministic(self):
        r1, r2 = build_row(7, self.P), build_row(7, self.P)
        assert r1["bytes"] == r2["bytes"] and r1["caption"] == r2["caption"]
