"""Parity tests for exact dedup semantics vs the reference's test fixtures.

Mirrors (from scratch, Spark-first):
- HashServiceTest golden SHA-256 vectors (HashServiceTest.java:33-58).
- ScanIntegrationTest duplicate detection: 2 identical + 1 unique file =>
  exactly one is_duplicate=true (ScanIntegrationTest.java:134-189).
- CodeProjectDuplicateDetectionServiceTest: exact dup pair => one group of 2;
  disjoint => zero groups (:126-156).
- hash-of-sorted-hashes byte parity (CodeProjectScannerService.java:221-254):
  no separator, lexicographic sort, lowercase hex.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from arhivum_spark.operators import dedup_exact, group_analytics

EMPTY_SHA = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
HELLO_SHA = "dffd6021bb2bd5b0af676290809ec3a53191dd81c7f70a4b28688a362182986f"


def test_sha256_golden_vectors(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"")), ("b", bytearray(b"Hello, World!"))], ["id", "bytes"]
    ).withColumn("sha256", F.sha2(F.col("bytes"), 256))
    got = {r["id"]: r["sha256"] for r in df.collect()}
    assert got["a"] == EMPTY_SHA
    assert got["b"] == HELLO_SHA


def test_duplicate_flagging_first_wins(spark):
    # 2 identical + 1 unique => exactly one duplicate; first id kept
    rows = [("f1", "hashA"), ("f2", "hashA"), ("f3", "hashB")]
    df = spark.createDataFrame(rows, ["id", "sha256"])
    out = dedup_exact.flag_duplicates(df, "sha256", "id").collect()
    flags = {r["id"]: (r["is_duplicate"], r["representative_id"]) for r in out}
    assert flags == {
        "f1": (False, "f1"),
        "f2": (True, "f1"),
        "f3": (False, "f3"),
    }


def test_duplicate_groups_exact_and_disjoint(spark):
    rows = [
        ("p1", "hash1", 100),
        ("p2", "hash1", 100),
        ("p3", "hash2", 50),
    ]
    df = spark.createDataFrame(rows, ["id", "sha256", "size"])
    groups = dedup_exact.duplicate_groups(df, "sha256", "id", "size").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["sha256"] == "hash1" and g["n_files"] == 2
    assert g["kept_id"] == "p1" and g["wasted_size"] == 100

    disjoint = spark.createDataFrame(
        [("p1", "h1", 1), ("p2", "h2", 1)], ["id", "sha256", "size"]
    )
    assert dedup_exact.duplicate_groups(disjoint, "sha256", "id").count() == 0


def test_duplicate_pairs_self_join(spark):
    df = spark.createDataFrame(
        [("a", "h"), ("b", "h"), ("c", "h"), ("d", "x")], ["id", "sha256"]
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_exact.duplicate_pairs(df, "sha256", "id").collect()
    }
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}


def test_group_content_hash_byte_parity(spark):
    # reference digests UTF-8 of concatenated sorted hex hashes, NO separator
    hashes = ["beef", "aaaa", "cafe"]
    expected = hashlib.sha256("".join(sorted(hashes)).encode()).hexdigest()
    df = spark.createDataFrame(
        [("g1", h) for h in hashes], ["group", "sha256"]
    )
    out = group_analytics.group_content_hash(df, "group", "sha256").collect()[0]
    assert out["content_hash"] == expected
    assert out["n_members"] == 3


def test_best_copy_priority(spark):
    rows = [
        ("f1", "h", "2024-02-01", "/long/path/file.txt"),
        ("f2", "h", "2024-01-01", "/a/file.txt"),  # earliest mtime wins
        ("f3", "h", "2024-01-01", "/zz/file.txt"),  # tie -> shorter path? equal len
    ]
    df = spark.createDataFrame(rows, ["id", "sha256", "mtime", "path"])
    best = dedup_exact.best_copy(
        df,
        "sha256",
        priority=[
            F.col("mtime").asc(),
            F.length("path").asc(),
            F.col("id").asc(),
        ],
    ).collect()
    assert len(best) == 1
    assert best[0]["id"] == "f2"


def test_anti_join_new_hashes(spark):
    df = spark.createDataFrame([("a", "h1"), ("b", "h2")], ["id", "sha256"])
    known = spark.createDataFrame([("x", "h1")], ["id", "sha256"])
    out = dedup_exact.anti_join_new_hashes(df, known, "sha256").collect()
    assert [r["id"] for r in out] == ["b"]


def test_jaccard_between_groups(spark):
    rows = [("g1", i) for i in ["a", "b", "c"]] + [("g2", i) for i in ["b", "c", "d"]]
    df = spark.createDataFrame(rows, ["g", "item"])
    out = group_analytics.jaccard_between_groups(df, "g", "item").collect()
    assert len(out) == 1
    r = out[0]
    assert r["inter"] == 2 and r["size_a"] == 3 and r["size_b"] == 3
    assert abs(r["jaccard"] - 0.5) < 1e-9
