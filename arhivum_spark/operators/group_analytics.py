"""Group-level analytics: set fingerprints, Jaccard, classification, rollups.

Re-expresses the reference's group/folder/project analytics as one-shuffle
aggregations:

- content hash of sorted member hashes (A2): the reference digests the UTF-8
  bytes of the lexicographically sorted member hashes with NO separator
  (CodeProjectScannerService.java:221-254; folder form
  docs/shared/DEDUPLICATION.md:100-109). This order-invariant set fingerprint
  is the semantic ancestor of MinHash.
- true Jaccard between groups' hash sets (A3): the reference documents it
  (docs/shared/CODE_DETECTION.md:216-256) but ships a min/max proxy
  (CodeProjectDuplicateDetectionService.java:207-250); we implement the real
  thing, join-based so it scales (no collect_set blowup on huge groups).
- duplicate-type classification (A6) and diff-complexity buckets (A5)
  (CodeProjectDuplicateDetectionService.java:179-198, :255-264).
- source running statistics (A7, FileService.java:107-111) and per-type
  rollups (A8, CodeProjectController.java:167-193).
- bottom-up path-hierarchy aggregation (A9, FolderTreeService.java:196-272)
  as an explode-prefixes + groupBy — a distributed rollup, no tree in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_content_hash(
    df: DataFrame, group_col: str, hash_col: str = "sha256"
) -> DataFrame:
    """SHA-256 over the lexicographically sorted member hashes, no separator,
    lowercase hex — byte-parity with CodeProjectScannerService.java:235-248.

    Scale shape: NOT collect_list (one degenerate group key — the same
    hot-cohort class lsh.py salts and dedup_text.py collapses — would
    materialize every member hash in a single aggregation buffer on one
    executor). Instead: shuffle by group, sort within partitions by the
    TYPED (group, hash) — the same ordering ``sort_array`` uses, so a
    numeric hash column sorts numerically, not lexicographically on its
    string form — then stream the sorted runs through an incremental
    SHA-256 over Spark's cast-to-string of each value (what
    ``concat_ws`` would feed the digest), in Arrow batches, carrying
    the open group's digest state across batch boundaries. Memory is
    O(arrow batch), not O(largest group); null hashes are skipped from
    the digest but counted, exactly collect_list's null-dropping +
    count(*) semantics. Group-run detection uses Spark's GROUPING
    equality, not Python's: NaN keys are one group (and -0.0 == 0.0),
    array-typed keys compare element-wise — ``groupBy`` parity, where
    raw numpy ``!=`` would split NaN runs or raise on arrays. Emitted
    float keys are normalized like Spark's grouping output (-0.0 ->
    0.0); one divergence remains: a NaN group key is emitted as NULL,
    because the pandas->Arrow bridge treats NaN in a float column as
    the null sentinel (the group is still exactly one output row with
    the right digest and count). Parity with the collect_list form is
    test-gated (tests/test_round5_review.py), including int-typed hash
    columns and NaN/array group keys.
    """
    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd

    gtype = df.schema[group_col].dataType.simpleString()
    out_schema = f"{group_col} {gtype}, content_hash string, n_members long"
    sentinel = object()  # "no open group" marker (None is a real group key)

    def canon(k):
        # Spark grouping equality: NaN == NaN, -0.0 == 0.0, arrays
        # element-wise. Map each key to a hashable canonical form so
        # run detection can use plain ``!=`` on object arrays.
        if k is None:
            return None
        if isinstance(k, (float, np.floating)):
            f = float(k)
            return "NaN" if f != f else f + 0.0  # +0.0 folds -0.0
        if isinstance(k, (np.ndarray, list, tuple)):
            return tuple(canon(x) for x in k)
        if isinstance(k, np.generic):
            return k.item()
        return k

    def out_key(k):
        # emit what groupBy would: -0.0 normalized to 0.0; NaN passes
        # through (and becomes null at the Arrow bridge, documented)
        if isinstance(k, (float, np.floating)):
            f = float(k)
            return f + 0.0 if f == f else f
        return k

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = sentinel  # canonical form of the open group's key
        cur_orig = None  # original (as-received) key, what we emit
        h = None
        n = 0
        done_keys: list = []
        done_digests: list = []
        done_counts: list = []
        for pdf in batches:
            keys = pdf.iloc[:, 0].to_numpy(dtype=object)
            hashes = pdf.iloc[:, 1].to_numpy(dtype=object)
            m = len(keys)
            if m == 0:
                continue
            keys_c = np.empty(m, dtype=object)
            for i in range(m):
                keys_c[i] = canon(keys[i])
            # contiguous group runs (input is sorted by group): segment
            # starts are where the canonical key changes, plus position 0
            starts = np.concatenate(
                ([0], np.flatnonzero(keys_c[1:] != keys_c[:-1]) + 1)
            )
            ends = np.concatenate((starts[1:], [m]))
            for s, e in zip(starts, ends):
                k = keys_c[s]
                if cur is sentinel or k != cur:
                    if cur is not sentinel:
                        done_keys.append(out_key(cur_orig))
                        done_digests.append(h.hexdigest())
                        done_counts.append(n)
                    cur, cur_orig, h, n = k, keys[s], hashlib.sha256(), 0
                # nulls sort first and are excluded from the digest
                # (collect_list drops them) but counted (count(*))
                h.update(
                    "".join(
                        x for x in hashes[s:e] if x is not None
                    ).encode()
                )
                n += int(e - s)
            if done_keys:
                yield pd.DataFrame(
                    {
                        group_col: done_keys,
                        "content_hash": done_digests,
                        "n_members": done_counts,
                    }
                )
                done_keys, done_digests, done_counts = [], [], []
        if cur is not sentinel:
            yield pd.DataFrame(
                {
                    group_col: [out_key(cur_orig)],
                    "content_hash": [h.hexdigest()],
                    "n_members": [n],
                }
            )

    # Sort on the TYPED hash value; the kernel digests the cast-string
    # form (cols 0 and 1), so the typed sort key rides third.
    return (
        df.select(
            group_col,
            F.col(hash_col).cast("string").alias("_hash_str"),
            F.col(hash_col).alias("_hash_typed"),
        )
        .repartition(group_col)
        .sortWithinPartitions(group_col, "_hash_typed")
        .mapInPandas(kernel, out_schema)
    )


def jaccard_between_groups(
    df: DataFrame, group_col: str, item_col: str, min_jaccard: float = 0.0
) -> DataFrame:
    """True Jaccard similarity between every pair of groups sharing >=1 item.

    Join-based: distinct (group, item) -> self-join on item -> intersection
    counts -> join per-group sizes -> |A∩B| / (|A|+|B|-|A∩B|). Scales because
    only co-occurring pairs are materialized (blocking by item), the same idea
    LSH banding generalizes. Columns: group_a, group_b, inter, size_a, size_b,
    jaccard.
    """
    gi = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    sizes = gi.groupBy("g").agg(F.count("*").alias("sz"))
    pairs = (
        gi.alias("a")
        .join(gi.alias("b"), "item")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(
            sizes.select(F.col("g").alias("group_a"), F.col("sz").alias("size_a")),
            "group_a",
        )
        .join(
            sizes.select(F.col("g").alias("group_b"), F.col("sz").alias("size_b")),
            "group_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def complexity_bucket(diff_ratio_col: str = "diff_ratio"):
    """Diff-complexity buckets: <5% TRIVIAL, <15% SIMPLE, <30% MEDIUM, else
    COMPLEX (CodeProjectDuplicateDetectionService.java:255-264)."""
    c = F.col(diff_ratio_col)
    return (
        F.when(c < 0.05, F.lit("TRIVIAL"))
        .when(c < 0.15, F.lit("SIMPLE"))
        .when(c < 0.30, F.lit("MEDIUM"))
        .otherwise(F.lit("COMPLEX"))
    )


def classify_duplicate_type(
    groups: DataFrame,
    hash_col: str = "content_hash",
    ident_col: str = "identifier",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-cluster duplicate type: all-same-hash => EXACT; else any shared
    identifier => SAME_PROJECT_DIFF_CONTENT; else DIFFERENT_VERSION
    (CodeProjectDuplicateDetectionService.java:179-198)."""
    return groups.groupBy(cluster_col).agg(
        F.count("*").alias("n_members"),
        F.when(F.countDistinct(hash_col) == 1, F.lit("EXACT"))
        .when(
            F.count("*") > F.countDistinct(ident_col),
            F.lit("SAME_PROJECT_DIFF_CONTENT"),
        )
        .otherwise(F.lit("DIFFERENT_VERSION"))
        .alias("dup_type"),
    )


def source_stats(
    df: DataFrame, source_col: str = "source_id", size_col: str = "size"
) -> DataFrame:
    """Per-source processed counts/bytes (A7) — the counter updates of
    FileService.updateSourceStatistics as one aggregation."""
    return df.groupBy(source_col).agg(
        F.count("*").alias("n_files"), F.sum(size_col).alias("total_size")
    )


def path_tree_rollup(
    df: DataFrame, path_col: str = "path", size_col: str = "size", sep: str = "/"
) -> DataFrame:
    """Bottom-up folder rollup (A9): explode every ancestor prefix of each
    row's path, then groupBy prefix — count/sum per folder at every depth.

    Equivalent to the reference's post-order tree accumulation
    (FolderTreeService.java:246-260) but with no 100k-node memory guardrail:
    it is a flat explode + aggregate, distributed by prefix.
    """
    parts = F.split(F.col(path_col), sep)
    # ancestor prefixes: for path a/b/c.txt -> ["a", "a/b"] (folders only)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts) - 1),
        lambda i: F.concat_ws(sep, F.slice(parts, 1, i)),
    )
    return (
        df.select(
            F.explode(prefixes).alias("folder"), F.col(size_col).alias("_sz")
        )
        .groupBy("folder")
        .agg(F.count("*").alias("file_count"), F.sum("_sz").alias("total_size"))
    )
