"""Exact (hash-equality) deduplication operators.

These re-express the reference's core dedup semantics as distributed
DataFrame plans:

- first-wins duplicate flagging: the scanner keeps an in-memory hash set and
  flags every occurrence after the first (reference: OutputService.java:107-134,
  ScanCommand.java:303-318). Arrival order is nondeterministic under
  parallelism, so we fix a deterministic total order (a tiebreak column) — a
  ranking window, not driver-side state.
- duplicate grouping: group rows by content hash, keep groups of size > 1
  (reference: CodeProjectController.java:104-119 groupingBy(contentHash);
  designed file-level form docs/shared/DEDUPLICATION.md:27-36).
- best-copy election: multi-key priority ranking inside each hash group
  (reference: docs/shared/DEDUPLICATION.md:44-55).
- hash self-join for dup pairs (reference: ScannedFileRepository.findBySha256,
  ScannedFileRepository.java:66-95) — the small-scale ancestor of the LSH
  band self-join in operators/lsh.py.

Scale notes: every operator here is a single hash-shuffle on the hash column
— map-side partial aggregation applies, no driver-side state, no collect().
At 10^12 rows the hash column is high-cardinality so the shuffle is uniform;
skew only appears for degenerate content (handled in lsh.py via salting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def flag_duplicates(
    df: DataFrame,
    hash_col: str = "sha256",
    id_col: str = "id",
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """First-wins duplicate flag with a deterministic total order.

    Adds: is_duplicate (bool), representative_id (id of the kept first copy).
    The window shuffles once on hash_col; representative_id comes from the
    same window (first_value), so no extra join.
    """
    order = tiebreak if tiebreak is not None else [F.col(id_col).asc()]
    w = Window.partitionBy(hash_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "representative_id",
            F.first(F.col(id_col)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("is_duplicate", F.col("_rn") > F.lit(1))
        .drop("_rn")
    )


def duplicate_groups(
    df: DataFrame,
    hash_col: str = "sha256",
    id_col: str = "id",
    size_col: str | None = None,
) -> DataFrame:
    """Group-by-hash duplicate groups (groups with >1 member).

    Returns one row per duplicate group: hash, n_files, wasted_size (bytes
    beyond the kept copy — docs/server/DATABASE.md:199-225), kept_id (min id).
    A single groupBy shuffle with map-side combine.
    """
    aggs = [
        F.count("*").alias("n_files"),
        F.min(id_col).alias("kept_id"),
    ]
    if size_col:
        # all copies share the content hash => same size; wasted = (n-1) * size
        aggs.append(
            (F.sum(size_col) - F.min(size_col)).alias("wasted_size")
        )
    return df.groupBy(hash_col).agg(*aggs).filter(F.col("n_files") > 1)


def duplicate_pairs(
    df: DataFrame, hash_col: str = "sha256", id_col: str = "id"
) -> DataFrame:
    """All same-hash pairs (a < b): the hash-equality self-join (J1).

    This is the exact-hash edge list fed to connected components; at scale it
    is a shuffled hash self-join on hash_col with AQE skew handling.
    """
    a = df.select(F.col(hash_col).alias("h"), F.col(id_col).alias("id_a"))
    b = df.select(F.col(hash_col).alias("h"), F.col(id_col).alias("id_b"))
    return a.join(b, "h").filter(F.col("id_a") < F.col("id_b"))


def best_copy(
    df: DataFrame,
    hash_col: str = "sha256",
    priority: list[Column] | None = None,
) -> DataFrame:
    """Elect one representative per hash group by a priority order (J5/W2).

    Default priority mirrors docs/shared/DEDUPLICATION.md:44-55 adapted to
    available columns: earliest modified, then shortest path, then id (the
    latter two only when those columns exist) — the caller passes the
    exact priority for its schema. A bare modified_at is not a total
    order: ties would elect a shuffle-dependent representative.
    """
    if priority is not None:
        order = priority
    else:
        order = [F.col("modified_at").asc()]
        if "path" in df.columns:
            order += [F.length("path").asc(), F.col("path").asc()]
        if "id" in df.columns:
            order.append(F.col("id").asc())
    w = Window.partitionBy(hash_col).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .drop("_rank")
    )


def anti_join_new_hashes(
    df: DataFrame, known: DataFrame, hash_col: str = "sha256"
) -> DataFrame:
    """Rows whose hash is not already known (J7: existsBySha256 as an
    anti-join; the EXIF-skip optimization's 'only new hashes get the
    expensive work' — ScanCommand.java:342-353)."""
    # no .distinct() on the known side: left_anti already has set
    # semantics, and the distinct cost a full extra aggregate exchange of
    # every known hash on the hot incremental-scan path
    return df.join(known.select(hash_col), hash_col, "left_anti")
