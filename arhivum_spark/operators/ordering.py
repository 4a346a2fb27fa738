"""Global total-order numbering without a single-partition window.

A bare `row_number() OVER (ORDER BY ...)` collapses the whole table into
one task — the classic Spark scale trap. The distributed form is the
standard two-phase scheme: range-partition on the order key, rank locally
per partition, then add the cumulative row-count offset of all preceding
partitions (a tiny driver-side prefix sum broadcast back).

Used by the W3 batch-numbering operator (the reference writes sequential
output batches, OutputService.java:73-99 — batch index = global rank /
batch size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_col: str, num_partitions: int | None = None
) -> DataFrame:
    """Adds `_rn` = 1-based rank in the total order of `order_col`.

    Scales: the sort happens within range partitions (each a normal-sized
    task); only one count per partition crosses the driver. Ties on
    `order_col` get an arbitrary but deterministic-per-layout order —
    pass a unique key for full determinism.
    """
    clash = {"_rn", "_pid", "_lrn", "_off"} & set(df.columns)
    if clash:
        # withColumn would silently OVERWRITE the caller's data with the
        # internal rank/offset columns
        raise ValueError(
            f"global_row_number: input already has reserved column(s) "
            f"{sorted(clash)}; rename them first"
        )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # PIN the range-partitioned layout before counting: RangePartitioner
    # samples with a per-job seed, so re-executing the lineage for the
    # final select could place rows in DIFFERENT partitions than the ones
    # the collected offsets describe — silently wrong/duplicate ranks at
    # any scale where sampling isn't exhaustive. localCheckpoint is eager,
    # so the size-count job and the output job read the same partitions.
    parts = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    local = parts.withColumn("_lrn", F.row_number().over(w))
    # prefix-sum of partition sizes: n rows to the driver, joined back as a
    # tiny broadcast frame (scales to any partition count, unlike a
    # when-chain over O(n) literals)
    sizes = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    spark = df.sparkSession
    if offsets:
        off_df = spark.createDataFrame(offsets, ["_pid", "_off"])
        local = local.join(F.broadcast(off_df), "_pid", "left").withColumn(
            "_off", F.coalesce(F.col("_off"), F.lit(0))
        )
    else:
        local = local.withColumn("_off", F.lit(0))
    return (
        local.withColumn("_rn", (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def batch_numbers(
    df: DataFrame, order_col: str, batch_size: int
) -> DataFrame:
    """W3: (batch_no, pos_in_batch) over the global `order_col` order."""
    rn = global_row_number(df, order_col)
    return rn.select(
        *df.columns,
        F.floor((F.col("_rn") - 1) / batch_size).alias("batch_no"),
        ((F.col("_rn") - 1) % batch_size).alias("pos_in_batch"),
    )
