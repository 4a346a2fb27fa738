"""Incremental (streaming) ingest with keyed dedup state.

The reference's nearest streaming analogue is the scanner's in-memory hash
registry consulted as files arrive (OutputService.java:34,107-134 —
first-occurrence-wins) and its batch-then-upload resumable micro-batching
(UploadCommand.java:108-127). Structured Streaming re-expresses both:

- `dedup_stream`: readStream -> watermark -> dropDuplicatesWithinWatermark
  on the content key — the distributed, state-store-backed version of the
  `Set<String> knownHashes` probe. State is bounded by the watermark (the
  reference's registry grows without bound; at 10^12 scale the watermark IS
  the design fix).
- `ingest_stream`: foreachBatch appending each micro-batch to a StageStore
  stage table with the batch id as the stage ordinal — Iceberg/parquet
  snapshot per micro-batch, idempotent on replay (Structured Streaming
  re-runs a failed batch with the same batch_id; the overwrite-by-batch-dir
  commit makes the replay a no-op, matching the reference's re-upload
  idempotency).

Stateful session/accumulation logic beyond dedup belongs in
`applyInPandasWithState` — not needed for the reference's surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_col: str = "content_sha256",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keyed first-wins dedup over a stream: later rows with a seen key
    (within the watermark horizon) are dropped. Exactly the reference's
    hashExists -> registerHash gate, with bounded state."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def ingest_stream(
    deduped: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Write a deduped stream as one parquet snapshot per micro-batch.

    Returns the StreamingQuery. Each batch lands in
    ``<out_dir>/batch-<id>/`` (the scanner's ``files/batch-%04d.json``
    shape, OutputService.java:73-99) with mode=overwrite so a replayed
    batch id commits identical bytes instead of duplicating rows.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch-{batch_id:04d}")
        )

    return (
        deduped.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_rates(
    stream: DataFrame,
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Late-data-tolerant tumbling-window ingestion metrics — the streaming
    version of the scanner's progress/summary counters
    (OutputService.java:146-173)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.count("*").alias("rows"),
            F.approx_count_distinct("content_sha256").alias("distinct_hashes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "rows",
            "distinct_hashes",
        )
    )
