"""Stage checkpoints + manifest: the resumability contract.

The reference achieves multi-day resumability by writing durable JSON
batches and re-uploading them idempotently (OutputService.java:73-99,
UploadCommand.java:108-127). The Spark-native equivalent is: every pipeline
stage commits its output as an immutable snapshot (Iceberg table on a real
cluster; parquet directory + atomic manifest update here, since this image
lacks Iceberg jars), and a rerun skips any stage whose snapshot is already
committed — resume-mid-pipeline after executor/driver loss.

Commit protocol: write parquet to `<dir>/<stage>/data` (Spark's own job
commit makes the directory complete-or-absent via _SUCCESS), then record the
stage in `manifest.json` atomically (write tmp + os.replace). A stage is
"committed" only if both exist.

Per-stage, per-partition metrics (north rule) are appended to a `_metrics`
table: stage, spark partition id, row count, wall-clock.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"stages": {}}

    def _commit_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    def is_committed(self, stage: str) -> bool:
        m = self._manifest()
        entry = m["stages"].get(stage)
        return bool(
            entry
            and os.path.exists(
                os.path.join(self.root, stage, "data", "_SUCCESS")
            )
        )

    def write(
        self,
        stage: str,
        df: DataFrame,
        metrics: bool = True,
        materialize_first: bool = False,
    ) -> DataFrame:
        """Commit a stage snapshot (idempotent overwrite) and return a reader
        of the committed data — downstream reads the snapshot, not the
        lineage, so a failure downstream never recomputes this stage.

        materialize_first: persist+count before the file write. Needed for
        pandas-UDF stages only — fusing a UDF stage into the parquet-write
        task interacts badly with Arrow batch streaming (measured 3-5x
        slower + high variance in local mode). Pure-JVM stages write
        directly: one pass, half the constant cost.
        """
        path = os.path.join(self.root, stage, "data")
        t0 = time.time()
        if materialize_first:
            df = df.persist()
            df.count()
        df.write.mode("overwrite").parquet(path)
        elapsed = time.time() - t0
        if materialize_first:
            df.unpersist()
        committed = self.spark.read.parquet(path)
        if metrics:
            self._append_metrics(stage, path, elapsed)
        m = self._manifest()
        m["stages"][stage] = {
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "write_seconds": round(elapsed, 3),
        }
        self._commit_manifest(m)
        return committed

    def _append_metrics(self, stage: str, path: str, elapsed: float) -> None:
        """Per-FILE row counts of the COMMITTED snapshot (the contract:
        _metrics reflects what a resume actually reads, not the in-memory
        plan's partitioning). Read from parquet footers driver-side — no
        Spark job; stage dirs have O(cores) files. On a real cluster the
        same footers come from the object store listing."""
        import pyarrow.parquet as pq

        rows = []
        for fn in sorted(os.listdir(path)):
            if not fn.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, fn))
            rows.append((stage, fn, md.num_rows, round(elapsed, 3)))
        if not rows:
            rows.append((stage, "_empty", 0, round(elapsed, 3)))
        import pyarrow as pa

        table = pa.table(
            {
                "stage": [r[0] for r in rows],
                "file": [r[1] for r in rows],
                "rows": [r[2] for r in rows],
                "write_seconds": [r[3] for r in rows],
            }
        )
        mdir = os.path.join(self.root, "_metrics")
        os.makedirs(mdir, exist_ok=True)
        pq.write_table(
            table, os.path.join(mdir, f"{stage}-{int(time.time()*1000)}.parquet")
        )

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, stage, "data"))

    def read_or_compute(
        self, stage: str, compute, materialize_first: bool = False
    ) -> DataFrame:
        """Resume point: reuse the committed snapshot, else compute+commit."""
        if self.is_committed(stage):
            return self.read(stage)
        return self.write(
            stage, compute(), materialize_first=materialize_first
        )

    def metrics(self) -> DataFrame | None:
        path = os.path.join(self.root, "_metrics")
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)
