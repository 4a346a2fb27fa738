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

    def prune(
        self, keep_last_metrics: int = 1, min_age_seconds: float = 3600.0
    ) -> dict:
        """Manifest-led GC (retention story — at production scale the
        stage store IS the Iceberg table and this is `expire_snapshots`):

        - ABANDONED stage roots — directories with no manifest entry or
          no ``data/_SUCCESS`` (a write that died mid-job; Spark's job
          commit makes complete-or-absent per directory, but the
          directory itself survives a driver kill) — are deleted, along
          with any dangling manifest entry. A rerun recomputes them; a
          committed stage is NEVER touched, so a pruned store resumes
          exactly like an unpruned one (test-gated).
        - SUPERSEDED metrics generations — every ``write()`` appends one
          ``<stage>-<millis>.parquet`` to ``_metrics``; repeated reruns
          accumulate them unboundedly. Keep the newest
          ``keep_last_metrics`` per stage.

        An uncommitted root is only "abandoned" once its tree has been
        QUIET for ``min_age_seconds`` (newest directory mtime — a live
        Spark write refreshes mtimes continuously as task files land in
        ``data/_temporary``): pruning a store that another pipeline is
        actively writing into must not rmtree the stage mid-job, nor
        race the window inside ``write()`` between the parquet
        ``_SUCCESS`` commit and the manifest swap. The manifest update
        itself is additionally race-safe regardless of the window: the
        manifest is re-read immediately before commit and only the
        recorded deletions are applied, so a stage committed by a
        concurrent ``write()`` during the mtime walks is never
        clobbered. Pass ``min_age_seconds=0`` only when the store is
        known quiescent.

        Returns {"stages": [removed stage roots], "metrics": [removed
        metric files]} for operator logging.
        """
        import shutil
        import time

        def _newest_mtime(path: str) -> float | None:
            # directory mtimes refresh when entries are created/renamed
            # inside them, so statting dirs alone tracks an active write
            # without touching every data file. Returns None when the
            # root vanishes mid-walk (a concurrent prune or cleanup
            # script) — the caller skips it rather than crashing after
            # some roots were already removed.
            try:
                newest = os.stat(path).st_mtime
            except OSError:
                return None
            for dirpath, dirnames, _ in os.walk(path):
                for d in dirnames:
                    try:
                        newest = max(
                            newest,
                            os.stat(os.path.join(dirpath, d)).st_mtime,
                        )
                    except OSError:
                        pass
            return newest

        removed: dict = {"stages": [], "metrics": []}
        now = time.time()
        snapshot = self._manifest()
        for entry in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, entry)
            if entry == "_metrics" or not os.path.isdir(p):
                continue
            if not self.is_committed(entry):
                newest = _newest_mtime(p)
                if newest is None or now - newest < min_age_seconds:
                    continue  # possibly a live write — leave it alone
                shutil.rmtree(p, ignore_errors=True)
                removed["stages"].append(entry)
        # manifest entries whose directories vanished entirely
        for stage in [
            s
            for s in snapshot["stages"]
            if not os.path.isdir(os.path.join(self.root, s))
        ]:
            if stage not in removed["stages"]:
                removed["stages"].append(stage)
        if removed["stages"]:
            # RE-READ the manifest and apply only the recorded deletions:
            # committing the snapshot taken at prune start would clobber
            # any entry a concurrent write() committed during the (slow)
            # mtime walks above — the quiet-window guard protects the
            # rmtree, but only this re-read protects the manifest swap.
            m = self._manifest()
            for stage in removed["stages"]:
                # a vanished-dir entry may have been re-created and
                # re-committed meanwhile — only drop it if still dirless
                if not os.path.isdir(os.path.join(self.root, stage)):
                    m["stages"].pop(stage, None)
            self._commit_manifest(m)

        mdir = os.path.join(self.root, "_metrics")
        if os.path.isdir(mdir) and keep_last_metrics >= 0:
            by_stage: dict[str, list[str]] = {}
            for fn in os.listdir(mdir):
                if not fn.endswith(".parquet"):
                    continue
                stage = fn[: -len(".parquet")].rsplit("-", 1)[0]
                by_stage.setdefault(stage, []).append(fn)
            for stage, files in by_stage.items():
                # filename millis timestamp orders generations
                for fn in sorted(files)[
                    : max(0, len(files) - keep_last_metrics)
                ]:
                    os.remove(os.path.join(mdir, fn))
                    removed["metrics"].append(fn)
        return removed
