#!/usr/bin/env python
"""4.8M-image scale probe with location-split, disk-resident input
(round-5 VERDICT task 3).

The next input-size point after round 4's 2.4M (54 GB, tmpfs-resident):
4,800,000 images, ~108 GB — larger than EITHER storage tier alone in
this sandbox (/ has ~79 GB usable after the filesystem's strict
reservation; tmpfs shares the 125 GB RAM with the job itself). The
input is therefore generated in two slices of the SAME GenParams corpus
— [0, n/2) on DISK, [n/2, n) on tmpfs (datagen.images_df lo/hi;
slice-equivalence test-gated) — and read back as one table with a
two-path parquet scan. The DISK half exercises the real disk-read path
end-to-end (every prior bench input was tmpfs-resident); the probe
looks for the next input-size cliff after the parquet reader-batch OOM
that the 2.4M runs caught.

Free the tmpfs corpora from earlier rounds before running (the tmpfs
half + Spark heap + page cache for the disk half must share RAM):

    rm -rf /dev/shm/arhivum_scale/images_n{600000,2400000,20000}_hw96.parquet

Prints one JSON line per core level. Run alone in its window.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_IMAGES = int(os.environ.get("SPARK_GRAFT_DISK_IMAGES", "4800000"))
IMG_HW = 96
CORE_LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_GRAFT_DISK_CORES", "32").split(",")
)
DISK_DIR = os.environ.get("SPARK_GRAFT_DISK_DIR", "/root/disk_bench")
SHM_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/dev/shm/arhivum_scale")

DISK_HALF = os.path.join(DISK_DIR, f"images_n{N_IMAGES}_lo_hw{IMG_HW}.parquet")
SHM_HALF = os.path.join(SHM_DIR, f"images_n{N_IMAGES}_hi_hw{IMG_HW}.parquet")


def generate_halves() -> None:
    from arhivum_spark import datagen
    from arhivum_spark.session import get_spark

    p = datagen.GenParams(n=N_IMAGES, seed=42, img_hw=IMG_HW)
    todo = [
        (DISK_HALF, 0, N_IMAGES // 2),
        (SHM_HALF, N_IMAGES // 2, N_IMAGES),
    ]
    todo = [
        t for t in todo if not os.path.exists(os.path.join(t[0], "_SUCCESS"))
    ]
    if not todo:
        return
    spark = get_spark("disk_datagen", cores=32, shuffle_partitions=32)
    for path, lo, hi in todo:
        t0 = time.time()
        datagen.images_df(spark, p, partitions=256, lo=lo, hi=hi).write.mode(
            "overwrite"
        ).parquet(path)
        print(
            f"# generated {path} [{lo},{hi}) in {time.time()-t0:.0f}s",
            file=sys.stderr,
        )
    spark.stop()


def timed_run(cores: int) -> dict:
    from arhivum_spark.config import DedupConfig
    from arhivum_spark.functions.signatures import attach_signatures
    from arhivum_spark.plans.image_dedup import run_pipeline
    from arhivum_spark.session import get_spark
    from arhivum_spark.sources.checkpoints import StageStore

    spark = get_spark(
        f"disk_{cores}", cores=cores, shuffle_partitions=4 * cores
    )
    images = spark.read.parquet(DISK_HALF, SHM_HALF)
    warm = images.limit(64 * cores).repartition(2 * cores)
    attach_signatures(warm, DedupConfig()).write.format("noop").mode(
        "overwrite"
    ).save()
    stage_root = os.path.join(SHM_DIR, f"disk_stages_{cores}")
    shutil.rmtree(stage_root, ignore_errors=True)
    t0 = time.time()
    out = run_pipeline(images, StageStore(spark, stage_root), DedupConfig())
    n_rows = out.count()
    wall = time.time() - t0
    n_clusters = out.select("cluster_id").distinct().count()
    stage_secs = {
        r["stage"]: round(r["max(write_seconds)"], 1)
        for r in StageStore(spark, stage_root)
        .metrics()
        .groupBy("stage")
        .agg({"write_seconds": "max"})
        .collect()
    }
    shutil.rmtree(stage_root, ignore_errors=True)
    spark.stop()
    return {
        "metric": "disk_input_scale_probe",
        "n_images": N_IMAGES,
        "input_layout": "half disk + half tmpfs (location-split slices)",
        "cores": cores,
        "wall_sec": round(wall, 1),
        "images_per_sec": round(N_IMAGES / wall, 1),
        "rows_out": n_rows,
        "n_clusters": n_clusters,
        "stage_sec": stage_secs,
    }


def main() -> None:
    os.makedirs(DISK_DIR, exist_ok=True)
    os.environ.setdefault(
        "SPARK_LOCAL_DIRS", os.path.join(SHM_DIR, "spark_local")
    )
    generate_halves()
    for cores in CORE_LEVELS:
        print(json.dumps(timed_run(cores)))


if __name__ == "__main__":
    main()
