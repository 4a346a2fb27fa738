#!/usr/bin/env python
"""Resume the 4.8M recall run from the snapshots a real kernel-OOM kill
left behind (round-5 cliff #5: unbounded PSNR payload shuffle), and
compute dup-pair recall vs corrected planted truth.

The killed run committed s1_signatures / s2_exact / s3_candidates; the
resume must reuse them verbatim (manifest committed_at unchanged) and
recompute only s3b onward — the exact north-rule resumability contract,
exercised here by an unplanned production-grade kill instead of
bench_resume.py's staged SIGKILL. Run alone in its window:

    SPARK_GRAFT_RECALL_INPUT=<lo>,<hi> python bench_resume_4800k.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

WORKDIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/dev/shm/arhivum_scale")
N_IMAGES = int(os.environ.get("SPARK_GRAFT_RECALL_N", "4800000"))
CORES = int(os.environ.get("SPARK_GRAFT_RECALL_CORES", "32"))


def pair_count(sizes: np.ndarray) -> float:
    return float(np.sum(sizes * (sizes - 1) / 2))


def main() -> None:
    from arhivum_spark import datagen
    from arhivum_spark.config import DedupConfig
    from arhivum_spark.plans.image_dedup import run_pipeline
    from arhivum_spark.session import get_spark
    from arhivum_spark.sources.checkpoints import StageStore

    os.environ.setdefault(
        "SPARK_LOCAL_DIRS", os.path.join(WORKDIR, "spark_local")
    )
    input_paths = os.environ["SPARK_GRAFT_RECALL_INPUT"].split(",")
    stage_root = os.path.join(WORKDIR, "stages_recall")
    manifest_before = json.load(open(os.path.join(stage_root, "manifest.json")))

    p = datagen.GenParams(n=N_IMAGES, seed=42, img_hw=96)
    truth = datagen.truth_clusters(p)

    spark = get_spark(
        f"recall_resume_{CORES}", cores=CORES, shuffle_partitions=4 * CORES
    )
    images = spark.read.parquet(*input_paths)
    t0 = time.time()
    out = run_pipeline(images, StageStore(spark, stage_root), DedupConfig())
    pred = out.select("image_id", "cluster_id").toPandas()
    wall = time.time() - t0
    n_clusters = pred["cluster_id"].nunique()
    spark.stop()

    manifest_after = json.load(open(os.path.join(stage_root, "manifest.json")))
    reused = sorted(
        s
        for s, m in manifest_before["stages"].items()
        if manifest_after["stages"].get(s, {}).get("committed_at")
        == m["committed_at"]
    )

    merged = truth.merge(
        pred, on="image_id", how="left", suffixes=("_t", "_p")
    )
    assert merged["cluster_id_p"].notna().all(), "pipeline lost truth rows"
    total = pair_count(merged.groupby("cluster_id_t").size().values)
    hit = pair_count(
        merged.groupby(["cluster_id_t", "cluster_id_p"]).size().values
    )
    per_t = merged.groupby("cluster_id_t")["cluster_id_p"].nunique()
    pred_pairs = pair_count(merged.groupby("cluster_id_p").size().values)
    print(
        json.dumps(
            {
                "metric": "dup_pair_recall_resumed_after_oom_kill",
                "n_images": N_IMAGES,
                "cores": CORES,
                "stages_reused_verbatim": reused,
                "truth_rows": int(len(truth)),
                "truth_pairs": total,
                "recall": round(hit / total, 6) if total else 1.0,
                "precision_on_truth_rows": (
                    round(hit / pred_pairs, 6) if pred_pairs else 1.0
                ),
                "split_truth_clusters": int((per_t > 1).sum()),
                "truth_clusters": int(per_t.size),
                "clusters": int(n_clusters),
                "resume_wall_sec": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
