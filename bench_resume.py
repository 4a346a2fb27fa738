"""Mid-pipeline kill + resume at 600k images (north-rule evidence).

The north rule requires that "every stage writes per-partition metrics and
checkpoints so the job resumes mid-pipeline after executor loss". The unit
test (tests/test_pipeline_recall.py::test_resume_reuses_committed_stages)
proves stage reuse with a poisoned input at toy scale; this bench proves the
same contract at bench scale with a REAL process death:

  phase 1  full run on a fresh stage root          -> wall_full, clusters
  phase 2  fresh root; SIGKILL the whole process
           group mid-stage-3 (driver + local JVM)  -> partial stage root
  phase 3  rerun the identical job on that root    -> wall_resume, clusters

Pass criteria, printed as one JSON line:
  - phase-3 clusters == phase-1 clusters (resume is semantics-preserving)
  - manifest committed_at timestamps for the stages that survived the kill
    are IDENTICAL before and after phase 3 (they were reused, not rewritten)
  - wall_resume < wall_full (the reused stages' cost was actually skipped)

Run alone in its window (shared box):  python bench_resume.py
Reuses bench_scaling.py's 600k input at /dev/shm/arhivum_scale.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

WORKDIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/dev/shm/arhivum_scale")
N_IMAGES = int(os.environ.get("SPARK_GRAFT_RESUME_N", "600000"))
IMG_HW = 96
CORES = int(os.environ.get("SPARK_GRAFT_RESUME_CORES", "32"))
# kill this long after s2_exact commits — lands inside stage 3 (LSH
# candidates), whose 600k/local[32] wall is ~20-30 s
KILL_DELAY_AFTER_S2 = float(os.environ.get("SPARK_GRAFT_RESUME_KILL_DELAY", "8"))

INPUT = os.path.join(WORKDIR, f"images_n{N_IMAGES}_hw{IMG_HW}.parquet")


def _manifest(root: str) -> dict:
    try:
        with open(os.path.join(root, "manifest.json")) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"stages": {}}


def run_job(stage_root: str) -> dict:
    """One full pipeline attempt (called in-process for phases 1 and 3,
    as a child process for phase 2)."""
    from arhivum_spark.config import DedupConfig
    from arhivum_spark.plans.image_dedup import run_pipeline
    from arhivum_spark.session import get_spark
    from arhivum_spark.sources.checkpoints import StageStore

    spark = get_spark(
        f"resume_{CORES}", cores=CORES, shuffle_partitions=4 * CORES
    )
    images = spark.read.parquet(INPUT)
    t0 = time.time()
    out = run_pipeline(images, StageStore(spark, stage_root), DedupConfig())
    n_rows = out.count()
    wall = time.time() - t0
    n_clusters = out.select("cluster_id").distinct().count()
    spark.stop()
    return {"wall_sec": round(wall, 1), "rows": n_rows, "clusters": n_clusters}


def killed_run(stage_root: str) -> dict:
    """Launch run_job in a child process group; SIGKILL the whole group
    (python driver AND the local-mode JVM) mid-stage-3."""
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_DIRS", os.path.join(WORKDIR, "spark_local"))
    child = subprocess.Popen(
        [sys.executable, __file__, "--child", stage_root],
        env=env,
        start_new_session=True,  # own process group -> killpg reaps the JVM
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    s2_at = None
    while True:
        if child.poll() is not None:
            raise RuntimeError(
                "child finished before the kill fired — raise "
                "SPARK_GRAFT_RESUME_N or lower SPARK_GRAFT_RESUME_KILL_DELAY"
            )
        stages = _manifest(stage_root)["stages"]
        if s2_at is None and "s2_exact" in stages:
            s2_at = time.time()
        if s2_at is not None and time.time() - s2_at >= KILL_DELAY_AFTER_S2:
            break
        if time.time() - t0 > 1800:
            os.killpg(child.pid, signal.SIGKILL)
            raise RuntimeError("child never reached s2_exact in 30 min")
        time.sleep(0.5)
    os.killpg(child.pid, signal.SIGKILL)
    child.wait()
    killed_after = round(time.time() - t0, 1)
    # give the OS a beat to reap the JVM before phase 3 starts its own
    time.sleep(3)
    stages = _manifest(stage_root)["stages"]
    return {
        "killed_after_sec": killed_after,
        "committed_at_kill": sorted(stages),
        "committed_ts": {s: stages[s]["committed_at"] for s in stages},
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_job(sys.argv[2])
        return

    if not os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        raise SystemExit(
            f"input {INPUT} missing — run bench_scaling.py's generate_input "
            "first (or set SPARK_GRAFT_RESUME_N to an existing size)"
        )
    os.environ.setdefault(
        "SPARK_LOCAL_DIRS", os.path.join(WORKDIR, "spark_local")
    )

    root_full = os.path.join(WORKDIR, "resume_full")
    root_kill = os.path.join(WORKDIR, "resume_killed")
    shutil.rmtree(root_full, ignore_errors=True)
    shutil.rmtree(root_kill, ignore_errors=True)

    full = run_job(root_full)
    kill = killed_run(root_kill)
    resumed = run_job(root_kill)
    stages_after = _manifest(root_kill)["stages"]

    reused = [
        s
        for s in kill["committed_ts"]
        if stages_after.get(s, {}).get("committed_at")
        == kill["committed_ts"][s]
    ]
    result = {
        "metric": "resume_after_kill",
        "n_images": N_IMAGES,
        "cores": CORES,
        "full": full,
        "killed": kill,
        "resume": resumed,
        "stages_reused_verbatim": sorted(reused),
        "resume_matches_full": resumed["clusters"] == full["clusters"]
        and resumed["rows"] == full["rows"],
        "resume_faster": resumed["wall_sec"] < full["wall_sec"],
    }
    shutil.rmtree(root_full, ignore_errors=True)
    shutil.rmtree(root_kill, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
