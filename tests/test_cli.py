"""End-to-end test of the spark-submit entry point (arhivum_spark.cli):
run the full pipeline through the CLI surface on a small synthetic corpus,
check the written cluster table, and prove resume (a second invocation
with the same --stage-dir recomputes nothing and returns identical
output)."""

from __future__ import annotations

import os

from arhivum_spark import datagen
from arhivum_spark.cli import run


def _argv(tmp, extra=()):
    return [
        "--input", os.path.join(tmp, "images"),
        "--output", os.path.join(tmp, "clusters"),
        "--stage-dir", os.path.join(tmp, "stages"),
        "--captions-out", os.path.join(tmp, "captions"),
        *extra,
    ]


def test_cli_end_to_end_and_resume(spark, tmp_path):
    tmp = str(tmp_path)
    params = datagen.GenParams(n=400, seed=11, img_hw=48)
    datagen.images_df(spark, params, partitions=8).write.parquet(
        os.path.join(tmp, "images")
    )

    m1 = run(_argv(tmp), spark=spark)
    assert m1["rows"] == 400
    assert 0 < m1["clusters"] < 400
    assert m1["duplicates"] == 400 - m1["clusters"]
    assert set(m1["stage_seconds"]) >= {
        "s1_signatures", "s2_exact", "s3_candidates", "s4_clusters",
    }
    out = spark.read.parquet(os.path.join(tmp, "clusters"))
    assert set(out.columns) == {
        "image_id", "cluster_id", "is_duplicate", "representative_id",
        "content_sha256",
    }
    caps = spark.read.parquet(os.path.join(tmp, "captions"))
    assert {"id_a", "id_b", "pair_class"} <= set(caps.columns)

    a = sorted(
        (r.image_id, r.cluster_id, r.is_duplicate) for r in out.collect()
    )
    # resume: same stage dir -> all stages read from manifests, identical
    # output (collected above BEFORE the rerun overwrites the files)
    m2 = run(_argv(tmp), spark=spark)
    assert m2["rows"] == m1["rows"]
    assert m2["clusters"] == m1["clusters"]
    out2 = spark.read.parquet(os.path.join(tmp, "clusters"))
    b = sorted(
        (r.image_id, r.cluster_id, r.is_duplicate) for r in out2.collect()
    )
    assert a == b


def test_cli_config_overrides(spark, tmp_path):
    tmp = str(tmp_path)
    params = datagen.GenParams(n=120, seed=5, img_hw=48)
    datagen.images_df(spark, params, partitions=4).write.parquet(
        os.path.join(tmp, "images")
    )
    m = run(
        _argv(tmp, extra=["--no-psnr-verify", "--max-pairs-per-band", "512"]),
        spark=spark,
    )
    assert m["rows"] == 120
    assert "s3b_psnr" not in m["stage_seconds"]
