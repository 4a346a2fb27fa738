"""spark-submit entry point for the image near-duplicate pipeline.

The north-rule launch shape (BASELINE.json: "run via spark-submit
--py-files on a multi-executor cluster"):

    zip -r arhivum_spark.zip arhivum_spark
    spark-submit --master <cluster> --py-files arhivum_spark.zip \
        arhivum_spark/cli.py \
        --input  s3://bucket/images_table \
        --output s3://bucket/clusters \
        --stage-dir s3://bucket/stages/run1 \
        --captions-out s3://bucket/caption_pairs

No master/executor settings are hardcoded: spark-submit (or any cluster
manager) owns them; running under plain `python -m arhivum_spark.cli`
falls back to a local session. The job is resumable: rerunning with the
same --stage-dir skips every committed stage (StageStore manifests), the
reference's resume-<1%-duplicate-work contract (REQUIREMENTS.md:358).

Input table schema = the BASELINE.json input_hint: (image_id string,
bytes binary, w int, h int, fmt string, caption string, phash long) —
extra columns are ignored.

Prints ONE JSON line of run metrics on success (rows, clusters,
duplicates, wall seconds, per-stage seconds).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="arhivum_spark.cli", description=__doc__.split("\n", 1)[0]
    )
    p.add_argument("--input", required=True, help="input image table (parquet)")
    p.add_argument("--output", required=True, help="cluster table output dir")
    p.add_argument(
        "--stage-dir", required=True,
        help="checkpoint root; rerun with the same dir to resume",
    )
    p.add_argument(
        "--captions-out", default=None,
        help=(
            "optional output dir for caption near-dup/containment pairs. "
            "NOTE: containment rows are a COVERING edge set, not the full "
            "pair enumeration — identical captions are collapsed to a "
            "min-id representative (rep-level containment edges plus "
            "bidirectional identity-star edges). The full relation is "
            "recovered by substituting, for each endpoint, every member "
            "of its identity group (connected-components consumers need "
            "no expansion — components are unchanged)."
        ),
    )
    # the config knobs a cluster operator actually tunes per-corpus;
    # everything else keeps the measured defaults in config.DedupConfig
    p.add_argument("--min-signature-agreement", type=float, default=None)
    p.add_argument("--psnr-edge-min-db", type=float, default=None)
    p.add_argument("--no-psnr-verify", action="store_true")
    p.add_argument("--hot-band-threshold", type=int, default=None)
    p.add_argument("--max-pairs-per-band", type=int, default=None)
    return p


def run(argv: list[str] | None = None, spark=None) -> dict:
    """Programmatic form of main() — returns the metrics dict."""
    from pyspark.sql import SparkSession

    from arhivum_spark.config import DedupConfig
    from arhivum_spark.plans.image_dedup import caption_pairs, run_pipeline
    from arhivum_spark.sources.checkpoints import StageStore

    args = build_parser().parse_args(argv)
    overrides = {
        k: v
        for k, v in {
            "min_signature_agreement": args.min_signature_agreement,
            "psnr_edge_min_db": args.psnr_edge_min_db,
            "hot_band_threshold": args.hot_band_threshold,
            "max_pairs_per_band": args.max_pairs_per_band,
        }.items()
        if v is not None
    }
    if args.no_psnr_verify:
        overrides["psnr_verify_enabled"] = False
    cfg = DedupConfig(**overrides)

    own_session = spark is None
    if own_session:
        # under spark-submit the builder inherits the submitted conf
        # (master, executors, --py-files); standalone it builds local
        spark = SparkSession.builder.appName("arhivum-image-dedup").getOrCreate()

    t0 = time.time()
    images = spark.read.parquet(args.input)
    store = StageStore(spark, args.stage_dir)
    clusters = run_pipeline(images, store, cfg)
    clusters.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    n_rows = out.count()
    n_clusters = out.select("cluster_id").distinct().count()
    n_dups = out.filter("is_duplicate").count()

    if args.captions_out:
        sigs = store.read("s1_signatures")
        caption_pairs(sigs, store, cfg).write.mode("overwrite").parquet(
            args.captions_out
        )

    mdf = store.metrics()
    stage_secs = (
        {
            r["stage"]: round(r["max(write_seconds)"], 1)
            for r in mdf.groupBy("stage")
            .agg({"write_seconds": "max"})
            .collect()
        }
        if mdf is not None
        else {}
    )
    metrics = {
        "rows": n_rows,
        "clusters": n_clusters,
        "duplicates": n_dups,
        "wall_seconds": round(time.time() - t0, 1),
        "stage_seconds": stage_secs,
        "output": args.output,
    }
    if own_session:
        spark.stop()
    return metrics


def main(argv: list[str] | None = None) -> None:
    print(json.dumps(run(argv)))


if __name__ == "__main__":
    main(sys.argv[1:])
