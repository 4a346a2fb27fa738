"""arhivum_spark — a PySpark-native near-duplicate detection & clustering engine.

A from-scratch reimplementation of the *capabilities* of the reference
archiving/dedup system (hmichopoulos/arhivum, surveyed in SURVEY.md):
content-hash dedup, first/best-wins duplicate flagging, group set
fingerprints, Jaccard similarity, transitive duplicate grouping — re-expressed
as a distributed Spark signature pipeline (MinHash over pixel-block shingles,
SimHash over captions, LSH banding with skew salting, connected-components
clustering) designed for 10^12-row Iceberg/parquet tables.

Layout:
    session      — tuned SparkSession builders (local[N] for tests/bench)
    config       — pipeline configuration (shingle/signature/LSH parameters)
    codec        — deterministic synthetic image codec (no image libs in env)
    datagen      — seeded synthetic image+caption table with planted dup cohorts
    functions/   — scalar/signature kernels (sha256, minhash, simhash, phash, text)
    operators/   — relational operators (exact dedup, LSH join, connected
                   components, zones, rollups, text dedup, ANN)
    sources/     — table loaders + checkpoint/manifest stage IO
    plans/       — end-to-end pipelines (image dedup with stage checkpoints)
    streaming/   — incremental dedup via Structured Streaming
"""

__version__ = "0.1.0"
