"""Table loaders for the driver testdata and pipeline stage IO.

The reference ingests scanner JSON batches into PostgreSQL
(archivum-server FileService.java:47-98); here a "source" is just a parquet
or Iceberg table. Iceberg needs jars absent from this image, so the stage
checkpoint mechanism (sources/checkpoints.py) writes parquet snapshots with a
JSON manifest — same atomic-commit, resume-from-snapshot semantics the
reference gets from its batch-%04d.json files (OutputService.java:73-99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/column pruning into it."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# On a production cluster the input is an Iceberg table of image+caption
# pairs (BASELINE.json input_hint) read via spark.read.format("iceberg");
# this sandbox image lacks the Iceberg runtime jars, so every consumer
# reads parquet through load_table and the stage store's parquet+manifest
# checkpoints (sources/checkpoints.py) stand in for Iceberg snapshots.
