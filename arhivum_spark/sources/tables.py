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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TPCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def try_iceberg(spark: SparkSession, table: str) -> DataFrame | None:
    """Read an Iceberg table if the runtime has the connector; else None.

    On a production cluster the input is an Iceberg table of image+caption
    pairs (BASELINE.json input_hint); this sandbox image lacks the Iceberg
    runtime jars, so callers fall back to parquet checkpoints.
    """
    try:
        return spark.read.format("iceberg").load(table)
    except Exception:
        return None
