"""Hierarchical zone classification as a longest-prefix join (J4).

The reference walks ancestor folders one at a time until an explicit zone is
found (FolderZoneService.java:43-64, parent step :126-142) — a per-row loop
against a DB. Distributed form: explode every ancestor prefix of a row's
path, equi-join against the (small, broadcast) zone table on the prefix, and
keep the deepest match per row with a ranking window. Zone-gated dedup
eligibility (P6, docs/shared/DEDUPLICATION.md:13-21) is then a plain filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Zones whose files participate in dedup (archivum-api enums/Zone.java javadoc;
# rules table docs/shared/DEDUPLICATION.md:13-21).
DEDUP_ZONES = ("MEDIA", "DOCUMENTS", "BOOKS", "SOFTWARE_LIB")
ALL_ZONES = (
    "MEDIA",
    "DOCUMENTS",
    "BOOKS",
    "SOFTWARE_LIB",
    "SOFTWARE",
    "BACKUP",
    "CODE",
    "UNKNOWN",
)


def resolve_zones(
    df: DataFrame,
    zone_table: DataFrame,
    path_col: str = "path",
    sep: str = "/",
) -> DataFrame:
    """Attach (zone, is_inherited) to each row by longest-prefix match.

    zone_table: (folder_path, zone). The zone table is per-user config —
    tiny — so the join is broadcast; the only shuffle is the explode-side
    window, bounded by path depth.
    """
    parts = F.split(F.col(path_col), sep)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.concat_ws(sep, F.slice(parts, 1, i)),
    )
    exploded = df.withColumn("_prefix", F.explode(prefixes))
    joined = exploded.join(
        F.broadcast(
            zone_table.select(
                F.col("folder_path").alias("_prefix"), F.col("zone")
            )
        ),
        "_prefix",
        "left",
    )
    w = Window.partitionBy(path_col).orderBy(
        F.col("zone").isNull().asc(), F.length("_prefix").desc()
    )
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .withColumn(
            "is_inherited",
            F.col("zone").isNotNull() & (F.col("_prefix") != F.col(path_col)),
        )
        .drop("_rk", "_prefix")
    )


def dedup_eligible(df: DataFrame, zone_col: str = "zone") -> DataFrame:
    """P6: only DEDUP_ZONES rows enter duplicate grouping; null zone excluded."""
    return df.filter(F.col(zone_col).isin(*DEDUP_ZONES))
