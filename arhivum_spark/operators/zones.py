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

    The deepest-match window partitions on a per-row surrogate id, not the
    path VALUE: two input rows sharing a path (the same file seen from two
    scans) must each keep their own output row, and a null/empty path must
    survive with zone = null (explode_outer) rather than vanish.

    ``sep`` is a LITERAL separator (quoted for the split's regex): '.'
    splits on dots, '\\' on backslashes — not on regex metacharacters.
    """
    # F.split takes a regex but concat_ws a literal — quote the separator
    # so both agree for any sep (an unquoted '.' split on EVERY char and
    # no prefix ever matched)
    parts = F.split(F.col(path_col), "\\Q" + sep + "\\E")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.concat_ws(sep, F.slice(parts, 1, i)),
    )
    exploded = df.withColumn(
        "_zrid", F.monotonically_increasing_id()
    ).withColumn("_prefix", F.explode_outer(prefixes))
    joined = exploded.join(
        F.broadcast(
            zone_table.select(
                F.col("folder_path").alias("_prefix"), F.col("zone")
            )
        ),
        "_prefix",
        "left",
    )
    w = Window.partitionBy("_zrid").orderBy(
        F.col("zone").isNull().asc(), F.length("_prefix").desc()
    )
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .withColumn(
            "is_inherited",
            F.col("zone").isNotNull() & (F.col("_prefix") != F.col(path_col)),
        )
        .drop("_rk", "_prefix", "_zrid")
    )


def dedup_eligible(df: DataFrame, zone_col: str = "zone") -> DataFrame:
    """P6: only DEDUP_ZONES rows enter duplicate grouping; null zone excluded."""
    return df.filter(F.col(zone_col).isin(*DEDUP_ZONES))


def group_dedup_gate(
    df: DataFrame, hash_col: str, zone_col: str = "zone"
) -> DataFrame:
    """Mixed-zone duplicate-GROUP handling (docs/shared/DEDUPLICATION.md:59-77):
    a duplicate group containing ANY member whose zone blocks dedup is
    skipped ENTIRELY — eligible members of a mixed group must not be
    flagged, because the blocked copy may be the one the user relies on.

    Distributed form: per-group max of the blocking predicate (one
    partial-aggregated shuffle on the hash key) joined back, then a plain
    filter. Adds `group_blocked` before filtering so callers can audit
    what was skipped; returns only rows of groups where no member blocks.
    """
    blocks = ~F.col(zone_col).isin(*DEDUP_ZONES) | F.col(zone_col).isNull()
    # a null hash is its own singleton group (null != null in the join
    # key): such rows must be gated on their OWN zone, not silently
    # dropped by the inner join below
    null_rows = df.filter(F.col(hash_col).isNull()).filter(~blocks)
    keyed = df.filter(F.col(hash_col).isNotNull())
    flags = (
        keyed.withColumn("_blocks", blocks)
        .groupBy(hash_col)
        .agg(F.max("_blocks").alias("group_blocked"))
    )
    return (
        keyed.join(flags, hash_col)
        .filter(~F.col("group_blocked"))
        .drop("group_blocked")
        .unionByName(null_rows)
    )
