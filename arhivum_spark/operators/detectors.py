"""U1/O4 — pluggable project-detector registry + priority coalesce.

Reference semantics (archivum-scanner CodeProjectDetectionService.java:20-59):
a list of detectors sorted by priority (highest first, stable for ties —
construction order Maven, Gradle, Npm, Go, Python, Rust at 10; Git at 5;
Generic at 0); detectProject runs them in order and returns the FIRST
match; isCodeProject is anyMatch.

Spark-first shape: a detector is a (name, priority, marker Column,
identifier Column) row over a per-folder DataFrame; the whole registry
compiles to ONE `coalesce(when(marker, struct(type, identifier)), ...)`
expression — a single codegen'd projection, no joins, no UDFs, so it runs
at scan speed on 10^12 folder rows. Adding a detector = appending to the
list (the reference's pluggable extension point, ProjectDetector.java:21-39).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Detector:
    """One pluggable detector: fires when `marker` is true, yielding
    `identifier` (MavenProjectDetector.java:27-96 et al.)."""

    name: str  # projectType (MAVEN / NPM / GIT / ...)
    priority: int  # higher wins; ties broken by registry order (stable sort)
    marker: Column  # boolean: the canDetect() analogue over folder columns
    identifier: Column  # string: the detect() identifier expression


def detect_projects(
    folders: DataFrame, detectors: list[Detector]
) -> DataFrame:
    """Adds `project_type`, `identifier` (first match in priority order,
    null when nothing fires) and `is_code_project` (any marker fires —
    CodeProjectDetectionService.isCodeProject)."""
    if not detectors:
        # empty registry = nothing fires (reference: anyMatch over an
        # empty list is false, detectProject returns no match)
        return (
            folders.withColumn("project_type", F.lit(None).cast("string"))
            .withColumn("identifier", F.lit(None).cast("string"))
            .withColumn("is_code_project", F.lit(False))
        )
    ordered = sorted(
        enumerate(detectors), key=lambda t: (-t[1].priority, t[0])
    )
    first_match = F.coalesce(
        *[
            F.when(
                d.marker,
                F.struct(
                    F.lit(d.name).alias("project_type"),
                    d.identifier.alias("identifier"),
                ),
            )
            for _, d in ordered
        ]
    )
    any_marker = ordered[0][1].marker
    for _, d in ordered[1:]:
        any_marker = any_marker | d.marker
    return (
        folders.withColumn("_det", first_match)
        .withColumn("project_type", F.col("_det.project_type"))
        .withColumn("identifier", F.col("_det.identifier"))
        .withColumn("is_code_project", F.coalesce(any_marker, F.lit(False)))
        .drop("_det")
    )


def reference_detectors(
    has: dict[str, Column], meta: dict[str, Column]
) -> list[Detector]:
    """The reference's 8 detectors over marker-flag + metadata columns.

    `has` keys: pom, gradle, package_json, go_mod, python, cargo, git, src.
    `meta` keys: group_id, artifact, version, npm_name, module_path,
    py_name, crate, remote, branch, folder_name — Column expressions the
    caller derives from its folder table (the distributed analogue of each
    detector parsing its marker file).

    Identifier formats match the reference exactly:
    Maven/Gradle g:a:v (MavenProjectDetector.java:76), npm name:version
    (NpmProjectDetector.java:46), Go module path (GoProjectDetector.java:46),
    Python/Rust name:version (PythonProjectDetector.java:90,
    RustProjectDetector.java:48), Git remote@branch
    (GitProjectDetector.java:45), Generic unknown:name
    (GenericCodeDetector.java:72).
    """
    gav = F.concat_ws(
        ":", meta["group_id"], meta["artifact"], meta["version"]
    )
    return [
        Detector("MAVEN", 10, has["pom"], gav),
        Detector("GRADLE", 10, has["gradle"], gav),
        Detector(
            "NPM", 10, has["package_json"],
            F.concat_ws(":", meta["npm_name"], meta["version"]),
        ),
        Detector("GO", 10, has["go_mod"], meta["module_path"]),
        Detector(
            "PYTHON", 10, has["python"],
            F.concat_ws(":", meta["py_name"], meta["version"]),
        ),
        Detector(
            "RUST", 10, has["cargo"],
            F.concat_ws(":", meta["crate"], meta["version"]),
        ),
        Detector(
            # concat_ws, not concat: a null remote/branch must drop out
            # (matching DuckDB concat's ignore-NULL oracle semantics and
            # the other detectors' concat_ws), not null the identifier
            "GIT", 5, has["git"],
            F.concat_ws("", meta["remote"], F.lit("@"), meta["branch"]),
        ),
        Detector(
            "GENERIC", 0, has["src"],
            F.concat_ws("", F.lit("unknown:"), meta["folder_name"]),
        ),
    ]
