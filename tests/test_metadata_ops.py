"""Tests for the round-2 metadata operators: EXIF struct extraction (F6),
detector registry + priority coalesce (U1/O4), hash verify (F2), and MIME
sniff (F5) — mirroring the reference's test surface (ExifExtractorTest,
CodeProjectDetectionServiceTest, HashServiceTest:125-150,
MetadataServiceTest)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from arhivum_spark import codec
from arhivum_spark.functions import scalars
from arhivum_spark.operators import detectors as det
from arhivum_spark.operators import multimodal


# --- F6 EXIF ---------------------------------------------------------------

def test_exif_trailer_roundtrip():
    fields = {
        "camera_make": "Canon", "camera_model": "EOS 5D",
        "datetime_original": 1577840400, "width": 10, "height": 10,
        "orientation": 3, "gps_lat": 1.25, "gps_lon": 2.5, "gps_alt": 31.1,
        "lens_model": "L1", "focal_length": 23.0, "aperture": 2.0,
        "shutter_speed": "1/8", "iso": 200, "flash_raw": 5,
    }
    import numpy as np
    img = codec.encode_lossless(np.zeros((4, 4, 3), dtype=np.uint8))
    blob = img + codec.encode_exif_trailer(fields)
    assert codec.parse_exif_trailer(blob) == fields
    assert codec.parse_exif_trailer(img) is None  # EXIF-less -> null
    # pixel payload untouched by the trailer
    assert codec.decode(blob[: len(img)]).shape == (4, 4, 3)


def test_extract_exif_struct_semantics(spark):
    # ids covering: no-EXIF (4), gps (0,3), no-gps (1,2), flash bit
    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_media_from_ids(ids, id_col="doc_id", with_exif=True)
    rows = {
        r["doc_id"]: r["exif"]
        for r in multimodal.extract_exif(media, id_col="doc_id").collect()
    }
    # ExifExtractor returns null when no EXIF directories exist
    assert rows[4] is None and rows[9] is None
    e0 = rows[0]
    assert e0["camera_make"] == "Canon" and e0["gps"] is not None
    assert e0["gps"]["latitude"] == -89.75
    # gps struct is null when no GPS tags (ExifExtractor.java:100-122)
    assert rows[1]["gps"] is None
    # flash = raw & 0x1 (ExifExtractor.java:151-155): id 5 -> raw 5 -> True,
    # id 2 -> raw 2 -> False
    assert rows[5]["flash"] is True and rows[2]["flash"] is False
    assert rows[3]["datetime_original"] == "2020-01-01 03:00:00"


# --- U1/O4 detector registry ----------------------------------------------

def _detector_frame(spark, marker_sets):
    """One folder row per entry; marker_sets is a list of sets of marker
    names that exist in that folder."""
    all_markers = ["pom", "gradle", "package_json", "go_mod", "python",
                   "cargo", "git", "src"]
    rows = [
        tuple([i] + [m in ms for m in all_markers])
        for i, ms in enumerate(marker_sets)
    ]
    df = spark.createDataFrame(rows, ["fid"] + all_markers)
    has = {m: F.col(m) for m in all_markers}
    meta = {
        "group_id": F.lit("g"), "artifact": F.lit("a"),
        "version": F.lit("1.0"), "npm_name": F.lit("pkg"),
        "module_path": F.lit("example.org/m"), "py_name": F.lit("py"),
        "crate": F.lit("cr"), "remote": F.lit("git@host:r"),
        "branch": F.lit("main"), "folder_name": F.concat(F.lit("f"), "fid"),
    }
    return det.detect_projects(df, det.reference_detectors(has, meta))


def test_detector_priority_first_match_wins(spark):
    # CodeProjectDetectionServiceTest semantics: Maven(10) beats Git(5)
    # beats Generic(0); among priority-10 detectors, registration order wins
    out = {
        r["fid"]: (r["project_type"], r["identifier"], r["is_code_project"])
        for r in _detector_frame(
            spark,
            [
                {"pom", "git", "src"},          # maven wins over git/generic
                {"git", "src"},                 # git wins over generic
                {"src"},                        # generic fallback
                set(),                          # nothing -> null, not code
                {"gradle", "package_json"},     # tie at 10: gradle registered first
                {"cargo", "git"},               # rust (10) over git (5)
            ],
        ).collect()
    }
    assert out[0] == ("MAVEN", "g:a:1.0", True)
    assert out[1] == ("GIT", "git@host:r@main", True)
    assert out[2] == ("GENERIC", "unknown:f2", True)
    assert out[3] == (None, None, False)
    assert out[4] == ("GRADLE", "g:a:1.0", True)
    assert out[5] == ("RUST", "cr:1.0", True)


def test_detector_registry_pluggable(spark):
    # U1: appending a higher-priority custom detector changes the election
    df = spark.createDataFrame([(1, True)], ["fid", "pom"])
    custom = det.Detector(
        "CUSTOM", 99, F.col("pom"), F.lit("custom:id")
    )
    base = det.Detector("MAVEN", 10, F.col("pom"), F.lit("g:a:1"))
    row = det.detect_projects(df, [base, custom]).collect()[0]
    assert row["project_type"] == "CUSTOM"


# --- two-phase global row number (W3) --------------------------------------

def test_global_row_number_matches_naive_window(spark):
    from pyspark.sql import Window
    from arhivum_spark.operators.ordering import global_row_number

    df = spark.range(0, 1000).select(
        (F.col("id") * 7919 % 1000).alias("k")  # shuffled distinct keys
    )
    got = {
        r["k"]: r["_rn"] for r in global_row_number(df, "k", 8).collect()
    }
    naive = {
        r["k"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k"))
        ).collect()
    }
    assert got == naive


# --- F2 hash verify / F5 MIME sniff ---------------------------------------

def test_verify_hash_case_insensitive(spark):
    # HashServiceTest.java:125-150: verify matches, case-insensitively
    good = hashlib.sha256(b"hello").hexdigest()
    df = spark.createDataFrame(
        [("hello", good), ("hello", good.upper()), ("hello", "0" * 64)],
        ["content", "stored"],
    )
    flags = [
        r[0]
        for r in df.select(scalars.verify_hash("content", "stored")).collect()
    ]
    assert flags == [True, True, False]


# --- bucketed embedding near-dup (replaces the crossJoin) ------------------

def test_rhp_neardup_matches_exact_and_avoids_crossjoin(spark):
    from tests.conftest import SF_TEST_DIR
    from arhivum_spark.operators import embeddings

    emb = spark.read.parquet(f"{SF_TEST_DIR}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in embeddings.cosine_neardup_pairs(emb, threshold=0.4).collect()
    }
    blocked_df = embeddings.rhp_neardup_pairs(
        emb, threshold=0.4, nbits=2, n_tables=16
    )
    blocked = {(r.id_a, r.id_b, r.cosine) for r in blocked_df.collect()}
    assert blocked == exact
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "hexmagic,ext,expected",
    [
        ("89504E470D0A1A0A", "bin", "image/png"),
        ("FFD8FFE000104A46", "png", "image/jpeg"),  # magic beats extension
        ("0011223344556677", "json", "application/json"),  # ext fallback
        ("0011223344556677", "weird", "application/octet-stream"),
        ("4152564C01000100", "bin", "image/x-arv"),
    ],
)
def test_sniff_mime(spark, hexmagic, ext, expected):
    df = spark.range(1).select(
        F.unhex(F.lit(hexmagic)).alias("blob"), F.lit(ext).alias("ext")
    )
    assert df.select(scalars.sniff_mime("blob", "ext")).collect()[0][0] == expected
