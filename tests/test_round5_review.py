"""Round-5 adversarial-review regression gates.

Each test plants the exact failure scenario a final-round review found:

1. resolve_zones must not drop rows — two input rows sharing a path each
   keep an output row (the window partitions on row identity, not the
   path VALUE), and a null-path row survives with zone = null instead of
   vanishing through the explode.
2. flag_duplicates_stateful is id-type generic: the engine's canonical
   string image_ids must flow through the state schema (previously
   hardcoded `long` + int(rid) — any non-integer id crashed the UDF).
3. codec EXIF trailer round-trip over repr's full output domain:
   apostrophe strings (repr switches to double quotes), floats whose
   str() lacks a '.' (1e+20 / inf), and per-row isolation in
   extract_exif — one corrupt trailer yields a null struct, it must not
   fail the whole mapInPandas stage.
4. group_content_hash streaming-digest parity: the bounded-memory
   sorted-run kernel must byte-match the collect_list/sort_array/sha2
   formulation, including null hashes (dropped from the digest, counted
   in n_members) and groups spanning multiple Arrow batches.

A second review pass over the fixes themselves found three more defects,
gated at the bottom of this file:

5. extract_exif's per-row isolation covered only the trailer PARSE; a
   trailer that parses but carries an unexpected field type (a string
   datetime_original hitting int(dt), a string flash_raw hitting & 0x1)
   still failed the whole stage — the struct-building coercions belong
   inside the same try.
6. group_content_hash cast the hash column to string BEFORE sorting
   (lexicographic '10' < '2'), while the documented-equivalent
   collect_list/sort_array formulation sorts the TYPED values and casts
   after — numeric hash columns diverged. The sort key is now the typed
   column; the digest input is Spark's cast-to-string, exactly what
   concat_ws would feed.
7. group_content_hash run detection used Python/numpy `!=`, which splits
   NaN group keys into per-row runs (Spark grouping treats NaN as one
   group) and raises on array-typed keys. Keys are canonicalized
   (NaN sentinel, -0.0 -> 0.0, arrays -> tuples) before comparison.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from arhivum_spark import codec


# ---------------------------------------------------------------------------
# 1. resolve_zones row identity


def test_resolve_zones_keeps_duplicate_and_null_paths(spark):
    from arhivum_spark.operators.zones import resolve_zones

    rows = [
        (1, "media/photos/a.jpg"),   # same path twice: two scan sources
        (2, "media/photos/a.jpg"),
        (3, None),                   # null path must survive, zone null
        (4, "code/proj/x.py"),
    ]
    df = spark.createDataFrame(rows, "id int, path string")
    zones = spark.createDataFrame(
        [("media", "MEDIA"), ("code", "CODE")], "folder_path string, zone string"
    )
    out = resolve_zones(df, zones).collect()
    assert len(out) == 4  # contract: one output row per input row
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["zone"] == "MEDIA" and by_id[2]["zone"] == "MEDIA"
    assert by_id[1]["is_inherited"] and by_id[2]["is_inherited"]
    assert by_id[3]["zone"] is None
    assert by_id[4]["zone"] == "CODE"


# ---------------------------------------------------------------------------
# 2. stateful first-wins with string ids


def test_flag_duplicates_stateful_string_ids(spark, tmp_path):
    from arhivum_spark.streaming.ingest import flag_duplicates_stateful

    src = str(tmp_path / "src")
    rows = [
        ("img-%06d" % i, "h%d" % (i % 3)) for i in range(30)
    ]
    spark.createDataFrame(
        rows, "image_id string, content_sha256 string"
    ).repartition(3).write.parquet(src)

    stream = spark.readStream.schema(
        "image_id string, content_sha256 string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        flag_duplicates_stateful(
            stream, id_col="image_id", order_within_batch=True
        )
        .writeStream.format("memory")
        .queryName("flagged_str")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM flagged_str")
    assert got.count() == 30  # nothing dropped, no type crash
    assert dict(got.dtypes)["representative_id"] == "string"
    per_key = got.groupBy("content_sha256").agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_duplicate").cast("int")).alias("dups"),
        F.countDistinct("representative_id").alias("reps"),
        F.max("seen_before").alias("mx"),
    )
    bad = per_key.filter(
        (F.col("dups") != F.col("n") - 1)
        | (F.col("reps") != 1)
        | (F.col("mx") != F.col("n") - 1)
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# 3. EXIF trailer robustness


def test_exif_trailer_roundtrip_hostile_values():
    fields = {
        "camera_make": "O'Reilly",          # repr -> double quotes
        "camera_model": 'say "cheese"',     # repr -> single quotes
        "gps_alt": 1e20,                    # str() has no '.'
        "gps_lat": float("inf"),
        "iso": 3200,
        "aperture": 2.8,
    }
    blob = codec.encode_exif_trailer(fields)
    out = codec.parse_exif_trailer(b"imagebytes" + blob)
    assert out["camera_make"] == "O'Reilly"
    assert out["camera_model"] == 'say "cheese"'
    assert out["gps_alt"] == 1e20
    assert math.isinf(out["gps_lat"])
    assert out["iso"] == 3200 and out["aperture"] == 2.8


def test_extract_exif_isolates_corrupt_trailer(spark):
    from arhivum_spark.operators.multimodal import extract_exif

    good = codec.encode_exif_trailer({"iso": 100, "camera_make": "ACME"})
    # magic present but body truncated mid-length-prefix: struct.error
    corrupt = codec.MAGIC_EXIF + b"\xff\xff\xff\x7f\x01"
    df = spark.createDataFrame(
        [
            ("a", bytearray(b"xx" + good)),
            ("b", bytearray(corrupt)),
            ("c", None),  # null bytes column
        ],
        "image_id string, bytes binary",
    )
    out = {r["image_id"]: r["exif"] for r in extract_exif(df).collect()}
    assert out["a"] is not None and out["a"]["iso"] == 100
    assert out["b"] is None  # corrupt -> null struct, stage survived
    assert out["c"] is None


# ---------------------------------------------------------------------------
# 4. group_content_hash streaming parity


def test_group_content_hash_matches_collect_list_formula(spark):
    from arhivum_spark.operators.group_analytics import group_content_hash

    # 3 groups; one spans multiple Arrow batches (> default 10k rows per
    # batch) so the cross-batch digest carry is exercised; null hashes
    # are dropped from the digest but counted
    rows = (
        [("big", "h%08d" % (i * 7919 % 25000)) for i in range(25000)]
        + [("small", "zzz"), ("small", "aaa"), ("small", None)]
        + [("one", "only")]
    )
    df = spark.createDataFrame(rows, "source string, sha256 string")
    got = {
        r["source"]: (r["content_hash"], r["n_members"])
        for r in group_content_hash(df, "source", "sha256").collect()
    }
    ref = {
        r["source"]: (r["content_hash"], r["n_members"])
        for r in df.groupBy("source")
        .agg(
            F.sha2(
                F.concat_ws("", F.sort_array(F.collect_list("sha256"))), 256
            ).alias("content_hash"),
            F.count("*").alias("n_members"),
        )
        .collect()
    }
    assert got == ref
    assert got["small"][1] == 3  # null counted
    assert len(got) == 3


# ---------------------------------------------------------------------------
# 5-7. second-pass fixes: typed hash sort, NaN/array group keys,
# struct-coercion isolation in extract_exif


def test_extract_exif_isolates_bad_field_types(spark):
    from arhivum_spark.operators.multimodal import extract_exif

    good = codec.encode_exif_trailer({"iso": 100, "camera_make": "ACME"})
    # parses fine, but datetime_original is a string -> int(dt) raises
    bad_dt = codec.encode_exif_trailer(
        {"datetime_original": "2021:01:01 00:00:00"}
    )
    # parses fine, but flash_raw is a string -> & 0x1 raises
    bad_flash = codec.encode_exif_trailer({"flash_raw": "on"})
    df = spark.createDataFrame(
        [
            ("a", bytearray(b"xx" + good)),
            ("b", bytearray(b"xx" + bad_dt)),
            ("c", bytearray(b"xx" + bad_flash)),
        ],
        "image_id string, bytes binary",
    )
    out = {r["image_id"]: r["exif"] for r in extract_exif(df).collect()}
    assert out["a"] is not None and out["a"]["iso"] == 100
    assert out["b"] is None  # coercion failure -> null struct, not a crash
    assert out["c"] is None


def test_group_content_hash_numeric_hash_col_sorts_typed(spark):
    from arhivum_spark.operators.group_analytics import group_content_hash

    # int values 2 and 10: typed sort -> "210"; a pre-cast string sort
    # would give "102" and a different digest
    df = spark.createDataFrame(
        [("g", 2), ("g", 10)], "source string, h long"
    )
    got = {
        r["source"]: (r["content_hash"], r["n_members"])
        for r in group_content_hash(df, "source", "h").collect()
    }
    ref = {
        r["source"]: (r["content_hash"], r["n_members"])
        for r in df.groupBy("source")
        .agg(
            F.sha2(
                F.concat_ws("", F.sort_array(F.collect_list("h"))), 256
            ).alias("content_hash"),
            F.count("*").alias("n_members"),
        )
        .collect()
    }
    assert got == ref


def test_group_content_hash_nan_group_key_is_one_group(spark):
    from arhivum_spark.operators.group_analytics import group_content_hash

    nan = float("nan")
    df = spark.createDataFrame(
        [(nan, "a"), (nan, "b"), (1.0, "c"), (-0.0, "d"), (0.0, "e")],
        "source double, sha256 string",
    )
    rows = group_content_hash(df, "source", "sha256").collect()
    # Spark grouping: NaN is ONE group, -0.0 and 0.0 are one group.
    # Documented divergence: the NaN key surfaces as null through the
    # pandas->Arrow bridge — but still exactly one row, correct count.
    assert len(rows) == 3
    by_key = {r["source"]: r["n_members"] for r in rows}
    assert by_key[None] == 2  # the NaN group (bridge nulls the key)
    assert by_key[1.0] == 1
    assert by_key[0.0] == 2  # -0.0 normalized like groupBy's output
    assert math.copysign(1.0, [k for k in by_key if k == 0.0][0]) == 1.0


def test_group_content_hash_array_group_key(spark):
    from arhivum_spark.operators.group_analytics import group_content_hash

    df = spark.createDataFrame(
        [([1, 2], "x"), ([1, 2], "y"), ([1, 3], "z")],
        "source array<int>, sha256 string",
    )
    rows = group_content_hash(df, "source", "sha256").collect()
    got = {tuple(r["source"]): r["n_members"] for r in rows}
    assert got == {(1, 2): 2, (1, 3): 1}
