"""Hot-band salting: skew split + connectivity preservation (north rule:
all-black images / boilerplate captions make degenerate LSH band keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arhivum_spark.config import DedupConfig
from arhivum_spark.operators.connected_components import connected_components
from arhivum_spark.operators.lsh import salted_candidate_edges

HOT_N = 4000


def _bands(spark):
    """One pathologically hot (band,key) bucket + 500 singleton keys."""
    hot = spark.range(HOT_N).select(
        F.col("id").alias("image_id"), F.lit(0).alias("band"),
        F.lit(777).alias("key"),
    )
    cold = spark.range(10_000, 10_500).select(
        F.col("id").alias("image_id"), F.lit(1).alias("band"),
        F.col("id").alias("key"),
    )
    return hot.unionByName(cold)


@pytest.mark.parametrize("sample", [1.0, 0.05])
def test_hot_band_salted_but_connected(spark, sample):
    cfg = DedupConfig(hot_detect_sample=sample, hot_band_threshold=64,
                      salt_buckets=16)
    edges = salted_candidate_edges(_bands(spark), cfg)

    # skew split: no hub carries the whole hot bucket (the quadratic/straggler
    # guard) — max star degree ~ HOT_N/salt_buckets plus the hub chain
    deg = (
        edges.select(F.col("src").alias("v"))
        .groupBy("v").count().agg(F.max("count")).first()[0]
    )
    assert deg < HOT_N / 4, f"hot bucket not split: max hub degree {deg}"

    # connectivity: CC over the star+chain edges must keep the hot cohort
    # in ONE component
    vertices = _bands(spark).select(F.col("image_id").alias("id")).distinct()
    comp = connected_components(vertices, edges, id_col="id")
    hot_components = (
        comp.filter(F.col("id") < HOT_N).select("component").distinct().count()
    )
    assert hot_components == 1

    # cold singleton keys generate no edges among themselves
    cold_edges = edges.filter(
        (F.col("src") >= 10_000) | (F.col("dst") >= 10_000)
    ).count()
    assert cold_edges == 0


def test_max_pairs_per_band_caps_bucket_edges(spark):
    """A bucket above max_pairs_per_band emits ~cap star edges, not one per
    member (SURVEY §4 per-band pair cap); buckets below the cap are
    untouched."""
    cfg = DedupConfig(
        hot_detect_sample=1.0, hot_band_threshold=100_000,
        max_pairs_per_band=50,
    )
    big = spark.range(500).select(
        F.col("id").alias("image_id"), F.lit(0).alias("band"),
        F.lit(7).alias("key"),
    )
    small = spark.range(1000, 1030).select(
        F.col("id").alias("image_id"), F.lit(1).alias("band"),
        F.lit(8).alias("key"),
    )
    edges = salted_candidate_edges(big.unionByName(small), cfg)
    n_big = edges.filter(F.col("dst") < 1000).count()
    n_small = edges.filter(F.col("dst") >= 1000).count()
    # hash-draw keeps an expected `cap` members of the big bucket
    assert 20 <= n_big <= 100, f"cap not enforced: {n_big} edges"
    assert n_small == 29  # below cap: every member star-linked


def test_sampled_detection_misses_small_buckets_harmlessly(spark):
    """Keys below the sampled-detection floor stay unsalted — star edges
    still link their members (correctness unaffected; only partition size
    guarantees relax)."""
    cfg = DedupConfig(hot_detect_sample=0.01)
    small = spark.range(40).select(
        F.col("id").alias("image_id"), F.lit(0).alias("band"),
        F.lit(5).alias("key"),
    )
    edges = salted_candidate_edges(small, cfg)
    vertices = small.select(F.col("image_id").alias("id"))
    comp = connected_components(vertices, edges, id_col="id")
    assert comp.select("component").distinct().count() == 1
