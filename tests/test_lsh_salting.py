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
