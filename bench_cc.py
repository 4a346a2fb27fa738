#!/usr/bin/env python
"""Connected-components round/wall benchmark on a DEEP ~1M-edge graph
(round-4 VERDICT #6): the adaptive pointer-jump gear is property-tested on
diameter-63 chains, but its O(log diameter) claim needed a at-scale
measurement beyond the hub-star regime the image pipeline feeds.

Graph: `--chains` disjoint paths of `--depth` edges each (default
10,000 x 100 = 1,000,000 edges, diameter 100), vertex ids scrambled by a
multiplicative bijection so id order carries no information about chain
position (consecutive ids would let a single hop round do diameter-long
work along the id ordering).

Variants:
  adaptive  — connected_components(jump_after=3)  [the default gear]
  hop-only  — connected_components(jump_after=inf): O(diameter) rounds
  star      — connected_components_star: O(log^2 n) rounds

Usage: python bench_cc.py [--chains N] [--depth D] [--skip-hop]
Prints one JSON line; paste the table into BENCH.md by hand.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from arhivum_spark.operators import connected_components as cc
from arhivum_spark.session import get_spark

MULT = 2654435761  # Knuth multiplicative hash; odd => bijection mod 2^62


def edge_frame(spark, n_chains: int, depth: int):
    """(src, dst) for n_chains disjoint paths of `depth` edges, scrambled."""
    n_vert = n_chains * (depth + 1)
    e = (
        spark.range(0, n_chains * depth, 1, 64)
        .select(
            (F.col("id") % n_chains).alias("_c"),
            (F.col("id") / n_chains).cast("long").alias("_p"),
        )
        .select(
            (F.col("_c") * (depth + 1) + F.col("_p")).alias("_u"),
            (F.col("_c") * (depth + 1) + F.col("_p") + 1).alias("_v"),
        )
        .select(
            ((F.col("_u") * MULT) % (2**62)).alias("src"),
            ((F.col("_v") * MULT) % (2**62)).alias("dst"),
        )
    )
    v = spark.range(0, n_vert, 1, 64).select(
        ((F.col("id") * MULT) % (2**62)).alias("id")
    )
    return v, e


def run(variant: str, v, e, depth: int) -> dict:
    stats: dict = {}
    t0 = time.time()
    if variant == "adaptive":
        out = cc.connected_components(
            v, e, max_iters=2 * depth + 10, fallback_star=False, stats=stats
        )
    elif variant == "hop-only":
        out = cc.connected_components(
            v, e, max_iters=2 * depth + 10, fallback_star=False,
            jump_after=10**9, stats=stats,
        )
    elif variant == "star":
        out = cc.connected_components_star(v, e, stats=stats)
    n_comp = out.select("component").distinct().count()
    return {
        "variant": variant,
        "wall_sec": round(time.time() - t0, 1),
        "rounds": stats.get("rounds"),
        "n_components": n_comp,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=10_000)
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--skip-hop", action="store_true")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("bench_cc", cores=args.cores,
                      shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    v, e = edge_frame(spark, args.chains, args.depth)
    v = v.localCheckpoint()
    e = e.localCheckpoint()
    n_edges = e.count()

    variants = ["adaptive", "star"] + ([] if args.skip_hop else ["hop-only"])
    results = [run(x, v, e, args.depth) for x in variants]
    comps = {r["n_components"] for r in results}
    print(
        json.dumps(
            {
                "metric": "cc_deep_graph_bench",
                "n_edges": n_edges,
                "n_chains": args.chains,
                "depth": args.depth,
                "results": results,
                "identical_components": len(comps) == 1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
