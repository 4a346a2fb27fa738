"""Text near-duplicate operators: SimHash blocking, substring containment,
and MinHash-LSH over token shingles.

The caption-side half of the graft pipeline, plus general document dedup
(the training-data-pipeline operators). All blocking/verification math stays
JVM-side; only MinHash signature computation is Python (Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arhivum_spark.config import DedupConfig
from arhivum_spark.functions import minhash as mh


def simhash_near_pairs(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "id",
    simhash_col: str = "simhash",
) -> DataFrame:
    """Near-duplicate edges with Hamming(simhash_a, simhash_b) <=
    cfg.simhash_max_hamming — sufficient for clustering (identical
    signatures are star-linked through a representative, not all-pairs).

    Pigeonhole blocking: split 64 bits into (max_hamming+1) chunks — a pair
    within the Hamming budget must agree on at least one whole chunk, so an
    equi-join on (chunk_index, chunk_value) finds every such pair; bit_count
    of the XOR verifies. One shuffle on chunk keys, JVM-only.

    Skew guard (boilerplate captions — north rule): rows with IDENTICAL
    simhash collapse to one representative before the pair join (hamming-0
    star edges emitted directly), so a million-row boilerplate cohort
    contributes one row to the quadratic stage, not 10^12 pairs.
    """
    from pyspark.sql import Window

    flagged = df.select(F.col(id_col).alias("_id"), F.col(simhash_col).alias("_sh"))
    flagged = flagged.withColumn("_rep", F.first("_id").over(
        Window.partitionBy("_sh").orderBy("_id")
    ))
    identity_edges = (
        flagged.filter(F.col("_id") != F.col("_rep"))
        .select(
            F.col("_rep").alias("id_a"),
            F.col("_id").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    reps = flagged.filter(F.col("_id") == F.col("_rep")).select("_id", "_sh")

    n_chunks = cfg.simhash_max_hamming + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("_sh"), c * width).bitwiseAND(F.lit(mask))
            for c in range(n_chunks)
        ]
    )
    keyed = reps.select(
        "_id",
        "_sh",
        F.posexplode(chunks).alias("chunk_idx", "chunk_val"),
    )
    a = keyed.select(
        "chunk_idx", "chunk_val", F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")
    )
    b = keyed.select(
        "chunk_idx", "chunk_val", F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")
    )
    rep_pairs = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= cfg.simhash_max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
    return rep_pairs.unionByName(identity_edges)


def substring_pairs(
    df: DataFrame, cfg: DedupConfig, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Exact token-substring containment: (contained_id, container_id) where
    contained's full token sequence appears contiguously inside container's.

    Distributed generalized-suffix matching: every text emits hashes of all
    contiguous token windows whose length matches some candidate text's
    length; candidates (length <= cfg.substring_max_tokens) emit their full
    hash once. An equi-join on (length, window_hash) finds containments —
    the shuffle carries only 64-bit keys, never token arrays. Window
    emission is JVM-side (transform over sequence + slice + xxhash64).

    The within-bucket exhaustive variant (true suffix array) is
    substring_pairs_within_groups below.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("n_tok", F.size("toks"))

    cand = toks.filter(
        (F.col("n_tok") >= 1) & (F.col("n_tok") <= cfg.substring_max_tokens)
    ).select(
        F.col("_id").alias("contained_id"),
        F.col("n_tok").alias("len"),
        F.xxhash64(F.concat_ws("\x1f", "toks")).alias("wh"),
        F.md5(F.concat_ws("\x1f", "toks")).alias("wh2"),
    )
    lengths = [r["len"] for r in cand.select("len").distinct().collect()]
    if not lengths:
        return cand.select(
            "contained_id", F.col("contained_id").alias("container_id")
        ).limit(0)

    lengths_arr = F.array(*[F.lit(int(x)) for x in sorted(lengths)])
    windows = toks.select(
        F.col("_id").alias("container_id"),
        F.col("n_tok"),
        F.explode(
            F.flatten(
                F.transform(
                    F.filter(lengths_arr, lambda L: L <= F.col("n_tok")),
                    lambda L: F.transform(
                        F.sequence(F.lit(1), F.col("n_tok") - L + 1),
                        lambda s: F.struct(
                            L.alias("len"),
                            F.xxhash64(
                                F.concat_ws("\x1f", F.slice("toks", s, L))
                            ).alias("wh"),
                            F.md5(
                                F.concat_ws("\x1f", F.slice("toks", s, L))
                            ).alias("wh2"),
                        ),
                    ),
                )
            )
        ).alias("win"),
    ).select(
        "container_id",
        F.col("win.len").alias("len"),
        F.col("win.wh").alias("wh"),
        F.col("win.wh2").alias("wh2"),
    )
    return (
        windows.join(cand, ["len", "wh", "wh2"])
        .filter(F.col("contained_id") != F.col("container_id"))
        .select("contained_id", "container_id")
        .distinct()
    )


def substring_pairs_within_groups(
    df: DataFrame, group_col: str, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Char-level substring containment inside bounded groups, via a real
    generalized suffix array per group (functions/suffix_array.py) driven by
    applyInPandas — the per-bucket imperative core for corpora the window
    join can't cover (unbounded contained length)."""
    from arhivum_spark.functions.suffix_array import find_contained

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].tolist()
        docs = [
            np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            for t in pdf[text_col]
        ]
        pairs = find_contained(docs)
        return pd.DataFrame(
            {
                "contained_id": [ids[i] for i, _ in pairs],
                "container_id": [ids[j] for _, j in pairs],
            }
        )

    out_schema = f"contained_id {dict(df.dtypes)[id_col]}, container_id {dict(df.dtypes)[id_col]}"
    return df.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


# ---------------------------------------------------------------------------
# Document MinHash over token n-gram shingles


def doc_minhash(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """(id, minhash array<int>) over token n-gram shingles — Arrow-batched."""
    a, b = mh.permutations(cfg.num_perm, cfg.minhash_seed)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sets = []
            for text in pdf[text_col]:
                toks = text.split() if text else []
                if len(toks) < ngram:
                    grams = [" ".join(toks)] if toks else [""]
                else:
                    grams = [
                        " ".join(toks[i : i + ngram])
                        for i in range(len(toks) - ngram + 1)
                    ]
                ids = np.array(
                    [
                        np.int64(
                            int.from_bytes(
                                __import__("hashlib")
                                .blake2b(g.encode(), digest_size=8)
                                .digest(),
                                "little",
                                signed=True,
                            )
                        )
                        for g in set(grams)
                    ],
                    dtype=np.int64,
                )
                sets.append(np.unique(ids))
            sigs = mh.minhash_batch(sets, a, b)
            yield pd.DataFrame({"id": pdf[id_col].values, "minhash": list(sigs)})

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        extract, schema=f"id {dict(df.dtypes)[id_col]}, minhash array<int>"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    cfg: DedupConfig,
    id_col: str = "id",
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup document pairs with signature-agreement scores."""
    from arhivum_spark.operators.lsh import (
        band_keys,
        salted_candidate_edges,
        verify_edges,
    )

    sigs = doc_minhash(df, cfg, id_col, text_col, ngram).withColumn(
        "phash", F.lit(0).cast("long")
    )
    bands = band_keys(
        sigs.select(F.col("id").alias("image_id"), "minhash"), cfg
    )
    cand = salted_candidate_edges(bands, cfg)
    verified = verify_edges(
        cand, sigs.select(F.col("id").alias("image_id"), "minhash", "phash"), cfg
    )
    return verified.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b"), "est_jaccard"
    )
