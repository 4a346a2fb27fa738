#!/usr/bin/env python
"""Build the 10x documents/embeddings bench corpus (BENCH.md round-4
section) from an sf directory, as K disjoint shards:

- documents: copy k offsets doc_id by k*N and prefixes every token with
  "k_", so cross-shard n-gram/jaccard/hash overlap is exactly zero —
  work scales linearly and intra-shard duplicate structure is identical
  to the original corpus.
- embeddings: copy k applies a deterministic Rademacher sign pattern.
  A sign flip is an isometry (cos(s*v, s*w) = cos(v, w)), so intra-shard
  geometry is exactly preserved while cross-shard cosines collapse to
  ~0 (no phantom cross-shard near-duplicates).
- every other table is copied through unchanged (their queries stay at
  the source scale; only docs/emb-driven queries see 10x).

Usage: python bench_10x_dataset.py [--src /root/testdata/sf0.1]
                                   [--dst /dev/shm/arhivum_sf10x] [--k 10]
Then:  SPARK_GRAFT_SF_DIR=<dst> python bench.py
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

PASSTHROUGH = "region nation customer supplier part orders lineitem events"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/dev/shm/arhivum_sf10x")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    for t in PASSTHROUGH.split():
        shutil.copy(f"{args.src}/{t}.parquet", f"{args.dst}/{t}.parquet")

    docs = pq.read_table(f"{args.src}/documents.parquet").to_pandas()
    n = len(docs)
    parts = []
    for k in range(args.k):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * n
        if k > 0:
            pref = f"{k}_"
            d["text"] = [
                " ".join(pref + w for w in (t or "").split(" "))
                for t in d["text"]
            ]
            d["n_chars"] = [len(t) for t in d["text"]]
        parts.append(d)
    big = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        f"{args.dst}/documents.parquet",
    )

    emb = pq.read_table(f"{args.src}/embeddings.parquet").to_pandas()
    m, dim = len(emb), len(emb["embedding"].iloc[0])
    mat = np.array(emb["embedding"].tolist(), dtype=np.float32)
    eparts = []
    for k in range(args.k):
        signs = (
            np.ones(dim, np.float32)
            if k == 0
            else (
                np.random.default_rng(1000 + k).integers(0, 2, dim) * 2 - 1
            ).astype(np.float32)
        )
        eparts.append(
            pd.DataFrame(
                {
                    "vec_id": emb["vec_id"].to_numpy() + k * m,
                    "embedding": [
                        list(map(float, v)) for v in (mat * signs)
                    ],
                    "label": emb["label"].to_numpy(),
                }
            )
        )
    bige = pd.concat(eparts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(bige, preserve_index=False),
        f"{args.dst}/embeddings.parquet",
    )
    print(f"wrote {len(big)} documents / {len(bige)} embeddings to {args.dst}")


if __name__ == "__main__":
    main()
