#!/usr/bin/env python
"""Aggregate memory-copy bandwidth vs process count — the scaling ceiling.

Byte/shuffle-bound pipeline stages on a single box cap at the box's shared
memory-bandwidth curve, not at core count. This microbenchmark measures the
warmed aggregate copy bandwidth at each process count so BENCH.md can state
per-pair efficiency ceilings from a reproducible number instead of a
transcript note (the round-2 measurement lived only in session notes).

Method: each worker copies a 64 MB numpy buffer in a loop (np.copyto —
one read + one write stream per copy, counted as 2x buffer bytes moved);
the first second of copies is discarded as warmup (first-touch page
faults), then a timed window is measured under a barrier so all workers
run concurrently. Run it on an otherwise-idle box: results are only
meaningful for the quiet-window runs (this host has noisy neighbors).

Usage:
    python bench_membw.py                 # default counts 1,2,4,8
    SPARK_GRAFT_MEMBW_PROCS=1,2,4,8,16,32 python bench_membw.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

BUF_MB = 64
WARM_SEC = 1.0
TIMED_SEC = 2.0


def _worker(barrier, out_q) -> None:
    src = np.random.default_rng(0).integers(0, 255, BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    t_end = time.perf_counter() + WARM_SEC
    while time.perf_counter() < t_end:  # warmup: fault every page in
        np.copyto(dst, src)
    barrier.wait()  # all workers enter the timed window together
    n = 0
    t0 = time.perf_counter()
    t_end = t0 + TIMED_SEC
    while time.perf_counter() < t_end:
        np.copyto(dst, src)
        n += 1
    elapsed = time.perf_counter() - t0
    out_q.put(2 * n * (BUF_MB << 20) / elapsed)  # read + write streams


def measure(n_procs: int) -> float:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_procs)
    out_q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(barrier, out_q)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    total = sum(out_q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / 1e9


def main() -> None:
    counts = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_MEMBW_PROCS", "1,2,4,8").split(",")
    )
    gbs = {c: round(measure(c), 1) for c in counts}
    ceilings = {
        f"{a}->{b}": round(gbs[b] / (4 * gbs[a]), 3)
        for a in counts
        for b in counts
        if b == 4 * a
    }
    print(
        json.dumps(
            {
                "metric": "aggregate_copy_bandwidth",
                "unit": "GB/s",
                "buf_mb": BUF_MB,
                "gb_per_sec": gbs,
                "bandwidth_efficiency_ceiling_N_to_4N": ceilings,
            }
        )
    )


if __name__ == "__main__":
    main()
