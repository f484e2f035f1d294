#!/usr/bin/env python
"""Embedding-similarity crossover probe (round-5 VERDICT next #4): exact
block-matmul vs IVF-candidate vs hyperplane-LSH on the same x10 embedding
table (20k x 64-dim, scripts/scale_pipeline.py synthesis), interleaved
min-of-REPEATS inside one process.

Round-5 measured exact 38.3 s vs LSH 98.7 s at threshold 0.4 (LSH's
regime is 10^6+) and flagged the 10^5-10^6 mid-regime as uncovered; this
probe shows where the IVF-candidate path lands, plus a recall line
against the exact pair set at both thresholds.

Usage: python scripts/scale_embed_crossover.py [--repeats=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

REPEATS = 3
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SCALE_DIR = "/tmp/spark_graft_scale_pipeline"
THRESHOLDS = (0.4, 0.95)


def main() -> None:
    from melody_join_spark.operators.similarity import (
        cosine_pairs,
        ivf_cosine_pairs,
        lsh_cosine_pairs,
    )
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import scale_pipeline

    scale_pipeline.build_scaled(spark)
    emb = spark.read.parquet(f"{SCALE_DIR}/embeddings.parquet")
    n = emb.count()
    print(f"N = {n} vectors", file=sys.stderr)

    def q_exact(thr):
        return cosine_pairs(emb, thr)

    def q_ivf(thr):
        return ivf_cosine_pairs(emb, thr, nprobe=2)

    def q_lsh(thr):
        return lsh_cosine_pairs(emb, thr)

    methods = [("exact", q_exact), ("ivf", q_ivf), ("lsh", q_lsh)]
    walls: dict = {}
    outs: dict = {}
    for rep in range(REPEATS):
        for thr in THRESHOLDS:
            for name, fn in methods:
                t0 = time.perf_counter()
                c = fn(thr).count()
                w = time.perf_counter() - t0
                spark.catalog.clearCache()
                key = (name, thr)
                walls.setdefault(key, []).append(w)
                outs[key] = c
                print(f"rep{rep} {name}@{thr}: {w:.1f}s out={c} "
                      f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                      flush=True)

    print(f"\nN={n}; interleaved min-of-{REPEATS}:\n")
    print("| threshold | method | wall (s) | pairs | recall vs exact |")
    print("|---|---|---|---|---|")
    for thr in THRESHOLDS:
        ex = outs[("exact", thr)]
        for name, _ in methods:
            key = (name, thr)
            rec = "" if name == "exact" else f"{outs[key] / max(ex, 1):.3f}"
            print(f"| {thr} | {name} | {min(walls[key]):.1f} | {outs[key]} |"
                  f" {rec} |")


if __name__ == "__main__":
    main()
