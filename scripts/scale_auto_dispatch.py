#!/usr/bin/env python
"""Auto-dispatch evidence run (round-6 VERDICT next #1).

Two claims to evidence:
1. `choose_similarity_method` resolves the VERDICT-named points — IVF at
   (100k, 0.95), exact at (20k, 0.4) — plus the rest of the boundary table
   (printed below; also property-pinned in tests/test_llm_ops.py).
2. Threshold-derived nprobe (`derive_nprobe`: 7 at nlist~141/theta 0.4 vs
   the old fixed 2) recovers the recall that fixed nprobe=2 left on the
   table at low thresholds (measured 0.689 in round 5), WITHOUT retuning —
   measured here on the same 20k x 64 table as the crossover run
   (scripts/scale_pipeline.py synthesis), interleaved min-of-REPEATS,
   recall = |ivf pairs| / |exact pairs| (sound because output ⊆ exact).

Usage: python scripts/scale_auto_dispatch.py [--repeats=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

REPEATS = 2
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SCALE_DIR = "/tmp/spark_graft_scale_pipeline"


def main() -> None:
    from melody_join_spark.operators.similarity import (
        choose_similarity_method,
        cosine_pairs,
        derive_nprobe,
        ivf_cosine_pairs,
    )
    from melody_join_spark.session import get_spark

    print("| N | threshold | auto picks |")
    print("|---|---|---|")
    import warnings

    for n, thr in [
        (5_000, 0.95), (20_000, 0.4), (20_000, 0.95),
        (100_000, 0.95), (1_000_000, 0.95), (10_000_000, 0.95),
        (10_000_000, 0.8),
    ]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            print(f"| {n} | {thr} | {choose_similarity_method(n, thr)} |")

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import scale_pipeline

    scale_pipeline.build_scaled(spark)
    emb = spark.read.parquet(f"{SCALE_DIR}/embeddings.parquet")
    n = emb.count()
    nlist = max(8, int(round(float(n) ** 0.5)))
    np_derived = derive_nprobe(nlist, 0.4)
    print(f"\nN = {n}; nlist = {nlist}; derived nprobe@0.4 = {np_derived}; "
          f"@0.95 = {derive_nprobe(nlist, 0.95)}", flush=True)

    methods = [
        ("exact", lambda: cosine_pairs(emb, 0.4)),
        ("ivf_fixed2", lambda: ivf_cosine_pairs(emb, 0.4, nprobe=2)),
        ("ivf_derived", lambda: ivf_cosine_pairs(emb, 0.4)),  # nprobe=None
    ]
    walls: dict = {}
    outs: dict = {}
    for rep in range(REPEATS):
        for name, fn in methods:
            t0 = time.perf_counter()
            c = fn().count()
            w = time.perf_counter() - t0
            spark.catalog.clearCache()
            walls.setdefault(name, []).append(w)
            outs[name] = c
            print(f"rep{rep} {name}@0.4: {w:.1f}s out={c} "
                  f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                  flush=True)

    ex = outs["exact"]
    print(f"\nN={n}, threshold=0.4; interleaved min-of-{REPEATS}:\n")
    print("| method | nprobe | wall (s) | pairs | recall vs exact |")
    print("|---|---|---|---|---|")
    print(f"| exact | — | {min(walls['exact']):.1f} | {ex} | 1.000 |")
    print(f"| ivf | 2 (old fixed) | {min(walls['ivf_fixed2']):.1f} | "
          f"{outs['ivf_fixed2']} | {outs['ivf_fixed2'] / max(ex, 1):.3f} |")
    print(f"| ivf | {np_derived} (derived) | {min(walls['ivf_derived']):.1f} | "
          f"{outs['ivf_derived']} | {outs['ivf_derived'] / max(ex, 1):.3f} |")


if __name__ == "__main__":
    main()
