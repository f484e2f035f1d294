#!/usr/bin/env python
"""Re-record the sf1 arbitrary-cost join under the interleaved protocol
(round-5 VERDICT next #6): the r5 measurement was single-run on a quiet
host; this runner interleaves (scale) x REPEATS inside one process like
scripts/scale_run.py, records JoinStats counters per scale, and prints
the SCALE.md table row with min-of-n walls.

Uses the same synthesized sf1 bridge tables as scale_run.py (hist2d,
REP=10 gamma-perturbed replicas) and the exact _q_emd_nd_arbitrary shape
(sqrt-L1 cost matrix, pivot strategy, auto-derived pivots).

Usage: python scripts/scale_arbitrary.py [--repeats=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np  # noqa: E402

REPEATS = 2
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    import importlib

    import scale_run

    from melody_join_spark.operators.emd_join_nd import JoinStats, emd_join_nd
    from melody_join_spark.session import get_spark

    ent = importlib.import_module("__spark_entry__")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    scale_run.build_scaled(spark, ent)

    h_small = ent.lineitem_histograms_2d(spark, SF01).select("id", "w")
    h_big = spark.read.parquet(f"{scale_run.SCALE_DIR}/hist2d.parquet")
    pts = ent.bin_points_2d()
    diff = np.abs(pts[:, None, :] - pts[None, :, :])
    C = np.sqrt(diff.sum(axis=2))

    results: dict = {}
    for rep in range(REPEATS):
        for scale, h in (("sf0.1", h_small), ("sf1", h_big)):
            stats = JoinStats(spark.sparkContext)
            t0 = time.perf_counter()
            n_out = emd_join_nd(
                h, pts, ent.ND_THETA_ARB, strategy="pivot", ground=C,
                stats=stats,
            ).count()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = results.get(scale)
            if best is None or wall < best["wall"]:
                results[scale] = {"wall": wall, "out": n_out,
                                  **stats.snapshot()}
            print(f"rep{rep} {scale}: {wall:.1f}s out={n_out} "
                  f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                  flush=True)

    print(f"\ninterleaved min-of-{REPEATS}:\n")
    print("| scale | wall (s) | output | LAESA pairs | survivors |"
          " exact LPs | LP/output |")
    print("|---|---|---|---|---|---|---|")
    for scale in ("sf0.1", "sf1"):
        r = results[scale]
        la = r.get("laesa_considered", 0)
        sv = r.get("laesa_survivors", 0) or r.get("candidates", 0)
        lp = r.get("exact_evaluated", 0)
        print(f"| {scale} | {r['wall']:.1f} | {r['out']:,} | {la:,} |"
              f" {sv:,} | {lp:,} | {lp / max(r['out'], 1):.2f} |")
    s, b = results["sf0.1"], results["sf1"]
    print(f"\ngrowth at x10 N: output x{b['out'] / max(s['out'], 1):.1f}, "
          f"wall x{b['wall'] / max(s['wall'], 1e-9):.1f}, "
          f"LPs x{b.get('exact_evaluated', 0) / max(s.get('exact_evaluated', 0), 1):.1f}")


if __name__ == "__main__":
    main()
