#!/usr/bin/env python
"""Measured scale point above sf0.1 for the EMD join family (round-4
VERDICT item 1).

The container ships testdata only up to sf0.1 (TESTDATA.md), so the sf1
input is synthesized deterministically: the sf0.1 lineitem bridge tables
replicated REP=10x, each replica's weights perturbed by seeded
multiplicative gamma noise strong enough (strength 0.6 -> median replica
EMD ~0.34 vs theta 0.25) that replicas are NOT near-duplicates of their
source — the scaled table has 10x the records at the same spatial density,
which is exactly the regime where a naive all-pairs plan pays 100x.

For each query the script records interleaved min-of-REPEATS wall plus
JoinStats counters at BOTH scales, and prints the growth ratios the
100-TB argument rests on: candidates and exact LPs should track the
OUTPUT (which grows ~density-quadratically by construction at fixed
theta), not the N^2 pair space, and wall should track LPs.

Usage: python scripts/scale_run.py [--repeats=3]
Writes nothing outside /tmp; prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REP = 10
SEED = 20260814
REPEATS = 3
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SF01 = "/root/testdata/sf0.1"
SCALE_DIR = "/tmp/spark_graft_scale_sf1"


def build_scaled(spark, ent) -> None:
    """Write the REP-x perturbed bridge tables once (marker-cached)."""
    import zlib

    import pandas as pd

    marker = os.path.join(SCALE_DIR, f"_BUILT_{REP}_{SEED}")
    if os.path.exists(marker):
        return
    for name, loader in (
        ("hist2d", ent.lineitem_histograms_2d),
        ("hist3d", ent.lineitem_histograms_3d),
    ):
        base = loader(spark, SF01).select("id", "w")

        def perturb(it, _name=name):
            for pdf in it:
                out_id, out_w = [], []
                for rid, w in zip(pdf["id"], pdf["w"]):
                    w = np.asarray(w, dtype=np.float64)
                    for rep in range(REP):
                        rng = np.random.default_rng(
                            (SEED, zlib.crc32(_name.encode()) & 0xFFFF, int(rid), rep)
                        )
                        if rep == 0:
                            jw = w
                        else:
                            g = rng.gamma(1.0 / 0.36, 0.36, size=w.shape)
                            jw = w * g
                        out_id.append(int(rid) * 16 + rep)
                        out_w.append(jw.tolist())
                yield pd.DataFrame({"id": out_id, "w": out_w})

        scaled = base.mapInPandas(perturb, "id long, w array<double>")
        scaled.write.mode("overwrite").parquet(f"{SCALE_DIR}/{name}.parquet")
    open(marker, "w").close()


def main() -> None:
    import importlib

    from pyspark.sql import functions as F

    from melody_join_spark.operators.emd_join_nd import (
        JoinStats,
        emd_join_nd,
        emd_topk_nd,
    )
    from melody_join_spark.session import get_spark

    ent = importlib.import_module("__spark_entry__")
    spark = get_spark()
    build_scaled(spark, ent)

    h2_small = ent.lineitem_histograms_2d(spark, SF01).select("id", "w")
    h3_small = ent.lineitem_histograms_3d(spark, SF01).select("id", "w")
    h2_big = spark.read.parquet(f"{SCALE_DIR}/hist2d.parquet")
    h3_big = spark.read.parquet(f"{SCALE_DIR}/hist3d.parquet")
    pts2, pts3 = ent.bin_points_2d(), ent.bin_points_3d()

    def q_2d(h, stats):
        return emd_join_nd(h, pts2, ent.ND_THETA_2D, strategy="grid", stats=stats)

    def q_3d(h, stats):
        return emd_join_nd(h, pts3, ent.ND_THETA_3D, strategy="grid", stats=stats)

    def q_topk3d(h, stats):
        return emd_topk_nd(h, pts3, ent.ND_TOPK + 10, strategy="grid", stats=stats)

    def q_pivot2d(h, stats):
        return emd_join_nd(h, pts2, ent.ND_THETA_2D, strategy="pivot", stats=stats)

    queries = [
        ("emd_nd_threshold_2d", q_2d, h2_small, h2_big),
        ("emd_nd_threshold_3d", q_3d, h3_small, h3_big),
        ("emd_nd_topk_3d", q_topk3d, h3_small, h3_big),
        ("emd_nd_threshold_pivot_2d", q_pivot2d, h2_small, h2_big),
    ]

    results = {}
    # interleaved: every repeat runs every (query, scale) pair in sequence
    for rep in range(REPEATS):
        for name, fn, small, big in queries:
            for scale, h in (("sf0.1", small), ("sf1", big)):
                stats = JoinStats(spark.sparkContext)
                t0 = time.perf_counter()
                n_out = fn(h, stats).count()
                wall = time.perf_counter() - t0
                # parity with bench.py: drop accumulated caches so a
                # query's wall is not paying the previous query's GC debt
                spark.catalog.clearCache()
                key = (name, scale)
                best = results.get(key)
                if best is None or wall < best["wall"]:
                    results[key] = {
                        "wall": wall,
                        "out": n_out,
                        **stats.snapshot(),
                    }
        print(f"-- repeat {rep + 1}/{REPEATS} done, load "
              f"{os.getloadavg()[0]:.1f}", file=sys.stderr)

    n_small = h2_small.count()
    n_big = h2_big.count()
    print(f"N: sf0.1={n_small}  sf1={n_big}  (x{n_big / n_small:.1f}; "
          f"N^2 would be x{(n_big / n_small) ** 2:.0f})")
    print()
    print("| query | scale | wall (s) | output | candidates | exact LPs |"
          " guest repl | cand/N^2 |")
    print("|---|---|---|---|---|---|---|---|")
    for name, _, _, _ in queries:
        for scale, n in (("sf0.1", n_small), ("sf1", n_big)):
            r = results[(name, scale)]
            cand = r.get("candidates", 0) or r.get("laesa_considered", 0)
            pairs = n * (n - 1) / 2
            print(
                f"| {name} | {scale} | {r['wall']:.1f} | {r['out']} | "
                f"{cand} | {r.get('exact_evaluated', 0)} | "
                f"{r.get('guest_replicas', 0)} | {cand / pairs:.2e} |"
            )
    print()
    for name, _, _, _ in queries:
        s, b = results[(name, "sf0.1")], results[(name, "sf1")]
        cs = s.get("candidates", 0) or 1
        cb = b.get("candidates", 0) or 1
        print(
            f"{name}: wall x{b['wall'] / max(s['wall'], 1e-9):.1f}, "
            f"output x{b['out'] / max(s['out'], 1):.1f}, "
            f"candidates x{cb / cs:.1f}, "
            f"LPs x{b.get('exact_evaluated', 0) / max(s.get('exact_evaluated', 0), 1):.1f}"
        )


if __name__ == "__main__":
    main()
