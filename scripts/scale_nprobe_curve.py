#!/usr/bin/env python
"""Recall-vs-nprobe curves for the IVF threshold join (round-7 VERDICT
next #3 + ADVICE #3): the `recall_target=` escalation model in
`derive_nprobe` is geometric miss decay anchored at the measured
(20k, theta 0.4, nprobe 7 -> recall 0.942) point — this script measures
the ACTUAL curve so the model's predictions are validated, at the anchor
threshold (0.4), at an intermediate threshold (0.7 — the ADVICE-named
unmeasured band between the 0.4 and 0.95 calibration points), and at
100k/0.4 (convergence-by-count: exact at 100k is a 10^10-pair cross join,
so the largest probed point is the reference there and rows are labeled
RELATIVE — the 20k curves, measured against true exact, are the shape
evidence that relative convergence tracks absolute recall).

Recall vs exact is sound because ivf output ⊆ exact output (verified
cosines are exact; only candidate generation loses pairs), so
recall = |ivf| / |exact| needs only counts.

Usage: python scripts/scale_nprobe_curve.py [--repeats=2] [--skip-100k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

REPEATS = 2
SKIP_100K = False
ONLY_100K = False
LOW_THETA = False
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])
    elif a == "--skip-100k":
        SKIP_100K = True
    elif a == "--only-100k":
        ONLY_100K = True
    elif a == "--low-theta":
        # round-8 VERDICT next #4: below theta 0.4 the recall_target model
        # EXTRAPOLATES ("conservative direction unknown") — measure one
        # point at theta 0.25 (20k vs true exact) to bound it.  Separate
        # flag so the calibrated 0.4/0.7 curves aren't re-run.
        LOW_THETA = True

SCALE_DIR = "/tmp/spark_graft_scale_pipeline"
DIR_100K = "/tmp/spark_graft_scale_emb100k"


def main() -> None:
    from melody_join_spark.operators.similarity import (
        cosine_pairs,
        derive_nlist,
        derive_nprobe,
        ivf_cosine_pairs,
    )
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import scale_pipeline

    scale_pipeline.build_scaled(spark)
    emb = spark.read.parquet(f"{SCALE_DIR}/embeddings.parquet")
    n = emb.count()
    nlist = derive_nlist(n)
    print(f"N = {n}; nlist = {nlist}", flush=True)

    def run(fn) -> tuple[float, int]:
        t0 = time.perf_counter()
        c = fn().count()
        w = time.perf_counter() - t0
        spark.catalog.clearCache()
        return w, c

    if LOW_THETA:
        # probe ladder brackets the model's picks at theta 0.25 / nlist 141:
        # base 8, target-0.99 -> 13, target-0.999 -> 20, plus headroom
        curves = ((0.25, (2, 8, 13, 20, 28, 40)),)
    elif ONLY_100K:
        curves = ()
    else:
        curves = ((0.4, (2, 7, 9, 12, 16, 24)), (0.7, (2, 4, 7, 8, 12)))
    for thr, probes in curves:
        base = derive_nprobe(nlist, thr)
        targets = {
            t: derive_nprobe(nlist, thr, t) for t in (0.99, 0.999)
        }
        print(f"\n== theta {thr}: derived base nprobe {base}; "
              f"recall_target model picks {targets} ==", flush=True)
        walls: dict = {}
        counts: dict = {}
        for rep in range(REPEATS):
            w, ex = run(lambda: cosine_pairs(emb, thr))
            walls.setdefault("exact", []).append(w)
            counts["exact"] = ex
            print(f"  rep{rep} exact: {w:.1f}s out={ex} "
                  f"load={os.getloadavg()[0]:.1f}", file=sys.stderr, flush=True)
            for p in probes:
                w, c = run(lambda p=p: ivf_cosine_pairs(emb, thr, nprobe=p))
                walls.setdefault(p, []).append(w)
                counts[p] = c
                print(f"  rep{rep} nprobe={p}: {w:.1f}s out={c}",
                      file=sys.stderr, flush=True)
        ex = counts["exact"]
        print(f"\n| theta | nprobe | wall (s) | pairs | recall vs exact |")
        print("|---|---|---|---|---|")
        print(f"| {thr} | exact | {min(walls['exact']):.1f} | {ex} | 1.00000 |")
        for p in probes:
            note = ""
            if p == base:
                note = " (derived base)"
            for t, np_t in targets.items():
                if p == np_t:
                    note += f" (target {t} pick)"
            print(f"| {thr} | {p}{note} | {min(walls[p]):.1f} | {counts[p]} "
                  f"| {counts[p] / max(ex, 1):.5f} |")
        for t, np_t in targets.items():
            if np_t in counts:
                got = counts[np_t] / max(ex, 1)
                verdict = "MEETS" if got >= t else "MISSES"
                print(f"model check: target {t} -> nprobe {np_t} measured "
                      f"recall {got:.5f} [{verdict}]")

    if SKIP_100K:
        return
    if not os.path.isdir(f"{DIR_100K}/embeddings.parquet"):
        print(f"\n(no 100k table at {DIR_100K}; run scale_embed_100k.py "
              "first to add the convergence rows)", flush=True)
        return
    emb1 = spark.read.parquet(f"{DIR_100K}/embeddings.parquet")
    n1 = emb1.count()
    nlist1 = derive_nlist(n1)
    thr = 0.4
    base1 = derive_nprobe(nlist1, thr)
    t99 = derive_nprobe(nlist1, thr, 0.99)
    probes1 = sorted({base1, t99, max(t99 + 8, 24)})
    print(f"\n== 100k convergence (N={n1}, nlist={nlist1}, theta {thr}): "
          f"base {base1}, target-0.99 pick {t99}; exact infeasible, "
          f"largest probe = reference ==", flush=True)
    walls1: dict = {}
    counts1: dict = {}
    # single pass: the recall ratios are DETERMINISTIC (seeded codebook);
    # the walls here are context, not perf evidence (bench-host-noise
    # protocol: only min-of-n interleaved walls count)
    for rep in range(1):
        for p in probes1:
            w, c = run(lambda p=p: ivf_cosine_pairs(emb1, thr, nprobe=p))
            walls1.setdefault(p, []).append(w)
            counts1[p] = c
            print(f"  rep{rep} nprobe={p}: {w:.1f}s out={c}",
                  file=sys.stderr, flush=True)
    ref = counts1[probes1[-1]]
    print(f"\n| nprobe | wall (s) | pairs | RELATIVE recall (vs nprobe="
          f"{probes1[-1]}) |")
    print("|---|---|---|---|")
    for p in probes1:
        print(f"| {p} | {min(walls1[p]):.1f} | {counts1[p]} "
              f"| {counts1[p] / max(ref, 1):.5f} |")


if __name__ == "__main__":
    main()
