#!/usr/bin/env python
"""Round-8 scale evidence (round-7 VERDICT next #5 and #6).

A. sf1 end-to-end row for the auto front door: `dedupe_embeddings(...,
   method='auto')` over the x10 corpus (50k docs / 20k x 64 embeddings at
   theta 0.95 — the regime where auto dispatches IVF) vs method='exact'
   (the recall-1 truth), interleaved min-of-REPEATS.  Beyond the wall,
   the KEPT-ID SETS are compared — end-to-end equality means the IVF
   dispatch lost zero survivors at this scale, the anti-join included.

B. Index append-digest cost at sf1: `emd_index_build` on the sf1 hist2d
   bridge table (same synthesis as scale_run.py), then an IDEMPOTENT
   rebuild timed separately — the round-6 full-data digest makes every
   rebuild scan rec0 once (centroids + xxhash64 agg) even when it
   short-circuits; this measures what that no-op costs at sf1 so the
   "idempotent rebuild is cheap" claim carries a number.

Usage: python scripts/scale_r8_evidence.py [--repeats=2] [--skip-index]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

REPEATS = 2
SKIP_INDEX = False
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])
    elif a == "--skip-index":
        SKIP_INDEX = True

PIPE_DIR = "/tmp/spark_graft_scale_pipeline"


def main() -> None:
    from melody_join_spark.operators.dedup import dedupe_embeddings
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import scale_pipeline

    scale_pipeline.build_scaled(spark)
    docs = spark.read.parquet(f"{PIPE_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{PIPE_DIR}/embeddings.parquet")
    n_docs, n_emb = docs.count(), emb.count()
    print(f"A. sf1 auto front door: {n_docs} docs, {n_emb} embeddings, "
          f"theta 0.95", flush=True)

    walls: dict = {}
    kept_ids: dict = {}
    for rep in range(REPEATS):
        for method in ("auto", "exact"):
            t0 = time.perf_counter()
            out = dedupe_embeddings(docs, emb, 0.95, method=method)
            ids = sorted(r[0] for r in out.select("doc_id").collect())
            w = time.perf_counter() - t0
            spark.catalog.clearCache()
            walls.setdefault(method, []).append(w)
            kept_ids[method] = ids
            print(f"  rep{rep} {method}: {w:.2f}s kept={len(ids)} "
                  f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                  flush=True)

    same = kept_ids["auto"] == kept_ids["exact"]
    print("\n| method | wall (s, min-of-%d interleaved) | kept docs | "
          "kept set |" % REPEATS)
    print("|---|---|---|---|")
    print(f"| exact | {min(walls['exact']):.2f} | "
          f"{len(kept_ids['exact'])} | (truth) |")
    print(f"| auto (-> ivf) | {min(walls['auto']):.2f} | "
          f"{len(kept_ids['auto'])} | "
          f"{'IDENTICAL to exact' if same else 'DIVERGES'} |")

    if SKIP_INDEX:
        return

    import scale_run
    import __spark_entry__ as ent
    from melody_join_spark.operators.emd_index import emd_index_build
    from melody_join_spark.plans.tpch_bridge import bin_points_2d

    scale_run.build_scaled(spark, ent)
    h_big = spark.read.parquet(f"{scale_run.SCALE_DIR}/hist2d.parquet")
    n_hist = h_big.count()
    pts = bin_points_2d()
    idx_path = "/tmp/spark_graft_scale_idx_r8"
    print(f"\nB. index digest cost at sf1: {n_hist} histograms, d=2 grid",
          flush=True)
    t0 = time.perf_counter()
    emd_index_build(h_big.select("id", "w"), pts, idx_path)
    w_first = time.perf_counter() - t0
    rebuilds = []
    for rep in range(max(REPEATS, 2)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        emd_index_build(h_big.select("id", "w"), pts, idx_path)
        rebuilds.append(time.perf_counter() - t0)
        print(f"  rebuild rep{rep}: {rebuilds[-1]:.2f}s", file=sys.stderr,
              flush=True)
    print("\n| phase | wall (s) |")
    print("|---|---|")
    print(f"| first build (write {n_hist} recs) | {w_first:.2f} |")
    print(f"| idempotent rebuild (digest scan, min-of-{len(rebuilds)}) | "
          f"{min(rebuilds):.2f} |")


if __name__ == "__main__":
    main()
