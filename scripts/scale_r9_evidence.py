#!/usr/bin/env python
"""Round-9 scale evidence (round-8 VERDICT next #6): an end-to-end sf1 row
for a `recall_target=` dispatch.  The knob has curve evidence (measured
recall-vs-nprobe at 20k/100k, SCALE.md round 8) but no end-to-end row —
this measures `dedupe_embeddings(..., recall_target=0.99)` at the SAME sf1
operating point as the round-8 auto row (50k docs / 20k x 64 embeddings,
theta 0.95), interleaved with method='exact' (the recall-1 truth),
reporting the escalated nprobe the model picked and the kept-set delta vs
exact (expected: identical — measured recall at this threshold is 1.0 even
at the base nprobe, so escalation only buys margin).

Usage: python scripts/scale_r9_evidence.py [--repeats=2]
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

PIPE_DIR = "/tmp/spark_graft_scale_pipeline"
THETA = 0.95
TARGET = 0.99


def main() -> None:
    from melody_join_spark.operators.dedup import dedupe_embeddings
    from melody_join_spark.operators.similarity import (
        derive_nlist,
        derive_nprobe,
    )
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import scale_pipeline

    scale_pipeline.build_scaled(spark)
    docs = spark.read.parquet(f"{PIPE_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{PIPE_DIR}/embeddings.parquet")
    n_docs, n_emb = docs.count(), emb.count()
    nlist = derive_nlist(n_emb)
    base_np = derive_nprobe(nlist, THETA)
    esc_np = derive_nprobe(nlist, THETA, TARGET)
    print(
        f"sf1 recall_target dispatch: {n_docs} docs, {n_emb} embeddings, "
        f"theta {THETA}; nlist {nlist}, base nprobe {base_np}, "
        f"recall_target={TARGET} escalates to nprobe {esc_np}",
        flush=True,
    )

    walls: dict = {}
    kept_ids: dict = {}
    variants = {
        "exact": dict(method="exact"),
        f"auto rt={TARGET}": dict(method="auto", recall_target=TARGET),
    }
    for rep in range(REPEATS):
        for label, kw in variants.items():
            t0 = time.perf_counter()
            out = dedupe_embeddings(docs, emb, THETA, **kw)
            ids = sorted(r[0] for r in out.select("doc_id").collect())
            w = time.perf_counter() - t0
            spark.catalog.clearCache()
            walls.setdefault(label, []).append(w)
            kept_ids[label] = ids
            print(
                f"  rep{rep} {label}: {w:.2f}s kept={len(ids)} "
                f"load={os.getloadavg()[0]:.1f}",
                file=sys.stderr,
                flush=True,
            )

    rt = f"auto rt={TARGET}"
    same = kept_ids[rt] == kept_ids["exact"]
    print(f"\n| method | wall (s, min-of-{REPEATS} interleaved) | kept docs "
          "| kept set |")
    print("|---|---|---|---|")
    print(f"| exact | {min(walls['exact']):.2f} | "
          f"{len(kept_ids['exact'])} | (truth) |")
    print(f"| auto recall_target={TARGET} (-> ivf nprobe {esc_np}) | "
          f"{min(walls[rt]):.2f} | {len(kept_ids[rt])} | "
          f"{'IDENTICAL to exact' if same else 'DIVERGES'} |")


if __name__ == "__main__":
    main()
