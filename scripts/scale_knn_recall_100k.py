#!/usr/bin/env python
"""Second k-NN recall point for the `ivf_search` sizing table (round-7
VERDICT next #7): the round-7 curve was measured at 20k vectors and "may
not transfer" — this measures the same protocol at 100k (the replica
table from scale_embed_100k.py): 256 queries sampled from the corpus,
k=10, exact `cosine_topk` as truth, recall = fraction of true (qid, nid)
neighbor pairs returned by `ivf_search` at each nprobe.

Usage: python scripts/scale_knn_recall_100k.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR_100K = "/tmp/spark_graft_scale_emb100k"
K = 10
N_QUERIES = 256
PROBES = (1, 2, 4, 8, 16, 32)


def main() -> None:
    from pyspark.sql import functions as F

    from melody_join_spark.operators.similarity import (
        cosine_topk,
        derive_nlist,
        ivf_build,
        ivf_search,
    )
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{DIR_100K}/embeddings.parquet")
    n = emb.count()
    nlist = derive_nlist(n)
    # deterministic query sample: hash-ordered, same policy as the seeded
    # samples elsewhere (no Date.now-style nondeterminism in evidence runs)
    queries = (
        emb.orderBy(F.xxhash64("vec_id"))
        .limit(N_QUERIES)
        .select("vec_id", "embedding")
        .persist()
    )
    queries.count()
    print(f"N={n}, nlist={nlist}, {N_QUERIES} queries, k={K}", flush=True)

    t0 = time.perf_counter()
    truth = {
        (r.qid, r.nid)
        for r in cosine_topk(emb, queries, k=K).select("qid", "nid").collect()
    }
    print(f"exact truth: {len(truth)} pairs in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    idx = ivf_build(emb, nlist=nlist)
    print("| nprobe | recall@10 (100k) | wall (s, single-shot context) |")
    print("|---|---|---|")
    for p in PROBES:
        t0 = time.perf_counter()
        got = {
            (r.qid, r.nid)
            for r in ivf_search(idx, queries, k=K, nprobe=p)
            .select("qid", "nid")
            .collect()
        }
        w = time.perf_counter() - t0
        rec = len(got & truth) / max(len(truth), 1)
        print(f"| {p} | {rec:.3f} | {w:.1f} |", flush=True)


if __name__ == "__main__":
    main()
