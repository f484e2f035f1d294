#!/usr/bin/env python
"""Price pack_sequences' greedy fill (round-10 VERDICT next #4).

Part 1 (no Spark): single-core micro-bench of the fill kernel — the
round-10 per-row Python loop vs the round-11 vectorized O(bins) fill —
at 1e6 / 1e7 / 1e8 rows, rows/s/core.

Part 2 (Spark): pack_sequences end-to-end at x10 and x100 the sf0.1
chunk count (re-keyed unions of chunk_documents output), warm repeats,
with the derived num_groups guidance.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C = 256


def per_row(toks, c):
    bins = np.empty(len(toks), dtype=np.int64)
    fill, b = 0, 0
    for k, t in enumerate(toks):
        if k > 0 and fill + t > c:
            b += 1
            fill = 0
        fill += int(t)
        bins[k] = b
    return bins


def micro():
    from melody_join_spark.operators.corpus import _greedy_fill

    rng = np.random.default_rng(11)
    print("| rows | per-row loop | vectorized | ratio | rows/s/core (new) |")
    print("|---|---|---|---|---|")
    for n in (1_000_000, 10_000_000, 100_000_000):
        toks = rng.integers(16, 96, size=n).astype(np.int64)  # 64-ish tokens
        t_old = float("nan")
        want = None
        if n <= 10_000_000:
            for _ in range(3):
                t0 = time.time()
                want = per_row(toks, C)
                t_old = min(t_old, time.time() - t0) if t_old == t_old else (
                    time.time() - t0
                )
        t_new = float("inf")
        for _ in range(3):
            t0 = time.time()
            got = _greedy_fill(toks, C)
            t_new = min(t_new, time.time() - t0)
        if want is not None:
            assert np.array_equal(got, want)
        old_s = f"{t_old:.2f}s" if want is not None else "(skipped)"
        ratio = f"{t_old / t_new:.1f}x" if want is not None else "-"
        print(
            f"| {n:,} | {old_s} | {t_new:.2f}s | {ratio} | "
            f"{n / t_new / 1e6:.1f}M |"
        )


def spark_scale():
    from melody_join_spark.operators.corpus import chunk_documents, pack_sequences
    from melody_join_spark.session import get_spark

    spark = get_spark("scale-pack")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    chunks = chunk_documents(docs, chunk_tokens=64).select(
        "id", "chunk_id", "n_tokens"
    )
    base = chunks.persist()
    n1 = base.count()
    for mult, tag in ((1, "sf0.1"), (10, "x10"), (100, "x100")):
        big = base
        if mult > 1:
            # deterministic re-key: shift ids per replica
            from functools import reduce

            reps = [
                base.select(
                    (F.col("id") + F.lit(k * 10_000_000)).alias("id"),
                    "chunk_id",
                    "n_tokens",
                )
                for k in range(mult)
            ]
            big = reduce(lambda a, b: a.unionByName(b), reps)
        walls = []
        for _ in range(3):
            t0 = time.time()
            n = pack_sequences(big, context_len=C, num_groups=64).count()
            walls.append(time.time() - t0)
        print(
            f"| {tag} | {n1 * mult:,} chunks | {n:,} rows | "
            f"min {min(walls):.2f}s | runs {[round(w, 2) for w in walls]} |"
        )
    base.unpersist()
    spark.stop()


if __name__ == "__main__":
    if "--spark-only" not in sys.argv:
        micro()
    if "--micro-only" not in sys.argv:
        spark_scale()
