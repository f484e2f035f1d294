#!/usr/bin/env python
"""Scale evidence for round-11 semantic_dedup: x1/x10/x100 the sf0.1
embeddings table (2k -> 200k vectors) with deterministic per-replica
jitter (md5-derived, so replicas of one base vector spread from
near-duplicate to merely-nearby — a realistic near-dup-heavy corpus,
not a pathological all-identical one), and measure the full operator
end-to-end (codebook + assignment + within-cluster verify + anti-join).

The claim under test: candidate work is sum over clusters of |cluster|^2
~ N^1.5 at the default nlist ~ sqrt(N), so the x10 step should cost well
under x31.6 (the N^1.5 ratio bounds it; scan/shuffle terms are linear).

Usage: python scripts/scale_semdedup.py [--repeats=2] [--tiers=1,10,100]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 2
TIERS = (1, 10, 100)
THETA = 0.35
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])
    elif a.startswith("--tiers="):
        TIERS = tuple(int(x) for x in a.split("=", 1)[1].split(","))

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from melody_join_spark.operators.dedup import semantic_dedup
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def replicate(k: int):
        if k == 1:
            return emb
        rep = emb.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_k"),
            "vec_id", "embedding",
        ).select(
            (F.col("vec_id") + F.col("_k") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        # deterministic elementwise jitter keyed on (vec_id, dim): the
        # same md5-uniform family as corpus sampling, amplitude 0.15 so
        # one base's replicas range from near-dup to merely-nearby
        u = lambda key: (  # noqa: E731
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
            / F.lit(float(1 << 32))
        )
        jit = rep.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: x
                + 0.15
                * (u(F.concat(F.col("vec_id").cast("string"),
                              F.lit(":"), i.cast("string"))) - 0.5),
            ).cast("array<float>").alias("embedding"),
        )
        return jit.repartition(min(64, 2 * k))

    docs_all = []
    tiers = []
    for k in TIERS:
        d = replicate(k).persist()
        n = d.count()
        docs = d.select(F.col("vec_id").alias("doc_id")).persist()
        docs.count()
        docs_all.append(docs)
        tiers.append((f"x{k}", docs, d, n))

    results: dict = {}
    for rep in range(REPEATS):
        for scale, docs, d, n in tiers:
            t0 = time.perf_counter()
            kept = semantic_dedup(docs, d, threshold=THETA).count()
            wall = time.perf_counter() - t0
            best = results.get(scale)
            if best is None or wall < best[0]:
                results[scale] = (wall, kept, n)
            print(f"rep{rep} {scale}: {wall:.2f}s kept={kept}/{n} "
                  f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                  flush=True)

    print(f"\ntheta={THETA}; interleaved min-of-{REPEATS}:\n")
    print("| scale | vectors | wall (s) | kept | dropped |")
    print("|---|---|---|---|---|")
    for scale, _, _, _ in tiers:
        wall, kept, n = results[scale]
        print(f"| {scale} | {n:,} | {wall:.2f} | {kept:,} | {n - kept:,} |")
    base = results[tiers[0][0]]
    for scale, _, _, _ in tiers[1:]:
        b = results[scale]
        print(f"growth at {scale}: wall x{b[0] / max(base[0], 1e-9):.1f} "
              f"(N x{b[2] / base[2]:.0f}, N^1.5 bound x"
              f"{(b[2] / base[2]) ** 1.5:.0f})")


if __name__ == "__main__":
    main()
