#!/usr/bin/env python
"""sf1-scale evidence for the round-10 decontaminate operator: x10 the
sf0.1 documents table (50k docs, re-keyed replicas — text duplication is
the realistic regime: leaked eval prompts recur across crawl copies) vs a
~500-excerpt eval set, interleaved min-of-n, plan shape recorded.

Usage: python scripts/scale_decontaminate.py [--repeats=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 2
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SF01 = "/root/testdata/sf0.1"
# round 11 (VERDICT optional #7): a second decade.  Replication uses ONE
# scan + explode(sequence(0, k-1)) instead of a k-way union so the x100
# tier doesn't drown in plan overhead (the r10 x10 rows used a union; the
# x10 walls below confirm the two replication methods agree).
TIERS = (1, 10, 100)


def main() -> None:
    from pyspark.sql import functions as F

    from melody_join_spark.operators.dedup import decontaminate, scrub_contamination
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    n_small = docs.count()

    def replicate(k: int):
        if k == 1:
            return docs
        # the sf0.1 table is ONE parquet file, so explode(sequence) alone
        # would leave the k-times corpus in a single cached partition (one
        # task doing all the work — measured x6.7 instead of x1.3 at x10);
        # repartition to task-sized splits BEFORE the persist.count()
        # materialization, outside every timed window
        return docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_k"),
            "doc_id",
            "text",
        ).select(
            (F.col("doc_id") + F.col("_k") * 10_000_000).alias("doc_id"),
            "text",
        ).repartition(min(64, 2 * k))

    tiers = []
    for k in TIERS:
        d = replicate(k).persist()
        tiers.append((f"x{k}", d, d.count()))

    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    evals = docs.where(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(w, 11, 50), " ").alias("text"),
    ).persist()
    n_eval = evals.count()

    results: dict = {}
    for rep in range(REPEATS):
        for scale, d, n_d in tiers:
            for op_name, op in (("decontaminate", decontaminate),
                                ("scrub", scrub_contamination)):
                t0 = time.perf_counter()
                res = op(d, evals, n=13)
                if op_name == "scrub":
                    out = res.where("n_hits > 0").count()
                else:
                    out = res.count()
                wall = time.perf_counter() - t0
                key = (scale, op_name)
                best = results.get(key)
                if best is None or wall < best[0]:
                    results[key] = (wall, out, n_d)
                print(f"rep{rep} {scale} {op_name}: {wall:.2f}s out={out} "
                      f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                      flush=True)

    print(f"\neval set: {n_eval} excerpts; interleaved min-of-{REPEATS}:\n")
    print("| scale | op | docs | wall (s) | output rows |")
    print("|---|---|---|---|---|")
    for scale, _, _ in tiers:
        for op_name in ("decontaminate", "scrub"):
            wall, out, n_d = results[(scale, op_name)]
            print(f"| {scale} | {op_name} | {n_d:,} | {wall:.2f} | {out:,} |")
    base = tiers[0][0]
    for scale, _, _ in tiers[1:]:
        for op_name in ("decontaminate", "scrub"):
            s, b = results[(base, op_name)], results[(scale, op_name)]
            print(f"{op_name} growth at {scale} docs: "
                  f"wall x{b[0] / max(s[0], 1e-9):.1f}, "
                  f"output x{b[1] / max(s[1], 1):.1f}")


if __name__ == "__main__":
    main()
