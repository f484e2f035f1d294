#!/usr/bin/env python
"""Scale evidence for the round-11 LM-scoring operators: x1/x10/x100 the
sf0.1 documents table (re-keyed explode replicas, same protocol as
scale_decontaminate.py) and measure perplexity_score (both routes) and
dsir_weights end-to-end (model pass + scoring pass + output count).

The claim under test: both operators are two-streaming-scan shaped — one
vocabulary/bucket-sized groupBy (map-side partial agg, so the shuffle is
model-sized, not token-stream-sized) + one scan-side scoring projection —
so wall should grow roughly with bytes scanned, not superlinearly.

Usage: python scripts/scale_lm.py [--repeats=2] [--tiers=1,10,100]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 2
TIERS = (1, 10, 100)
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])
    elif a.startswith("--tiers="):
        TIERS = tuple(int(x) for x in a.split("=", 1)[1].split(","))
    elif a.startswith("--ops="):
        ONLY = set(a.split("=", 1)[1].split(","))

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from melody_join_spark.operators.lm import dsir_weights, perplexity_score
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text", "source"
    )

    def replicate(k: int):
        if k == 1:
            return docs
        # repartition BEFORE persist: the sf0.1 table is one parquet file,
        # so the exploded replicas would otherwise sit in one partition
        return docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_k"),
            "doc_id", "text", "source",
        ).select(
            (F.col("doc_id") + F.col("_k") * 10_000_000).alias("doc_id"),
            "text", "source",
        ).repartition(min(64, 2 * k))

    tiers = []
    for k in TIERS:
        d = replicate(k).persist()
        tiers.append((f"x{k}", d, d.count()))

    from melody_join_spark.operators.dedup import dedup_paragraphs

    def para(d):
        # plant a shared boilerplate header; suffix each doc's own line
        # with its id so replicas stay unique content (otherwise the
        # replicated corpus is 100% boilerplate and the surviving-line
        # regroup — the expensive stage — carries nothing)
        planted = d.select(
            "doc_id",
            F.concat(
                F.lit("subscribe | terms\n"),
                F.coalesce("text", F.lit("")),
                F.lit(" uniq"),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        # the length filter forces text_clean's reconstruction under
        # count() — otherwise Catalyst prunes the string rebuild out of
        # the timed window entirely
        return dedup_paragraphs(planted).where(
            F.length("text_clean") >= 0
        )

    from melody_join_spark.operators.bpe import bpe_encode, train_bpe
    from melody_join_spark.operators.lm import bigram_score
    from melody_join_spark.operators.text import repetition_filter

    def _rep(d):
        return repetition_filter(d).select(
            "doc_id", "dup_line_frac", "top_2gram_char_frac",
            "dup_5gram_char_frac", "violations", "kept",
        )

    def bpe(d):
        merges = train_bpe(d, num_merges=50)
        return bpe_encode(d, merges)

    ops = (
        ("ppl_map", lambda d: perplexity_score(d, vocab_size=16)),
        ("ppl_join", lambda d: perplexity_score(d, vocab_size=16,
                                                via="join")),
        ("dsir", lambda d: dsir_weights(d, F.col("source") == "src0")),
        ("para", para),
        ("bigram", lambda d: bigram_score(d, vocab_size=16,
                                          bigram_size=64)),
        ("bpe", bpe),
        ("rep", _rep),
        ("mix", lambda d: __import__(
            "melody_join_spark.operators.corpus", fromlist=["mix_corpus"]
        ).mix_corpus(d, {"src0": 400_000, "src1": 70_000, "src2": 130_000})),
    )
    if ONLY:
        ops = tuple(o for o in ops if o[0] in ONLY)
    results: dict = {}
    for rep in range(REPEATS):
        for scale, d, n_d in tiers:
            for op_name, op in ops:
                t0 = time.perf_counter()
                res = op(d)
                # hash EVERY output column: a bare count() lets Catalyst
                # prune the scoring/reconstruction projections out of the
                # timed window (measured: para read a flat 0.7 s at every
                # tier until the text rebuild was forced).  bit_xor, not
                # sum: summing 500k xxhash64 values overflows long under
                # ANSI mode
                out = (
                    res.select(
                        F.xxhash64(
                            *[F.col(c) for c in res.columns]
                        ).alias("_h")
                    )
                    .agg(F.count(F.lit(1)), F.expr("bit_xor(_h)"))
                    .collect()[0][0]
                )
                wall = time.perf_counter() - t0
                key = (scale, op_name)
                best = results.get(key)
                if best is None or wall < best[0]:
                    results[key] = (wall, out, n_d)
                print(f"rep{rep} {scale} {op_name}: {wall:.2f}s out={out} "
                      f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                      flush=True)

    print(f"\ninterleaved min-of-{REPEATS}:\n")
    print("| scale | op | docs | wall (s) | output rows |")
    print("|---|---|---|---|---|")
    for scale, _, _ in tiers:
        for op_name, _ in ops:
            wall, out, n_d = results[(scale, op_name)]
            print(f"| {scale} | {op_name} | {n_d:,} | {wall:.2f} | {out:,} |")
    base = tiers[0][0]
    for scale, _, _ in tiers[1:]:
        for op_name, _ in ops:
            s, b = results[(base, op_name)], results[(scale, op_name)]
            print(f"{op_name} growth at {scale} docs: "
                  f"wall x{b[0] / max(s[0], 1e-9):.1f}, "
                  f"output x{b[1] / max(s[1], 1):.1f}")


if __name__ == "__main__":
    main()
