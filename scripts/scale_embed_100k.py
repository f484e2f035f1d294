#!/usr/bin/env python
"""Third embedding scale point: 100k x 64-dim (x50 replication of the
sf0.1 embeddings, same seeded 2%-noise scheme as scale_pipeline.py).

Exact all-pairs is ~25x the 20k cost (~16 min/run), so the ground truth
here is the PLANTED near-dup family: replicas of one source vector are
each other's cos>=0.95 partners by construction (verified on a sample
below).  Reports, interleaved min-of-REPEATS:

- ivf_cosine_pairs / lsh_cosine_pairs wall at 20k and 100k (growth vs
  the N^1.5 / matches-bound claims),
- recall of PLANTED same-source pairs at threshold 0.95.

Usage: python scripts/scale_embed_100k.py [--repeats=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPEATS = 2
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SF01 = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/spark_graft_scale_emb100k"
REP = 50
SEED = 20260815
THR = 0.95


def build(spark) -> None:
    import pandas as pd

    marker = os.path.join(OUT_DIR, f"_BUILT_{REP}_{SEED}")
    if os.path.exists(marker):
        return
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").repartition(32)

    def perturb(it):
        for pdf in it:
            out_id, out_v = [], []
            for vid, v in zip(pdf["vec_id"], pdf["embedding"]):
                v = np.asarray(v, dtype=np.float32)
                scale = 0.02 * float(np.linalg.norm(v)) / max(
                    1.0, np.sqrt(v.size)
                )
                for rep in range(REP):
                    if rep == 0:
                        jv = v
                    else:
                        rng = np.random.default_rng((SEED, int(vid), rep))
                        jv = v + rng.normal(0.0, scale, size=v.shape).astype(
                            np.float32
                        )
                    out_id.append(int(vid) * 64 + rep)
                    out_v.append(jv.tolist())
            yield pd.DataFrame({"vec_id": out_id, "embedding": out_v})

    emb.mapInPandas(perturb, "vec_id long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(f"{OUT_DIR}/embeddings.parquet")
    open(marker, "w").close()


def main() -> None:
    from pyspark.sql import functions as F

    from melody_join_spark.operators.similarity import (
        ivf_cosine_pairs,
        lsh_cosine_pairs,
    )
    from melody_join_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    big = spark.read.parquet(f"{OUT_DIR}/embeddings.parquet")
    n_big = big.count()
    # the 20k point reuses scale_pipeline's x10 table when present
    small_path = "/tmp/spark_graft_scale_pipeline/embeddings.parquet"
    small = (
        spark.read.parquet(small_path)
        if os.path.exists(small_path)
        else None
    )
    print(f"N big = {n_big}; small = "
          f"{small.count() if small is not None else 'absent'}",
          file=sys.stderr)

    # planted ground truth: same-source replica pairs with true cos >= THR
    # (computed once, exactly, on the driver per source family — 2k
    # families x 50 replicas; vectorized numpy, fold-free: ground truth
    # only needs the VALUE side, not spark-fold parity)
    rows = big.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    src = ids // 64
    planted = 0
    order = np.argsort(src, kind="stable")
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and src[order[j]] == src[order[i]]:
            j += 1
        fam = order[i:j]
        Vf = V[fam]
        Vn = Vf / np.linalg.norm(Vf, axis=1, keepdims=True)
        S = Vn @ Vn.T
        iu = np.triu_indices(len(fam), 1)
        planted += int((S[iu] >= THR).sum())
        i = j
    print(f"planted same-source pairs with cos>=THR: {planted}",
          file=sys.stderr)

    def recall_planted(pairs_df) -> tuple[int, float]:
        hits = (
            pairs_df.where(
                (F.col("rid") / 64).cast("long")
                == (F.col("sid") / 64).cast("long")
            ).count()
        )
        return hits, hits / max(planted, 1)

    methods = [
        ("ivf", lambda df: ivf_cosine_pairs(df, THR, nprobe=2)),
        ("lsh", lambda df: lsh_cosine_pairs(df, THR)),
    ]
    walls: dict = {}
    outs: dict = {}
    rec: dict = {}
    scales = [("100k", big)] + ([("20k", small)] if small is not None else [])
    for r in range(REPEATS):
        for sc, df in scales:
            for name, fn in methods:
                t0 = time.perf_counter()
                res = fn(df)
                c = res.count()
                w = time.perf_counter() - t0
                # planted ids are vid*64+rep only in the 100k table (the
                # 20k table uses a different replica stride; its recall
                # story is the crossover section's)
                if sc == "100k" and (name, sc) not in rec:
                    rec[(name, sc)] = recall_planted(fn(df))
                spark.catalog.clearCache()
                key = (name, sc)
                walls.setdefault(key, []).append(w)
                outs[key] = c
                print(f"rep{r} {name}@{sc}: {w:.1f}s out={c} "
                      f"load={os.getloadavg()[0]:.1f}", file=sys.stderr,
                      flush=True)

    print(f"\nplanted ground truth: {planted} same-source pairs "
          f"(cos >= {THR}); interleaved min-of-{REPEATS}\n")
    print("| scale | method | wall (s) | pairs | planted recall |")
    print("|---|---|---|---|---|")
    for sc, _ in scales:
        for name, _ in methods:
            k = (name, sc)
            r_txt = (
                f"{rec[k][1]:.4f} ({rec[k][0]:,})" if k in rec else "—"
            )
            print(f"| {sc} | {name} | {min(walls[k]):.1f} | {outs[k]:,} |"
                  f" {r_txt} |")


if __name__ == "__main__":
    main()
