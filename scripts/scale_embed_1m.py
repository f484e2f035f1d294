#!/usr/bin/env python
"""Fourth embedding scale point: 10^6 x 64-dim — the decade the SCALE.md
narrative predicts as the IVF->LSH crossover but round 6 had not measured
(round-6 VERDICT next #7).

Table shape: 50,000 seeded synthetic source directions x 20 replicas at
the 2%-relative-noise scheme of scale_embed_100k.py — keeping near-dup
DENSITY realistic (9.5M planted pairs ~ 2e-5 of all pairs).  A first
attempt replicated the 2k sf0.1 vectors x500: 249.5M planted pairs (25%
of ALL pairs near-dup) drove billions of in-family LSH candidate rows and
filled the disk mid-shuffle — a density no dedup corpus has; scale probes
must scale SOURCES, not duplicates-per-source.

Ground truth is the planted near-dup family (replicas of one source are
each other's cos>=0.95 partners), computed DISTRIBUTED per family this
time — 1M x 64 doubles do not belong on the driver.  Reports, interleaved
min-of-REPEATS: ivf_cosine_pairs (derived nprobe) and lsh_cosine_pairs
(derived banding) wall + planted recall at threshold 0.95.

Usage: python scripts/scale_embed_1m.py [--repeats=2] [--skip-lsh]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPEATS = 2
SKIP_LSH = False
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])
    elif a == "--skip-lsh":
        SKIP_LSH = True

OUT_DIR = "/tmp/spark_graft_scale_emb1m"
N_SOURCES = 50_000
DIM = 64
REP = 20
STRIDE = 32
SEED = 20260815
THR = 0.95


def build(spark) -> None:
    import pandas as pd

    marker = os.path.join(OUT_DIR, f"_BUILT_{N_SOURCES}_{REP}_{SEED}")
    if os.path.exists(marker):
        return
    src = spark.range(N_SOURCES).repartition(64)

    def perturb(it):
        for pdf in it:
            for vid in pdf["id"]:
                rng = np.random.default_rng((SEED, int(vid)))
                v = rng.standard_normal(DIM).astype(np.float32)
                scale = 0.02 * float(np.linalg.norm(v)) / max(
                    1.0, np.sqrt(v.size)
                )
                noise = rng.normal(0.0, scale, size=(REP, v.size)).astype(
                    np.float32
                )
                noise[0] = 0.0
                J = v[None, :] + noise
                yield pd.DataFrame(
                    {
                        "vec_id": int(vid) * STRIDE + np.arange(REP),
                        "embedding": list(J.astype(np.float64)),
                    }
                )

    src.mapInPandas(perturb, "vec_id long, embedding array<double>").write.mode(
        "overwrite"
    ).parquet(f"{OUT_DIR}/embeddings.parquet")
    open(marker, "w").close()


def planted_count(spark, big) -> int:
    """Planted same-source pairs with true cos >= THR, computed per family
    with applyInPandas (50k families x 20 replicas — never collected)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def fam_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        iu = np.triu_indices(len(V), 1)
        return pd.DataFrame({"n": [int((S[iu] >= THR).sum())]})

    fam = big.withColumn("fam", (F.col("vec_id") / STRIDE).cast("long"))
    res = (
        fam.groupBy("fam")
        .applyInPandas(fam_pairs, "n long")
        .agg(F.sum("n"))
        .first()[0]
    )
    return int(res)


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
    planted = planted_count(spark, big)
    print(f"N = {n_big}; planted same-source pairs cos>={THR}: {planted}",
          file=sys.stderr, flush=True)

    def recall_planted(pairs_df) -> tuple[int, int, float]:
        agg = pairs_df.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(
                (
                    (F.col("rid") / STRIDE).cast("long")
                    == (F.col("sid") / STRIDE).cast("long")
                ).cast("long")
            ).alias("hits"),
        ).first()
        hits = int(agg["hits"] or 0)
        return int(agg["total"]), hits, hits / max(planted, 1)

    methods = [("ivf", lambda: ivf_cosine_pairs(big, THR))]
    if not SKIP_LSH:
        methods.append(("lsh", lambda: lsh_cosine_pairs(big, THR)))
    walls: dict = {}
    stats: dict = {}
    for rep in range(REPEATS):
        for name, fn in methods:
            t0 = time.perf_counter()
            total, hits, rec = recall_planted(fn())
            w = time.perf_counter() - t0
            spark.catalog.clearCache()
            walls.setdefault(name, []).append(w)
            stats[name] = (total, hits, rec)
            print(f"rep{rep} {name}@{THR}: {w:.1f}s pairs={total} "
                  f"planted_recall={rec:.5f} load={os.getloadavg()[0]:.1f}",
                  file=sys.stderr, flush=True)

    print(f"\nN={n_big}, threshold={THR}, planted={planted}; "
          f"interleaved min-of-{REPEATS}:\n")
    print("| method | wall (s) | pairs | planted recall |")
    print("|---|---|---|---|")
    for name, _ in methods:
        total, hits, rec = stats[name]
        print(f"| {name} | {min(walls[name]):.1f} | {total} | {rec:.5f} |")


if __name__ == "__main__":
    main()
