#!/usr/bin/env python
"""Measured scale point above sf0.1 for the LLM-pipeline families
(dedup / text / ANN) — the companion to scripts/scale_run.py, which
covers the EMD join family.

The sf1 corpus is synthesized deterministically from the sf0.1 tables:

- documents x10: replica 0 is the source row; replicas 1..9 re-tokenize
  the text and replace ~2% of tokens with replica-marked variants.  The
  rng is seeded by (crc32(text), rep) — NOT by doc_id — so exact-duplicate
  source rows stay exact duplicates within a replica generation (the
  planted exact-dup groups replicate x10 as groups), while any two
  replicas of one source are ~96% token-identical: a planted NEAR-dup
  family of 10 per source whose pair count grows with the square of the
  replication factor.  This is the regime where a trusting all-pairs plan
  pays 100x and a bucketed plan pays ~output.
- embeddings x10: replica 0 unchanged; replicas add seeded gaussian noise
  (sigma = 2% of the vector norm) — a cosine near-dup family of 10 per
  source vector.

Queries are the UNMODIFIED `__spark_entry__.queries()` callables pointed
at the synthesized directory — the same code path the correctness gate
hashes at sf0.01.  Per (query, scale) the script records interleaved
min-of-REPEATS wall and the output row count, then prints growth ratios.

Usage: python scripts/scale_pipeline.py [--repeats=3]
Writes nothing outside /tmp; prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REP = 10
SEED = 20260814
REPEATS = 3
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])
    elif a.startswith("--only="):  # subset while iterating on one family
        ONLY = {s for s in a.split("=", 1)[1].split(",") if s}

SF01 = "/root/testdata/sf0.1"
SCALE_DIR = "/tmp/spark_graft_scale_pipeline"

QUERIES = [
    "text_features",
    "quality_filter",
    "split_corpus",
    "dedup_exact",
    "dedup_jaccard_ngram",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "cosine_pairs_lsh",
    "cosine_pairs_ivf",
    "cosine_topk_ivf",
    "dedup_embedding",
]


def build_scaled(spark) -> None:
    import pandas as pd

    marker = os.path.join(SCALE_DIR, f"_BUILT_{REP}_{SEED}")
    if os.path.exists(marker):
        return

    docs = spark.read.parquet(f"{SF01}/documents.parquet").repartition(32)

    def perturb_docs(it):
        for pdf in it:
            out = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
            for did, text, lang, source in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
            ):
                # seed by text content: exact-dup sources perturb
                # identically, so exact-dup groups survive replication
                tseed = zlib.crc32(text.encode("utf-8", "surrogatepass"))
                for rep in range(REP):
                    if rep == 0:
                        t = text
                    else:
                        rng = np.random.default_rng((SEED, tseed, rep))
                        toks = text.split(" ")
                        mask = rng.random(len(toks)) < 0.02
                        t = " ".join(
                            f"{tok}~r{rep}" if m else tok
                            for tok, m in zip(toks, mask)
                        )
                    out["doc_id"].append(int(did) * 16 + rep)
                    out["text"].append(t)
                    out["lang"].append(lang)
                    out["source"].append(source)
                    out["n_chars"].append(len(t))
            yield pd.DataFrame(out)

    docs.mapInPandas(
        perturb_docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{SCALE_DIR}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").repartition(32)

    def perturb_emb(it):
        for pdf in it:
            out_id, out_v, out_l = [], [], []
            for vid, v, lab in zip(pdf["vec_id"], pdf["embedding"], pdf["label"]):
                v = np.asarray(v, dtype=np.float32)
                scale = 0.02 * float(np.linalg.norm(v)) / max(1.0, np.sqrt(v.size))
                for rep in range(REP):
                    if rep == 0:
                        jv = v
                    else:
                        rng = np.random.default_rng((SEED, int(vid), rep))
                        jv = v + rng.normal(0.0, scale, size=v.shape).astype(
                            np.float32
                        )
                    out_id.append(int(vid) * 16 + rep)
                    out_v.append(jv.tolist())
                    out_l.append(int(lab))
            yield pd.DataFrame(
                {"vec_id": out_id, "embedding": out_v, "label": out_l}
            )

    emb.mapInPandas(
        perturb_emb, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{SCALE_DIR}/embeddings.parquet")
    open(marker, "w").close()


def main() -> None:
    import importlib

    from melody_join_spark.session import get_spark

    ent = importlib.import_module("__spark_entry__")
    spark = get_spark()
    build_scaled(spark)
    qs = ent.queries()
    queries = [q for q in QUERIES if ONLY is None or q in ONLY]

    results = {}
    for rep in range(REPEATS):
        for name in queries:
            for scale, d in (("sf0.1", SF01), ("sf1", SCALE_DIR)):
                t0 = time.perf_counter()
                n_out = qs[name](spark, d).count()
                wall = time.perf_counter() - t0
                spark.catalog.clearCache()
                key = (name, scale)
                best = results.get(key)
                if best is None or wall < best["wall"]:
                    results[key] = {"wall": wall, "out": n_out}
        print(
            f"-- repeat {rep + 1}/{REPEATS} done, load "
            f"{os.getloadavg()[0]:.1f}",
            file=sys.stderr,
        )

    print(f"docs x{REP}, embeddings x{REP} (N^2 families would be x{REP * REP})")
    print()
    print("| query | sf0.1 wall (s) | sf1 wall (s) | wall | sf0.1 out | sf1 out | output |")
    print("|---|---|---|---|---|---|---|")
    for name in queries:
        s, b = results[(name, "sf0.1")], results[(name, "sf1")]
        print(
            f"| {name} | {s['wall']:.2f} | {b['wall']:.2f} | "
            f"x{b['wall'] / max(s['wall'], 1e-9):.1f} | {s['out']} | {b['out']} | "
            f"x{b['out'] / max(s['out'], 1):.1f} |"
        )


if __name__ == "__main__":
    main()
