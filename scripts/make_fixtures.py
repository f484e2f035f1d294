"""Build oracle fixtures for the d>=2 EMD queries.

The DuckDB oracle cannot express an LP per pair, so the d=2 queries were
rows-only checks in round 1.  This script computes the complete all-pairs
exact-EMD table for the sf0.01 d=2 workload with the INDEPENDENT
successive-shortest-path solver (scripts/fixture_solver.py — a different
algorithm family from the engine's transportation simplex, cross-validated
to 1e-15 in tests/test_fixture_solver.py) and writes it to
``fixtures/emd2d_pairs_sf001.parquet``.  The oracle SQL for the four d=2
queries (threshold grid, threshold pivot, top-k, kNN) then derives each
result from this table with plain SQL over ``read_parquet``.

Inputs come from the exact same helper the Spark queries use
(`plans.tpch_bridge.lineitem_histograms_2d`), so engine and oracle see
identical histograms by construction.

Usage: python scripts/make_fixtures.py  (~2-4 min on 16 cores)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
OUT = os.path.join(_FIXDIR, "emd2d_pairs_sf001.parquet")
OUT_L1 = os.path.join(_FIXDIR, "emd2d_l1_pairs_sf001.parquet")
OUT_SIMHASH = os.path.join(_FIXDIR, "simhash_pairs_sf001.parquet")
OUT_MINHASH = os.path.join(_FIXDIR, "minhash_pairs_sf001.parquet")

_W = None
_C = None


def _init(W, C):
    global _W, _C
    _W, _C = W, C


def _pairs_for(i: int):
    from fixture_solver import ssp_emd

    n = _W.shape[0]
    return [(i, j, ssp_emd(_W[i], _W[j], _C)) for j in range(i + 1, n)]


def _simhash64_py(text: str) -> int:
    """Pure-python re-execution of operators/dedup.simhash64's spec (crc32
    sign-hash over the distinct lowercased word set) — no Spark, no shared
    code with the operator's pandas UDF."""
    import zlib

    words = set((text or "").lower().split())
    if not words:
        return 0
    acc = [0] * 64
    for w in words:
        e = w.encode()
        h = ((zlib.crc32(e) << 32) | zlib.crc32(e + b"#salt")) & ((1 << 64) - 1)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    packed = 0
    for bit in range(64):
        if acc[bit] > 0:
            packed |= 1 << bit
    # two's-complement view as signed int64 (Spark LongType)
    return packed - (1 << 64) if packed >= (1 << 63) else packed


def make_simhash_fixture(max_hamming: int = 3) -> None:
    """All (rid, sid, hamming<=max_hamming) simhash pairs for sf0.01
    documents, computed entirely outside Spark: independent re-execution of
    the deterministic simhash spec turns the dedup_simhash query into a
    hash-grade check (the banding join is pigeonhole-EXACT for
    hamming <= chunks-1, so spark output == this table)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    hashes = np.array(
        [_simhash64_py(x) for x in texts], dtype=np.int64
    ).view(np.uint64)
    order = np.argsort(np.asarray(ids))
    ids_s = np.asarray(ids)[order]
    h_s = hashes[order]
    x = h_s[:, None] ^ h_s[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    for b in range(64):
        ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
    iu = np.triu_indices(len(ids_s), k=1)
    keep = ham[iu] <= max_hamming
    rid = ids_s[iu[0]][keep]
    sid = ids_s[iu[1]][keep]
    hm = ham[iu][keep]
    tbl = pa.table(
        {
            "rid": pa.array(rid.tolist(), type=pa.int64()),
            "sid": pa.array(sid.tolist(), type=pa.int64()),
            "hamming": pa.array(hm.tolist(), type=pa.int64()),
        }
    )
    pq.write_table(tbl, OUT_SIMHASH)
    print(f"wrote {OUT_SIMHASH}: {len(hm)} pairs (hamming <= {max_hamming})")


def make_minhash_fixture(
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 16,
    shingle: int = 5,
    seed: int = 42,
) -> None:
    """Pure-python re-execution of the full MinHash-LSH pipeline spec
    (operators/dedup.minhash_lsh_pairs): crc32 shingle hashes, seeded
    Mersenne permutations, banded bucketing (tuple equality == the md5 band
    key equality the operator joins on), exact char-shingle jaccard verify.
    MinHash LSH is *deterministic given its seed*, so its output is a fixed
    set — re-deriving it without Spark turns dedup_minhash_lsh into a
    hash-grade check of the operator's distributed execution."""
    import zlib
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    rng = np.random.default_rng(seed)
    M = (1 << 31) - 1
    a = rng.integers(1, M, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, M, size=num_hashes, dtype=np.int64)
    rows = num_hashes // bands

    def shingle_hashes(text):
        s = " ".join((text or "").lower().split())
        grams = {s} if len(s) < shingle else {
            s[i:i + shingle] for i in range(len(s) - shingle + 1)
        }
        return np.fromiter(
            (zlib.crc32(g.encode()) for g in grams), dtype=np.int64
        ) % M

    def char_grams(text):
        s = (text or "").lower()
        if len(s) <= shingle:
            return {s}
        return {s[i:i + shingle] for i in range(len(s) - shingle + 1)}

    sigs = []
    for txt in texts:
        h = shingle_hashes(txt)
        sigs.append(((h[:, None] * a[None, :] + b[None, :]) % M).min(axis=0))
    buckets: dict = {}
    for k, sig in enumerate(sigs):
        for bnd in range(bands):
            key = (bnd, tuple(sig[bnd * rows:(bnd + 1) * rows]))
            buckets.setdefault(key, []).append(k)
    cand = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                if ids[x] > ids[y]:
                    x, y = y, x
                cand.add((x, y))
    toks = [char_grams(txt) for txt in texts]
    rid, sid, jac = [], [], []
    for x, y in sorted(cand, key=lambda p: (ids[p[0]], ids[p[1]])):
        inter = len(toks[x] & toks[y])
        j = inter / (len(toks[x]) + len(toks[y]) - inter)
        if j >= threshold:
            rid.append(ids[x])
            sid.append(ids[y])
            jac.append(j)
    tbl = pa.table(
        {
            "rid": pa.array(rid, type=pa.int64()),
            "sid": pa.array(sid, type=pa.int64()),
            "jaccard": pa.array(jac, type=pa.float64()),
        }
    )
    pq.write_table(tbl, OUT_MINHASH)
    print(f"wrote {OUT_MINHASH}: {len(rid)} pairs (j >= {threshold})")


def main() -> None:
    from melody_join_spark.session import get_spark
    from melody_join_spark.plans.tpch_bridge import (
        bin_points_2d,
        lineitem_histograms_2d,
    )

    spark = get_spark("make-fixtures")
    rows = (
        lineitem_histograms_2d(spark, SF_DIR)
        .select("id", "w")
        .orderBy("id")
        .collect()
    )
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    W = np.stack([np.asarray(r["w"], dtype=np.float64) for r in rows])
    pts = bin_points_2d()
    n = len(ids)

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_FIXDIR, exist_ok=True)
    diff = np.abs(pts[:, None, :] - pts[None, :, :])
    for out, C in (
        (OUT, np.sqrt((diff**2).sum(axis=2))),  # L2 (engine default)
        (OUT_L1, diff.sum(axis=2)),  # L1 (DistanceType LONE)
    ):
        print(f"{n} histograms -> {n * (n - 1) // 2} pairs ({out})")
        t0 = time.time()
        with mp.Pool(16, initializer=_init, initargs=(W, C)) as pool:
            chunks = pool.map(_pairs_for, range(n))
        rid, sid, emd = [], [], []
        for ch in chunks:
            for i, j, e in ch:
                rid.append(int(ids[i]))
                sid.append(int(ids[j]))
                emd.append(e)
        print(f"solved in {time.time() - t0:.1f}s")
        tbl = pa.table(
            {
                "rid": pa.array(rid, type=pa.int64()),
                "sid": pa.array(sid, type=pa.int64()),
                "emd": pa.array(emd, type=pa.float64()),
            }
        )
        pq.write_table(tbl, out)
        e = np.array(emd)
        print(f"wrote {out}: {len(e)} pairs, emd range [{e.min():.6f}, {e.max():.6f}]")
        print(f"pairs <= 0.25+1e-4: {(e <= 0.2501).sum()}")
        srt = np.sort(e)
        print("top-20 boundary gap:", srt[20] - srt[19])


if __name__ == "__main__":
    make_simhash_fixture()
    make_minhash_fixture()
    main()
