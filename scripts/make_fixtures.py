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
OUT_LSHCOS = os.path.join(_FIXDIR, "lsh_cosine_pairs_sf001.parquet")
OUT_IVF = os.path.join(_FIXDIR, "ivf_topk_sf001.parquet")
OUT_IVFPAIRS = os.path.join(_FIXDIR, "ivf_pairs_sf001.parquet")
OUT_SEMDEDUP = os.path.join(_FIXDIR, "semdedup_sf001.parquet")
OUT_BPE_MERGES = os.path.join(_FIXDIR, "bpe_merges_sf001.parquet")
OUT_BPE_ENCODE = os.path.join(_FIXDIR, "bpe_encode_sf001.parquet")
OUT_3D = os.path.join(_FIXDIR, "emd3d_pairs_sf001.parquet")
OUT_ARB = os.path.join(_FIXDIR, "emd2d_sqrtl1_pairs_sf001.parquet")

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


def _fold(vals) -> float:
    """Sequential left fold — bit-parity with Spark's F.aggregate (which is
    a strict left fold, unlike numpy's pairwise/SIMD summation)."""
    acc = 0.0
    for x in vals:
        acc += x
    return acc


def make_lsh_cosine_fixture(
    threshold: float = 0.25,
    num_planes: int | None = None,
    bands: int | None = None,
    seed: int = 42,
) -> None:
    """Pure-python re-execution of hyperplane-LSH cosine pairs
    (operators/similarity.lsh_cosine_pairs): banding DERIVED from
    (N, threshold) exactly like the operator (rows = ceil(log2(N/64))
    clamped 4..16; bands from the collision curve to recall >= 0.99,
    clamped 2..64), seeded hyperplanes, sign-bit band bucketing (tuple
    equality == the operator's md5 band keys), exact cosine verify with
    Spark's left-fold accumulation order.  Deterministic given the seed
    -> hash-grade fixture for cosine_pairs_lsh."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    if num_planes is None:
        n = len(ids)
        r = int(np.clip(math.ceil(math.log2(max(n, 2) / 64.0)), 4, 16))
        p = max(1.0 - math.acos(threshold) / math.pi, 1e-6)
        bands = int(
            np.clip(math.ceil(math.log(0.01) / math.log(1.0 - p**r)), 2, 64)
        )
        num_planes = r * bands
        print(f"derived banding: rows={r} bands={bands} planes={num_planes}")
    # float32 storage cast to double, exactly like _as_double
    vecs = [
        [float(np.float64(np.float32(x))) for x in v]
        for v in t["embedding"].to_pylist()
    ]
    dim = len(vecs[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    rows = num_planes // bands
    norms = [np.sqrt(_fold(x * x for x in v)) for v in vecs]
    bits = []
    for v in vecs:
        bits.append(
            tuple(
                1 if _fold(x * float(c) for x, c in zip(v, planes[p])) >= 0 else 0
                for p in range(num_planes)
            )
        )
    buckets: dict = {}
    for k, bt in enumerate(bits):
        for bnd in range(bands):
            key = (bnd, bt[bnd * rows:(bnd + 1) * rows])
            buckets.setdefault(key, []).append(k)
    cand = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                if ids[x] > ids[y]:
                    x, y = y, x
                cand.add((x, y))
    rid, sid, cos = [], [], []
    for x, y in sorted(cand, key=lambda p: (ids[p[0]], ids[p[1]])):
        c = _fold(a * b for a, b in zip(vecs[x], vecs[y])) / (norms[x] * norms[y])
        if c >= threshold:
            rid.append(ids[x])
            sid.append(ids[y])
            cos.append(c)
    tbl = pa.table(
        {
            "rid": pa.array(rid, type=pa.int64()),
            "sid": pa.array(sid, type=pa.int64()),
            "cosine": pa.array(cos, type=pa.float64()),
        }
    )
    pq.write_table(tbl, OUT_LSHCOS)
    print(f"wrote {OUT_LSHCOS}: {len(rid)} pairs (cos >= {threshold})")


def make_ivf_fixture(
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 16,
    n_queries: int = 32,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> None:
    """Pure-python re-execution of IVF top-k (operators/similarity.ivf_topk
    with the _q_cosine_topk_ivf parameters): seeded spherical k-means
    codebook over the sample in file order, argmax list assignment,
    nprobe-list probing, cosine with the operator's exact accumulation
    orders (Spark left-fold for db dot/norm, numpy norm for the query
    side), HALF_UP rounding to 6 dp, rank by (cosine desc, nid)."""
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)

    # codebook: same sample as the operator — md5(id)-hash order (the
    # operator's deterministic unbiased sample; limit >= table size here,
    # so only the ORDER matters for rng.choice's index mapping), same ops
    import hashlib

    rng = np.random.default_rng(seed)
    md5_order = np.argsort(
        np.array(
            [
                (hashlib.md5(str(int(i)).encode()).hexdigest(), int(i))
                for i in ids
            ],
            dtype=[("h", "U32"), ("i", "i8")],
        ),
        order=("h", "i"),
        kind="stable",
    )
    Xs = vecs[md5_order]  # the kmeans SAMPLE (hash order)
    Xsn = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
    C = Xsn[rng.choice(len(Xsn), size=min(nlist, len(Xsn)), replace=False)]
    for _ in range(kmeans_iters):
        assign = (Xsn @ C.T).argmax(axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                v = Xsn[m].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    C[c] = v / n
    # assignment runs over the FULL table in its own order
    Xn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    list_id = (Xn @ C.T).argmax(axis=1)

    order = np.argsort(np.asarray(ids), kind="stable")[:n_queries]
    rows_out = {"qid": [], "nid": [], "cosine": [], "rank": []}
    for qi in order:
        qv = vecs[qi]
        qn = float(np.linalg.norm(qv))
        sims = (qv / max(qn, 1e-12)) @ C.T
        probes = set(np.argsort(-sims)[:min(nprobe, C.shape[0])].tolist())
        scored = []
        for j in range(len(ids)):
            if ids[j] == ids[qi] or int(list_id[j]) not in probes:
                continue
            dot = _fold(a * b for a, b in zip(vecs[j], qv))
            nrm = np.sqrt(_fold(x * x for x in vecs[j]))
            c = dot / (nrm * qn)
            c6 = float(
                Decimal(c).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            )
            scored.append((-c6, ids[j]))
        scored.sort()
        for r, (negc, nid) in enumerate(scored[:k], start=1):
            rows_out["qid"].append(ids[qi])
            rows_out["nid"].append(nid)
            rows_out["cosine"].append(-negc)
            rows_out["rank"].append(r)
    tbl = pa.table(
        {
            "qid": pa.array(rows_out["qid"], type=pa.int64()),
            "nid": pa.array(rows_out["nid"], type=pa.int64()),
            "cosine": pa.array(rows_out["cosine"], type=pa.float64()),
            "rank": pa.array(rows_out["rank"], type=pa.int64()),
        }
    )
    pq.write_table(tbl, OUT_IVF)
    print(f"wrote {OUT_IVF}: {len(rows_out['qid'])} rows")


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


def make_arbitrary_fixture() -> None:
    """All-pairs exact-EMD fixture under an ARBITRARY explicit cost matrix
    (sqrt of the L1 lattice distance — a genuine metric that is no Minkowski
    norm, DistanceType ARBITRARY analog).  Oracle for the
    emd_nd_threshold_arbitrary query; same independent-SSP protocol."""
    from melody_join_spark.session import get_spark
    from melody_join_spark.plans.tpch_bridge import (
        bin_points_2d,
        lineitem_histograms_2d,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = get_spark("make-fixtures-arb")
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
    diff = np.abs(pts[:, None, :] - pts[None, :, :])
    C = np.sqrt(diff.sum(axis=2))  # sqrt(L1): metric by sqrt subadditivity
    os.makedirs(_FIXDIR, exist_ok=True)
    print(f"{n} histograms -> {n * (n - 1) // 2} pairs ({OUT_ARB})")
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
    pq.write_table(tbl, OUT_ARB)
    e = np.array(emd)
    print(f"wrote {OUT_ARB}: {len(e)} pairs, emd range [{e.min():.6f}, {e.max():.6f}]")
    for th in (0.3, 0.4, 0.5, 0.6, 0.8):
        print(f"pairs <= {th}+1e-4: {(e <= th + 1e-4).sum()}")


def make_emd3d_fixture() -> None:
    """All-pairs exact-EMD fixture for the d=3 workload — the reference's
    DEFAULT data shape (d=3, B=27~30 bins, melody-conf.properties:45-64).
    Same independent-SSP-solver protocol as the d=2 fixtures."""
    from melody_join_spark.session import get_spark
    from melody_join_spark.plans.tpch_bridge import (
        bin_points_3d,
        lineitem_histograms_3d,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = get_spark("make-fixtures-3d")
    rows = (
        lineitem_histograms_3d(spark, SF_DIR)
        .select("id", "w")
        .orderBy("id")
        .collect()
    )
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    W = np.stack([np.asarray(r["w"], dtype=np.float64) for r in rows])
    pts = bin_points_3d()
    n = len(ids)
    diff = np.abs(pts[:, None, :] - pts[None, :, :])
    C = np.sqrt((diff**2).sum(axis=2))
    os.makedirs(_FIXDIR, exist_ok=True)
    print(f"{n} histograms -> {n * (n - 1) // 2} pairs ({OUT_3D})")
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
    pq.write_table(tbl, OUT_3D)
    e = np.array(emd)
    print(f"wrote {OUT_3D}: {len(e)} pairs, emd range [{e.min():.6f}, {e.max():.6f}]")
    for th in (0.2, 0.25, 0.3, 0.4, 0.5):
        print(f"pairs <= {th}+1e-4: {(e <= th + 1e-4).sum()}")


def make_ivf_pairs_fixture(
    threshold: float = 0.25,
    nprobe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> None:
    """Pure-python re-execution of IVF-candidate cosine pairs
    (operators/similarity.ivf_cosine_pairs): derived nlist = round(sqrt(N)),
    md5-hash-order kmeans sample, seeded spherical kmeans, stable
    top-nprobe list assignment per vector, candidate pairs = probe-set
    overlap, exact cosine with Spark's left-fold accumulation order.
    Deterministic given the seed -> hash-grade fixture for
    cosine_pairs_ivf."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    # float32 storage cast to double, exactly like _as_double
    vecs = np.array(
        [[float(np.float64(np.float32(x))) for x in v]
         for v in t["embedding"].to_pylist()],
        dtype=np.float64,
    )
    n = len(ids)
    nlist = max(8, int(round(float(n) ** 0.5)))

    # codebook: _ivf_codebook's md5(id)-hash-ordered sample (limit >= table
    # size at sf0.01, so only the ORDER matters), same kmeans ops
    rng = np.random.default_rng(seed)
    md5_order = np.argsort(
        np.array(
            [(hashlib.md5(str(int(i)).encode()).hexdigest(), int(i))
             for i in ids],
            dtype=[("h", "U32"), ("i", "i8")],
        ),
        order=("h", "i"),
        kind="stable",
    )
    Xs = vecs[md5_order]
    Xsn = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
    C = Xsn[rng.choice(len(Xsn), size=min(nlist, len(Xsn)), replace=False)]
    for _ in range(kmeans_iters):
        assign = (Xsn @ C.T).argmax(axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                v = Xsn[m].sum(axis=0)
                nn = np.linalg.norm(v)
                if nn > 1e-12:
                    C[c] = v / nn

    # multi-probe assignment over the full table (per-row independent);
    # stable argsort ties toward the smaller list id, like the operator
    Xn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(Xn @ C.T), axis=1, kind="stable")[:, :nprobe]

    lists: dict[int, list[int]] = {}
    for k in range(n):
        for li in probes[k]:
            lists.setdefault(int(li), []).append(k)
    cand = set()
    for members in lists.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                if ids[x] > ids[y]:
                    x, y = y, x
                if ids[x] != ids[y]:
                    cand.add((x, y))
    norms = [np.sqrt(_fold(x * x for x in v)) for v in vecs]
    rid, sid, cos = [], [], []
    for x, y in sorted(cand, key=lambda p: (ids[p[0]], ids[p[1]])):
        c = _fold(a * b for a, b in zip(vecs[x], vecs[y])) / (norms[x] * norms[y])
        if c >= threshold:
            rid.append(ids[x])
            sid.append(ids[y])
            cos.append(c)
    tbl = pa.table(
        {
            "rid": pa.array(rid, type=pa.int64()),
            "sid": pa.array(sid, type=pa.int64()),
            "cosine": pa.array(cos, type=pa.float64()),
        }
    )
    pq.write_table(tbl, OUT_IVFPAIRS)
    print(f"wrote {OUT_IVFPAIRS}: {len(rid)} pairs (cos >= {threshold}, "
          f"nlist={nlist}, nprobe={nprobe})")


def make_bpe_fixture(num_merges: int = 50) -> None:
    """Independent re-execution of operators/bpe.py's spec (Sennrich 2016
    §3.2) in the ORIGINAL reference style: word types as space-joined
    symbol STRINGS merged via word-boundary regex — a different data
    representation and merge mechanism from the operator's list-based
    loop, converging on the same merge table iff both implement the spec.
    Encoding applies merges sequentially in rank order (equivalent to the
    operator's lowest-rank-first loop: a merge can only enable
    higher-rank merges, since any merge consuming a produced symbol was
    necessarily learned later).  Writes the merge table and the per-doc
    encoded token counts for the sf0.01 documents."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    dt = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                       columns=["doc_id", "text"])
    ids = dt["doc_id"].to_pylist()
    texts = dt["text"].to_pylist()

    def words(t):
        return [w for w in (t or "").strip().lower().split() if w]

    counts: dict[str, int] = {}
    for t in texts:
        for w in words(t):
            counts[w] = counts.get(w, 0) + 1
    # (count desc, word asc) like the operator's type ranking
    types = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))

    # training state: word type -> space-joined symbol string
    state = {w: " ".join(list(w) + ["</w>"]) for w, _ in types}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in types:
            sym = state[w].split(" ")
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        joined = best[0] + best[1]
        state = {w: pat.sub(joined, s) for w, s in state.items()}

    tbl = pa.table(
        {
            "rank": pa.array(range(len(merges)), type=pa.int64()),
            "left": pa.array([m[0] for m in merges]),
            "right": pa.array([m[1] for m in merges]),
        }
    )
    pq.write_table(tbl, OUT_BPE_MERGES)

    # encode: apply merges sequentially in rank order per word
    def enc_len(w: str) -> int:
        s = " ".join(list(w) + ["</w>"])
        for a, b in merges:
            pat = re.compile(
                r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)"
            )
            s = pat.sub(a + b, s)
        return len(s.split(" "))

    memo: dict[str, int] = {}
    n_words, n_tok = [], []
    for t in texts:
        ws = words(t)
        n_words.append(len(ws))
        total = 0
        for w in ws:
            if w not in memo:
                memo[w] = enc_len(w)
            total += memo[w]
        n_tok.append(total)
    tbl2 = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, type=pa.int64()),
        }
    )
    pq.write_table(tbl2, OUT_BPE_ENCODE)
    print(f"wrote {OUT_BPE_MERGES}: {len(merges)} merges; "
          f"{OUT_BPE_ENCODE}: {len(ids)} docs")


def make_semdedup_fixture(
    threshold: float = 0.35,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> None:
    """Pure-python re-execution of operators/dedup.semantic_dedup: the
    ivf_cosine_pairs spec at nprobe=1 (primary-cluster assignment only —
    SemDeDup's within-cluster candidate rule), larger id of every
    qualifying pair dropped, kept doc ids written as the fixture.
    Deterministic given the seed."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    vecs = np.array(
        [[float(np.float64(np.float32(x))) for x in v]
         for v in t["embedding"].to_pylist()],
        dtype=np.float64,
    )
    n = len(ids)
    nlist = max(8, int(round(float(n) ** 0.5)))

    rng = np.random.default_rng(seed)
    md5_order = np.argsort(
        np.array(
            [(hashlib.md5(str(int(i)).encode()).hexdigest(), int(i))
             for i in ids],
            dtype=[("h", "U32"), ("i", "i8")],
        ),
        order=("h", "i"),
        kind="stable",
    )
    Xs = vecs[md5_order]
    Xsn = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
    C = Xsn[rng.choice(len(Xsn), size=min(nlist, len(Xsn)), replace=False)]
    for _ in range(kmeans_iters):
        assign = (Xsn @ C.T).argmax(axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                v = Xsn[m].sum(axis=0)
                nn = np.linalg.norm(v)
                if nn > 1e-12:
                    C[c] = v / nn

    # nprobe=1: stable argsort ties toward the smaller list id
    Xn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    primary = np.argsort(-(Xn @ C.T), axis=1, kind="stable")[:, 0]

    lists: dict[int, list[int]] = {}
    for k in range(n):
        lists.setdefault(int(primary[k]), []).append(k)
    norms = [np.sqrt(_fold(x * x for x in v)) for v in vecs]
    dropped: set[int] = set()
    for members in lists.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                if ids[x] > ids[y]:
                    x, y = y, x
                if ids[x] == ids[y]:
                    continue
                c = _fold(a * b for a, b in zip(vecs[x], vecs[y])) / (
                    norms[x] * norms[y]
                )
                if c >= threshold:
                    dropped.add(int(ids[y]))

    dt = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                       columns=["doc_id"])
    kept = sorted(int(d) for d in dt["doc_id"].to_pylist()
                  if int(d) not in dropped)
    tbl = pa.table({"doc_id": pa.array(kept, type=pa.int64())})
    pq.write_table(tbl, OUT_SEMDEDUP)
    print(f"wrote {OUT_SEMDEDUP}: {len(kept)} kept "
          f"({len(dropped)} dropped, cos >= {threshold}, nlist={nlist})")


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only == "emd3d":
        make_emd3d_fixture()
    elif only is None:
        make_simhash_fixture()
        make_minhash_fixture()
        make_lsh_cosine_fixture()
        make_ivf_fixture()
        make_ivf_pairs_fixture()
        main()
        make_emd3d_fixture()
        make_arbitrary_fixture()
    else:
        {"simhash": make_simhash_fixture,
         "minhash": make_minhash_fixture,
         "lshcos": make_lsh_cosine_fixture,
         "ivf": make_ivf_fixture,
         "ivfpairs": make_ivf_pairs_fixture,
         "semdedup": make_semdedup_fixture,
         "bpe": make_bpe_fixture,
         "arbitrary": make_arbitrary_fixture,
         "emd2d": main}[only]()
