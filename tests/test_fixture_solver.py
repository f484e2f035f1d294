"""Cross-validation of the independent fixture solver (scripts/fixture_solver).

The d=2 oracle fixtures are only trustworthy if the successive-shortest-path
solver and the engine's transportation simplex (kernel/emd.py) — two
unrelated algorithm families — agree on the exact optimum.  Three-way check:
SSP vs simplex on random sparse/dense inputs, and both vs the d=1 closed
form (area between CDFs), which is a third independent derivation.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))

from fixture_solver import ssp_emd  # noqa: E402

from melody_join_spark.kernel import normalize  # noqa: E402
from melody_join_spark.kernel.emd import emd_exact  # noqa: E402


@pytest.fixture(scope="module")
def lattice_cost():
    g = 4
    pts = np.array([[i, j] for i in range(g) for j in range(g)], dtype=np.float64)
    return np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=2)


def test_ssp_matches_simplex_sparse(lattice_cost):
    rng = np.random.default_rng(7)
    for _ in range(400):
        a = np.zeros(16)
        b = np.zeros(16)
        for i in rng.choice(16, rng.integers(1, 7), replace=False):
            a[i] = rng.integers(1, 20)
        for i in rng.choice(16, rng.integers(1, 7), replace=False):
            b[i] = rng.integers(1, 20)
        e1 = emd_exact(normalize(a[None])[0], normalize(b[None])[0], lattice_cost)
        e2 = ssp_emd(a, b, lattice_cost)
        assert abs(e1 - e2) < 1e-9, (a, b, e1, e2)


def test_ssp_matches_simplex_dense(lattice_cost):
    rng = np.random.default_rng(11)
    for _ in range(100):
        a = rng.random(16)
        b = rng.random(16)
        e1 = emd_exact(normalize(a[None])[0], normalize(b[None])[0], lattice_cost)
        e2 = ssp_emd(a, b, lattice_cost)
        assert abs(e1 - e2) < 1e-9


def test_ssp_matches_1d_closed_form():
    pos = np.arange(12, dtype=np.float64)
    C = np.abs(pos[:, None] - pos[None, :])
    rng = np.random.default_rng(13)
    for _ in range(200):
        a = rng.random(12)
        b = rng.random(12)
        closed = float(np.abs(np.cumsum(a / a.sum() - b / b.sum()))[:-1].sum())
        assert abs(closed - ssp_emd(a, b, C)) < 1e-9


def test_ssp_identical_and_zero():
    C = np.abs(np.arange(4.0)[:, None] - np.arange(4.0)[None, :])
    a = np.array([1.0, 2.0, 0.0, 1.0])
    assert ssp_emd(a, 3 * a, C) == 0.0  # scale-invariant (L1 normalization)
    assert ssp_emd(np.zeros(4), a, C) == 0.0  # zero-mass convention


@pytest.mark.parametrize(
    "fname,ground",
    [("emd2d_pairs_sf001.parquet", "l2"), ("emd2d_l1_pairs_sf001.parquet", "l1")],
)
def test_fixture_file_matches_engine_sample(fname, ground):
    """Spot-check the committed fixtures against the engine kernel: 200
    random fixture rows re-solved with the transportation simplex must
    agree to 1e-9 (catches a stale fixture after testdata regeneration)."""
    fx = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "fixtures", fname
    )
    if not os.path.exists(fx):
        pytest.skip("fixture not built")
    import pyarrow.parquet as pq

    from melody_join_spark.session import get_spark
    from melody_join_spark.plans.tpch_bridge import (
        bin_points_2d,
        lineitem_histograms_2d,
    )

    if not os.path.isdir("/root/testdata/sf0.01"):
        pytest.skip("testdata not present")
    spark = get_spark("test-fixture")
    rows = (
        lineitem_histograms_2d(spark, "/root/testdata/sf0.01")
        .select("id", "w")
        .collect()
    )
    W = {int(r["id"]): normalize(np.asarray(r["w"], dtype=np.float64)[None])[0] for r in rows}
    pts = bin_points_2d()
    from melody_join_spark.kernel.ground import ground_distance_matrix

    C = ground_distance_matrix(pts.ravel(), dimension=2, ground=ground)
    t = pq.read_table(fx).to_pandas()
    assert set(t["rid"]).issubset(W.keys()) and set(t["sid"]).issubset(W.keys())
    n = len(W)
    assert len(t) == n * (n - 1) // 2, "fixture must be complete all-pairs"
    sample = t.sample(200, random_state=3)
    for _, r in sample.iterrows():
        e = emd_exact(W[int(r["rid"])], W[int(r["sid"])], C)
        assert abs(e - r["emd"]) < 1e-9


def test_simhash_py_matches_spark_udf(spark):
    """The fixture's pure-python simhash re-execution must agree with the
    operator's pandas UDF on real document texts (spec parity)."""
    from make_fixtures import _simhash64_py

    from melody_join_spark.operators.dedup import simhash64

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("testdata not present")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {r.id: r.simhash for r in simhash64(docs).collect()}
    for r in docs.collect():
        assert got[r.doc_id] == _simhash64_py(r.text), r.doc_id
    assert _simhash64_py("") == 0 and _simhash64_py(None) == 0


def test_minhash_py_matches_spark_udf(spark):
    """The fixture's pure-python minhash re-execution must produce the same
    signatures as the operator's pandas UDF (spec parity)."""
    import zlib

    from melody_join_spark.operators.dedup import minhash_signatures

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("testdata not present")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    got = {r.id: list(r.sig) for r in minhash_signatures(docs).collect()}
    rng = np.random.default_rng(42)
    M = (1 << 31) - 1
    a = rng.integers(1, M, size=128, dtype=np.int64)
    b = rng.integers(0, M, size=128, dtype=np.int64)
    for r in docs.collect():
        s = " ".join((r.text or "").lower().split())
        grams = {s} if len(s) < 5 else {s[i:i + 5] for i in range(len(s) - 4)}
        h = np.fromiter((zlib.crc32(g.encode()) for g in grams), dtype=np.int64) % M
        sig = ((h[:, None] * a[None, :] + b[None, :]) % M).min(axis=0)
        assert got[r.doc_id] == sig.tolist(), r.doc_id
