"""Batched exact EMD (kernel/emd_batch.py) == scalar transportation simplex.

The batched solver must agree with the scalar one (itself golden-tested and
cross-validated against the independent SSP fixture solver) to float
round-off on every regime the join operators feed it: sparse/dense supports,
Minkowski and arbitrary cost matrices, identical rows, point masses, and the
m==1 / n==1 closed forms.
"""

import numpy as np
import pytest

from melody_join_spark.kernel.emd import emd_exact
from melody_join_spark.kernel.emd_batch import (
    MIN_BATCH,
    emd_exact_batch,
    emd_exact_pairs,
    emd_exact_pairs_memo,
    support_table,
)
from melody_join_spark.kernel.ground import ground_distance_matrix


def _sparse_hists(rng, R, B, lo=1, hi=8):
    W = np.zeros((R, B))
    for r in range(R):
        s = rng.integers(lo, hi)
        idx = rng.choice(B, size=s, replace=False)
        W[r, idx] = rng.integers(1, 20, size=s)
    return W / W.sum(1, keepdims=True)


@pytest.mark.parametrize("ground", ["l1", "l2", "l3"])
def test_batch_matches_scalar_lattice(ground):
    rng = np.random.default_rng(7)
    pts = np.array([[p, q] for p in range(4) for q in range(4)], dtype=float)
    cost = ground_distance_matrix(pts.ravel(), dimension=2, ground=ground)
    W = _sparse_hists(rng, 300, 16)
    li = rng.integers(0, 300, size=3000)
    ri = rng.integers(0, 300, size=3000)
    batch = emd_exact_pairs(W, cost, li, ri)
    scal = np.array([emd_exact(W[l], W[r], cost) for l, r in zip(li, ri)])
    np.testing.assert_allclose(batch, scal, atol=1e-9)


def test_batch_matches_scalar_dense_and_arbitrary():
    rng = np.random.default_rng(11)
    # dense rows, one big class
    pts = rng.uniform(0, 4, size=(9, 2))
    cost = ground_distance_matrix(pts.ravel(), dimension=2, ground="l2")
    W = rng.uniform(0.01, 1, size=(150, 9))
    W = W / W.sum(1, keepdims=True)
    li = rng.integers(0, 150, size=1000)
    ri = rng.integers(0, 150, size=1000)
    np.testing.assert_allclose(
        emd_exact_pairs(W, cost, li, ri),
        [emd_exact(W[l], W[r], cost) for l, r in zip(li, ri)],
        atol=1e-9,
    )
    # arbitrary (non-Minkowski) cost matrix
    C = rng.uniform(0.1, 2.0, size=(12, 12))
    np.fill_diagonal(C, 0.0)
    W2 = _sparse_hists(rng, 120, 12)
    li2 = rng.integers(0, 120, size=1000)
    ri2 = rng.integers(0, 120, size=1000)
    np.testing.assert_allclose(
        emd_exact_pairs(W2, C, li2, ri2),
        [emd_exact(W2[l], W2[r], C) for l, r in zip(li2, ri2)],
        atol=1e-9,
    )


def test_batch_degenerate_point_masses_and_identical():
    cost = ground_distance_matrix(np.arange(8.0), dimension=1, ground="l2")
    W = np.zeros((5, 8))
    W[0, 3] = 1.0       # point mass
    W[1, 3] = 1.0       # identical point mass -> emd 0
    W[2, :4] = 0.25
    W[3, 4:] = 0.25
    W[4, 7] = 1.0
    li = np.array([0, 0, 2, 1, 0, 2])
    ri = np.array([1, 2, 3, 3, 4, 2])
    batch = emd_exact_pairs(W, cost, li, ri)
    scal = np.array([emd_exact(W[l], W[r], cost) for l, r in zip(li, ri)])
    np.testing.assert_allclose(batch, scal, atol=1e-12)
    assert batch[0] == 0.0          # identical rows
    assert batch[4] == pytest.approx(4.0)  # point mass 3 -> 7


def test_single_support_closed_forms():
    # m == 1 and n == 1 skip the simplex entirely
    rng = np.random.default_rng(3)
    C = rng.uniform(0.5, 3.0, size=(64, 6, 4))
    A1 = np.ones((64, 1))
    B = rng.uniform(0.1, 1, size=(64, 4))
    out = emd_exact_batch(A1, B, C[:, :1, :])
    expect = (B / B.sum(1, keepdims=True) * C[:, 0, :]).sum(1)
    np.testing.assert_allclose(out, expect, atol=1e-12)


def test_small_class_scalar_fallback_agrees():
    # fewer pairs than MIN_BATCH -> scalar path; result must be identical
    rng = np.random.default_rng(5)
    pts = np.arange(10.0)
    cost = ground_distance_matrix(pts, dimension=1, ground="l2")
    W = _sparse_hists(rng, 40, 10, lo=3, hi=4)  # one class, tiny
    li = rng.integers(0, 40, size=MIN_BATCH - 1)
    ri = rng.integers(0, 40, size=MIN_BATCH - 1)
    np.testing.assert_allclose(
        emd_exact_pairs(W, cost, li, ri),
        [emd_exact(W[l], W[r], cost) for l, r in zip(li, ri)],
        atol=1e-9,
    )


def test_memo_wrapper_dedups_group_pairs():
    rng = np.random.default_rng(9)
    pts = np.array([[p, q] for p in range(3) for q in range(3)], dtype=float)
    cost = ground_distance_matrix(pts.ravel(), dimension=2, ground="l2")
    base = _sparse_hists(rng, 30, 9)
    W = base[rng.integers(0, 30, size=200)]  # heavy duplication
    _, grp = np.unique(W, axis=0, return_inverse=True)
    sup, cnt = support_table(W)
    memo: dict = {}
    li = rng.integers(0, 200, size=2000)
    ri = rng.integers(0, 200, size=2000)
    out = emd_exact_pairs_memo(
        W, cost, li, ri, grp, memo, sup=sup, cnt=cnt,
        n_groups=int(grp.max()) + 1,
    )
    scal = np.array([emd_exact(W[l], W[r], cost) for l, r in zip(li, ri)])
    np.testing.assert_allclose(out, scal, atol=1e-9)
    # memo holds at most one entry per distinct unordered group pair
    assert len(memo) <= 30 * 29 // 2
    # identical-group pairs short-circuit to exactly 0
    same = grp[li] == grp[ri]
    assert np.all(out[same] == 0.0)
    # second call reuses the memo (no growth for repeated pairs)
    n0 = len(memo)
    out2 = emd_exact_pairs_memo(
        W, cost, li, ri, grp, memo, sup=sup, cnt=cnt,
        n_groups=int(grp.max()) + 1,
    )
    assert len(memo) == n0
    np.testing.assert_array_equal(out, out2)


def test_max_batch_chunking_agrees():
    """A single support-shape class larger than MAX_BATCH splits across
    chunked stacked solves; results must equal the scalar solver."""
    from melody_join_spark.kernel import emd_batch

    rng = np.random.default_rng(17)
    pts = np.arange(6.0)
    cost = ground_distance_matrix(pts, dimension=1, ground="l2")
    W = _sparse_hists(rng, 50, 6, lo=3, hi=4)  # every row support size 3
    K = 3000
    li = rng.integers(0, 50, size=K)
    ri = rng.integers(0, 50, size=K)
    import unittest.mock as mock

    with mock.patch.object(emd_batch, "MAX_BATCH", 1024):
        batch = emd_batch.emd_exact_pairs(W, cost, li, ri)
    sub = rng.choice(K, size=400, replace=False)
    scal = [emd_exact(W[li[k]], W[ri[k]], cost) for k in sub]
    np.testing.assert_allclose(batch[sub], scal, atol=1e-9)


def test_empty_and_zero_support_pairs():
    cost = ground_distance_matrix(np.arange(4.0), dimension=1, ground="l2")
    W = np.zeros((3, 4))
    W[0, 1] = 1.0
    # empty index arrays
    out = emd_exact_pairs(W, cost, np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert out.size == 0
    # zero-support rows: EMD defined as 0 (matches scalar emd_exact)
    out = emd_exact_pairs(W, cost, np.array([0, 1]), np.array([2, 2]))
    np.testing.assert_array_equal(out, [0.0, 0.0])
    assert emd_exact(W[0], W[2], cost) == 0.0
