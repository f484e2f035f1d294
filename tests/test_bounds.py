"""Bound-invariant property tests (FIXTURES.md §6).

For random histogram pairs: every lower bound <= exact EMD + 1e-9; greedy
flow upper bound >= exact EMD - 1e-9.  This is the invariant the reference's
manual harness spot-checks (utils/Tester.java:76-408, 445-478).
"""

import numpy as np
import pytest

from melody_join_spark.kernel import (
    DualPotentials,
    ReductionMap,
    centroids,
    dual_bound_pairs,
    emd_exact,
    greedy_flow_upper,
    ground_distance_matrix,
    indmin_bound,
    indmin_bound_pairs,
    is_metric_cost,
    normalize,
    projection_bound_pairs,
    projection_positions,
    reduction_bound,
    rubner_bound,
    rubner_bound_to_bbox,
    bins_matrix,
)

B, D = 20, 3
RNG = np.random.default_rng(42)
BIN_PTS = RNG.random((B, D)) * 4
COST = ground_distance_matrix(BIN_PTS.ravel(), D, "l2")
N = 40
W = RNG.random((N, B))
W = W / W.sum(axis=1, keepdims=True)
EXACT = np.array(
    [[emd_exact(W[i], W[j], COST) for j in range(N)] for i in range(8)]
)
LI, RI = np.meshgrid(np.arange(8), np.arange(N), indexing="ij")
LI, RI = LI.ravel(), RI.ravel()
FLAT_EXACT = EXACT.ravel()
TOL = 1e-9


def test_projection_bound_is_lower_bound():
    for seed in range(3):
        vec = np.random.default_rng(seed).standard_normal(D)
        pos = projection_positions(BIN_PTS, vec)
        lb = projection_bound_pairs(W, pos, LI, RI)
        assert (lb <= FLAT_EXACT + TOL).all(), (lb - FLAT_EXACT).max()


def test_rubner_bound_is_lower_bound():
    c = centroids(W, BIN_PTS)
    lb = rubner_bound(c[LI], c[RI])
    assert (lb <= FLAT_EXACT + TOL).all()


def test_rubner_bbox_bound():
    c = centroids(W, BIN_PTS)
    group = c[10:30]
    lo, hi = group.min(axis=0), group.max(axis=0)
    for i in range(8):
        cell_lb = rubner_bound_to_bbox(c[i : i + 1], lo, hi)[0]
        # point-to-bbox <= point-to-any-member <= EMD to any member in cell
        for j in range(10, 30):
            assert cell_lb <= EXACT[i, j] + TOL


def test_dual_bound_is_lower_bound():
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        i, j = rng.integers(0, N, 2)
        dp = DualPotentials.from_seed_pair(W[i], W[j], COST)
        key, ckey = dp.keys(W)
        lb = dual_bound_pairs(key, ckey, LI, RI)
        assert (lb <= FLAT_EXACT + 1e-7).all(), (lb - FLAT_EXACT).max()


def test_reduction_bound_is_lower_bound():
    for seed in (1, 2):
        rmap = ReductionMap(COST, reduced=8, seed=seed)
        rw = rmap.reduce_weights(W)
        for k in range(0, LI.size, 17):
            lb = reduction_bound(rmap, rw[LI[k]], rw[RI[k]])
            assert lb <= FLAT_EXACT[k] + 1e-7


def test_indmin_bound_is_lower_bound():
    for k in range(0, LI.size, 13):
        lb = indmin_bound(W[LI[k]], W[RI[k]], COST)
        assert lb <= FLAT_EXACT[k] + TOL


def test_indmin_bound_pairs_matches_scalar():
    lb = indmin_bound_pairs(W, COST, LI, RI)
    for k in range(LI.size):
        assert lb[k] == pytest.approx(indmin_bound(W[LI[k]], W[RI[k]], COST), abs=1e-12)


def test_indmin_bound_pairs_identical_rows_zero():
    li = np.array([0, 1, 2])
    lb = indmin_bound_pairs(W, COST, li, li)
    assert (lb == 0.0).all()


def test_indmin_bound_pairs_one_sided_net_flow_zero():
    # ADVICE round 9: rows equal except one bin nudged by an ulp have
    # surplus bins but NO deficit bins (or vice versa) after the float
    # subtraction — min-to-deficit is +inf and pos * inf used to propagate
    # an inf "bound" that falsely pruned the near-duplicate pair.  The
    # scalar form returns 0.0; the vectorized form must match.
    a = W[0]
    b = a.copy()
    b[3] = np.nextafter(b[3], np.inf)  # b - a > 0 at bin 3 only
    Wp = np.vstack([a, b])
    li = np.array([0, 1])
    ri = np.array([1, 0])
    for C in (COST, np.sqrt(np.abs(BIN_PTS[:, None, :] - BIN_PTS[None, :, :]).sum(axis=2))):
        lb = indmin_bound_pairs(Wp, C, li, ri)
        assert np.isfinite(lb).all()
        for k in range(li.size):
            sc = indmin_bound(Wp[li[k]], Wp[ri[k]], C)
            assert lb[k] == pytest.approx(sc, abs=1e-12)
        assert (lb == 0.0).all()


def test_indmin_bound_pairs_arbitrary_metric_sound():
    # sqrt of an L1 lattice distance: a genuine metric that is no Minkowski
    # norm — the exact gate the pivot join's arbitrary-cost path uses
    diff = np.abs(BIN_PTS[:, None, :] - BIN_PTS[None, :, :])
    C = np.sqrt(diff.sum(axis=2))
    assert is_metric_cost(C)
    lb = indmin_bound_pairs(W, C, LI, RI)
    for k in range(0, LI.size, 7):
        ex = emd_exact(W[LI[k]], W[RI[k]], C)
        assert lb[k] <= ex + TOL


def test_is_metric_cost_rejects_non_metrics():
    # squared euclidean violates the triangle inequality
    diff = BIN_PTS[:, None, :] - BIN_PTS[None, :, :]
    C2 = (diff**2).sum(axis=2)
    assert not is_metric_cost(C2)
    # asymmetric
    C = COST.copy()
    C[0, 1] += 1.0
    assert not is_metric_cost(C)
    # nonzero diagonal
    C = COST.copy()
    C[3, 3] = 0.5
    assert not is_metric_cost(C)
    # metric ones pass
    assert is_metric_cost(COST)
    assert is_metric_cost(ground_distance_matrix(BIN_PTS.ravel(), D, "l1"))


def test_greedy_flow_is_upper_bound():
    for k in range(0, LI.size, 13):
        ub = greedy_flow_upper(W[LI[k]], W[RI[k]], COST)
        assert ub >= FLAT_EXACT[k] - TOL


def test_bins_matrix_shape():
    assert bins_matrix(np.arange(12.0), 3).shape == (4, 3)
    with pytest.raises(ValueError):
        bins_matrix(np.arange(10.0), 3)
