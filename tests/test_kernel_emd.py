"""Kernel unit tests: exact EMD solver + 1-D closed forms.

Test strategy per SURVEY.md §5: exact EMD == 1-D closed form on 1-D bins;
golden fixture from the reference's embedded main()
(/root/reference/src/com/iojin/melody/bsp/BaselineBSP.java:461-467).
"""

import numpy as np
import pytest

from melody_join_spark.kernel import (
    emd_1d,
    emd_1d_pairs,
    emd_exact,
    emd_exact_with_duals,
    ground_distance_matrix,
    normalize,
    prefix_cdf,
)
from tests.golden import GOLDEN_A, GOLDEN_B, GOLDEN_BINS, GOLDEN_EMD

RNG = np.random.default_rng(42)


def test_golden_fixture():
    """Golden 30-bin d=3 pair embedded in the reference's BaselineBSP.main."""
    cost = ground_distance_matrix(GOLDEN_BINS, 3, "l2")
    val = emd_exact(GOLDEN_A, GOLDEN_B, cost)
    assert val == pytest.approx(GOLDEN_EMD, abs=1e-6)


def test_normalize_zero_sum_guard():
    # parity: HistUtil.normalizeArray zero-sum guard (HistUtil.java:524)
    z = np.zeros(5)
    assert normalize(z).sum() == 0.0
    w = normalize(np.array([1.0, 3.0]))
    assert w.sum() == pytest.approx(1.0)


@pytest.mark.parametrize("trial", range(25))
def test_exact_matches_1d_closed_form(trial):
    rng = np.random.default_rng(100 + trial)
    B = int(rng.integers(2, 24))
    a = normalize(rng.random(B))
    b = normalize(rng.random(B))
    cost = ground_distance_matrix(np.arange(B, dtype=float), 1, "l2")
    assert emd_exact(a, b, cost) == pytest.approx(emd_1d(a, b), abs=1e-9)


@pytest.mark.parametrize("trial", range(25))
def test_exact_matches_1d_sparse(trial):
    rng = np.random.default_rng(200 + trial)
    B = int(rng.integers(3, 24))
    a = rng.random(B) * (rng.random(B) < 0.35)
    b = rng.random(B) * (rng.random(B) < 0.35)
    if a.sum() == 0 or b.sum() == 0:
        pytest.skip("degenerate zero histogram")
    a, b = normalize(a), normalize(b)
    cost = ground_distance_matrix(np.arange(B, dtype=float), 1, "l2")
    assert emd_exact(a, b, cost) == pytest.approx(emd_1d(a, b), abs=1e-9)


def test_identity_and_symmetry():
    cost = ground_distance_matrix(GOLDEN_BINS, 3, "l2")
    a = normalize(GOLDEN_A)
    b = normalize(GOLDEN_B)
    assert emd_exact(a, a, cost) == pytest.approx(0.0, abs=1e-9)
    assert emd_exact(a, b, cost) == pytest.approx(emd_exact(b, a, cost), abs=1e-9)


def test_dual_potentials_feasible_and_tight():
    cost = ground_distance_matrix(GOLDEN_BINS, 3, "l2")
    val, u, v = emd_exact_with_duals(GOLDEN_A, GOLDEN_B, cost)
    red = cost - u[:, None] - v[None, :]
    assert red.min() >= -1e-8  # dual feasible everywhere
    obj = u @ normalize(GOLDEN_A) + v @ normalize(GOLDEN_B)
    assert obj == pytest.approx(val, abs=1e-6)  # strong duality


def test_emd_1d_pairs_vectorized():
    rng = np.random.default_rng(7)
    W = rng.random((10, 8))
    W = W / W.sum(axis=1, keepdims=True)
    cdf = prefix_cdf(W)
    li = np.array([0, 1, 2, 3])
    ri = np.array([4, 5, 6, 7])
    got = emd_1d_pairs(cdf, li, ri)
    for k in range(4):
        assert got[k] == pytest.approx(emd_1d(W[li[k]], W[ri[k]]), abs=1e-12)
    # non-uniform positions
    pos = np.sort(rng.random(8)) * 10
    got2 = emd_1d_pairs(cdf, li, ri, positions=pos)
    for k in range(4):
        assert got2[k] == pytest.approx(emd_1d(W[li[k]], W[ri[k]], pos), abs=1e-12)


def test_l1_l3_and_custom_ground():
    B = 6
    bins = np.arange(B * 2, dtype=float)  # d=2
    a = normalize(RNG.random(B))
    b = normalize(RNG.random(B))
    for g in ("l1", "l2", "l3"):
        cost = ground_distance_matrix(bins, 2, g)
        v = emd_exact(a, b, cost)
        assert v >= -1e-12
    custom = np.abs(np.subtract.outer(np.arange(B), np.arange(B))).astype(float) * 2
    assert emd_exact(a, b, ground_distance_matrix(bins, 2, custom)) == pytest.approx(
        2 * emd_1d(a, b), abs=1e-9
    )
