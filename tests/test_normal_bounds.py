"""Normal-approximation bounds: the lower-bound invariant chain.

For every random pair: cell_normal_bound <= normal_bound <= projection
bound (= 1-D EMD on projected positions) <= exact EMD.  The reference
eyeballs exactly this with Tester.testFramework ratio prints
(utils/Tester.java:76-408); here it is a property test.
"""

import numpy as np
import pytest

from melody_join_spark.kernel import (
    emd_1d,
    emd_exact,
    ground_distance_matrix,
    normalize,
    projection_positions,
)
from melody_join_spark.kernel.normal import (
    cdf_approx_error,
    cell_normal_bound,
    fit_normal,
    hough,
    normal_bound_pairs,
    normal_w1,
)


@pytest.mark.parametrize("trial", range(10))
def test_normal_bound_leq_projection_leq_exact(trial):
    rng = np.random.default_rng(300 + trial)
    B, d, R = 12, 2, 24
    bins = rng.random((B, d)) * 4
    W = normalize(rng.random((R, B)) * (rng.random((R, B)) < 0.6) + 1e-9)
    vec = rng.standard_normal(d)
    pos = projection_positions(bins, vec)
    order = np.argsort(pos, kind="stable")
    ps, Ws = pos[order], W[:, order]

    mu, sigma = fit_normal(Ws, ps)
    err = cdf_approx_error(Ws, ps, mu, sigma)
    cost = ground_distance_matrix(bins, dimension=d)

    li, ri = np.triu_indices(R, k=1)
    nb = normal_bound_pairs(mu, sigma, err, li, ri)
    for k in range(li.size):
        a, b = li[k], ri[k]
        proj = emd_1d(Ws[a], Ws[b], ps)
        assert nb[k] <= proj + 1e-9, f"normal bound {nb[k]} > projection {proj}"
    # spot exact-EMD dominance on a subset (LPs are pricier)
    for k in range(0, li.size, 17):
        a, b = li[k], ri[k]
        ex = emd_exact(W[a], W[b], cost)
        assert nb[k] <= ex + 1e-9


def test_normal_w1_properties():
    # identical normals -> 0; sigma equal -> |mu diff|; symmetry
    assert normal_w1(1.0, 2.0, 1.0, 2.0) == pytest.approx(0.0, abs=1e-12)
    assert float(normal_w1(0.0, 1.5, 3.0, 1.5)) == pytest.approx(3.0, abs=1e-12)
    a = float(normal_w1(0.0, 1.0, 2.0, 3.0))
    b = float(normal_w1(2.0, 3.0, 0.0, 1.0))
    assert a == pytest.approx(b, abs=1e-12)
    # Monte-Carlo cross-check of E|delta + s Z|
    rng = np.random.default_rng(0)
    z = rng.standard_normal(2_000_000)
    mc = np.abs(1.0 + 2.0 * z).mean()
    assert float(normal_w1(0.0, 1.0, 1.0, 3.0)) == pytest.approx(mc, rel=2e-3)


def test_cdf_approx_error_exact_for_normal_like():
    # a near-degenerate histogram (all mass at one bin): error equals
    # ∫|step - Phi| which is strictly positive and finite
    pos = np.arange(8, dtype=np.float64)
    W = np.zeros((1, 8))
    W[0, 3] = 1.0
    err = cdf_approx_error(W, pos)
    assert err[0] > 0
    assert np.isfinite(err[0])


def test_hough_roundtrip():
    mu = np.array([1.0, -2.0])
    sigma = np.array([0.5, 2.0])
    m, b = hough(mu, sigma)
    np.testing.assert_allclose(1.0 / m, sigma)
    np.testing.assert_allclose(-b / m, mu)


@pytest.mark.parametrize("trial", range(6))
def test_cell_bound_leq_pair_bound(trial):
    """cell bound over a bbox <= the pair bound against any member of it."""
    rng = np.random.default_rng(40 + trial)
    mu_r, sigma_r, err_r = rng.normal(), abs(rng.normal()) + 0.1, abs(rng.normal()) * 0.05
    lo, hi = sorted(rng.normal(size=2))
    slo, shi = sorted(abs(rng.normal(size=2)) + 0.05)
    errc = abs(rng.normal()) * 0.05
    cb = float(
        cell_normal_bound(mu_r, sigma_r, err_r, lo, hi, slo, shi, errc)
    )
    for _ in range(200):
        mu_c = rng.uniform(lo, hi)
        sigma_c = rng.uniform(slo, shi)
        err_c = rng.uniform(0, errc)
        pair = max(
            float(normal_w1(mu_r, sigma_r, mu_c, sigma_c)) - err_r - err_c, 0.0
        )
        assert cb <= pair + 1e-9
