"""Filter-cascade correctness: cascade output == brute-force exact filter."""

import numpy as np

from melody_join_spark.kernel import (
    DualPotentials,
    EmdCascade,
    ReductionMap,
    emd_exact,
    ground_distance_matrix,
    projection_positions,
)
from melody_join_spark.kernel.cascade import CascadeStats


def test_cascade_matches_bruteforce():
    rng = np.random.default_rng(42)
    B, D, N = 16, 3, 30
    bin_pts = rng.random((B, D)) * 3
    cost = ground_distance_matrix(bin_pts.ravel(), D, "l2")
    W = rng.random((N, B))
    W = W / W.sum(axis=1, keepdims=True)

    vecs = [rng.standard_normal(D) for _ in range(3)]
    duals = [
        DualPotentials.from_seed_pair(W[int(i)], W[int(j)], cost)
        for i, j in rng.integers(0, N, size=(3, 2))
    ]
    cascade = EmdCascade(
        weights=W,
        cost=cost,
        bin_points=bin_pts,
        proj_positions=[projection_positions(bin_pts, v) for v in vecs],
        duals=duals,
        reductions=[ReductionMap(cost, reduced=8, seed=s) for s in (1, 2)],
    )

    li, ri = np.triu_indices(N, k=1)
    theta = 0.25
    stats = CascadeStats()
    cl, cr, ce = cascade.run(li, ri, theta, stats=stats, slack=0.0)
    got = {(int(a), int(b)) for a, b in zip(cl, cr)}

    want = {}
    for a, b in zip(li, ri):
        e = emd_exact(W[a], W[b], cost)
        if e <= theta:
            want[(int(a), int(b))] = e
    assert got == set(want)
    for a, b, e in zip(cl, cr, ce):
        assert abs(want[(int(a), int(b))] - e) < 1e-9
    # the cascade must actually prune (fewer exact evals than candidates)
    assert stats.exact_evaluated < stats.candidates
    assert stats.candidates == li.size


def test_cascade_uses_precomputed_metric_verdict(monkeypatch):
    """ADVICE round 9: the O(B^3) metric check must NOT re-run per cascade
    construction when the driver already shipped the verdict."""
    import melody_join_spark.kernel.cascade as casc_mod

    rng = np.random.default_rng(7)
    B, D, N = 12, 2, 8
    bin_pts = rng.random((B, D))
    # arbitrary metric cost (sqrt-L1), rubner_ord=None path
    cost = np.sqrt(np.abs(bin_pts[:, None, :] - bin_pts[None, :, :]).sum(axis=2))
    W = rng.random((N, B))
    W = W / W.sum(axis=1, keepdims=True)

    calls = []

    def spy(C, tol=1e-12):
        calls.append(1)
        raise AssertionError("is_metric_cost must not run when verdict is shipped")

    monkeypatch.setattr(casc_mod, "is_metric_cost", spy)
    cascade = EmdCascade(
        weights=W, cost=cost, bin_points=bin_pts,
        rubner_ord=None, metric_cost=True,
    )
    assert cascade._metric_cost is True
    assert not calls
    # and the shipped verdict gates the IndMin stage exactly like the check
    cascade_off = EmdCascade(
        weights=W, cost=cost, bin_points=bin_pts,
        rubner_ord=None, metric_cost=False,
    )
    assert cascade_off._metric_cost is False


def test_build_config_ships_metric_verdict():
    from melody_join_spark.operators.emd_join_nd import build_config

    rng = np.random.default_rng(3)
    bin_pts = rng.random((10, 2))
    cfg = build_config(bin_pts, ground="l2")
    assert cfg.metric_cost is True
    # arbitrary metric matrix: verdict computed once at build time
    C = np.sqrt(np.abs(bin_pts[:, None, :] - bin_pts[None, :, :]).sum(axis=2))
    cfg2 = build_config(bin_pts, ground=C)
    assert cfg2.metric_cost is True
    # non-metric (squared euclidean) verdict is False
    C2 = ((bin_pts[:, None, :] - bin_pts[None, :, :]) ** 2).sum(axis=2)
    cfg3 = build_config(bin_pts, ground=C2)
    assert cfg3.metric_cost is False
