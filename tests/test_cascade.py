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
