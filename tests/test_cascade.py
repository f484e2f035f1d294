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


def test_normal_stage_lazy_gate_fit_and_probe_disable():
    """Round-11 normal-stage laziness: (a) blocks below NORMAL_GATE *
    rows never pay the (mu, sigma, err) fit; (b) big blocks fit and run
    the stage; (c) a probe block that prunes nothing self-disables the
    stage after fitting only the FIRST projection.  In every case the
    survivor set equals the brute-force exact filter — skipping a sound
    lower-bound stage must never change the output."""
    rng = np.random.default_rng(11)
    B, D, N = 10, 2, 16
    bin_pts = rng.random((B, D))
    cost = ground_distance_matrix(bin_pts.ravel(), D, "l2")
    W = rng.random((N, B))
    W = W / W.sum(axis=1, keepdims=True)
    vecs = [rng.standard_normal(D) for _ in range(2)]
    proj = [projection_positions(bin_pts, v) for v in vecs]

    li, ri = np.triu_indices(N, k=1)  # 120 pairs
    exact = np.array([emd_exact(W[a], W[b], cost) for a, b in zip(li, ri)])
    theta = float(np.median(exact))  # some survive, some pruned
    want = {
        (int(a), int(b))
        for a, b, e in zip(li, ri, exact)
        if e <= theta
    }

    def fresh():
        return EmdCascade(
            weights=W, cost=cost, bin_points=bin_pts, proj_positions=proj
        )

    # (a) small block: 120 < NORMAL_GATE * 16 rows -> fit skipped entirely
    casc = fresh()
    cl, cr, _ = casc.run(li, ri, theta, slack=0.0)
    assert casc.normal_stats is None
    assert {(int(a), int(b)) for a, b in zip(cl, cr)} == want

    # (b) big block (duplicated pairs): gate passes -> stats fitted for
    # ALL projections (probe covers the whole block, so no disable), and
    # the survivor SET is unchanged
    casc2 = fresh()
    rep = max(1, (EmdCascade.NORMAL_GATE * N) // li.size + 1)
    cl2, cr2, _ = casc2.run(np.tile(li, rep), np.tile(ri, rep), theta, slack=0.0)
    assert casc2.normal_stats is not None
    assert len(casc2.normal_stats) == len(proj)
    assert {(int(a), int(b)) for a, b in zip(cl2, cr2)} == want

    # (c) identical rows: every bound is 0, the probe prunes nothing on a
    # block bigger than the probe window -> the stage self-disables having
    # fitted only projection 0; all pairs survive (exact EMD = 0)
    W_id = np.tile(W[:1], (32, 1))
    casc3 = EmdCascade(
        weights=W_id, cost=cost, bin_points=bin_pts, proj_positions=proj
    )
    k = 16384
    li3 = rng.integers(0, 32, size=k)
    ri3 = rng.integers(0, 32, size=k)
    st = CascadeStats()
    cl3, _, ce3 = casc3.run(li3, ri3, theta, stats=st, slack=0.0)
    assert casc3._normal_on is False
    assert casc3.normal_stats is not None and len(casc3.normal_stats) == 1
    assert st.pruned_normal == 0
    assert cl3.size == k and np.all(ce3 == 0.0)
