"""Ground-distance parity (DistanceType LONE/LTWO/LTHREE/ARBITRARY,
DistanceUtil.java:440-474): every join strategy must agree with the
brute-force oracle — and the kernel with the independent SSP solver — under
L1/L3 Minkowski grounds and an arbitrary explicit cost matrix."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))

from fixture_solver import ssp_emd  # noqa: E402

from melody_join_spark.kernel import normalize  # noqa: E402
from melody_join_spark.kernel.emd import emd_exact  # noqa: E402
from melody_join_spark.kernel.ground import ground_distance_matrix  # noqa: E402
from melody_join_spark.operators.emd_join_nd import (  # noqa: E402
    emd_join_nd,
)


def _lattice(g=3):
    return np.array(
        [[i, j] for i in range(g) for j in range(g)], dtype=np.float64
    )


@pytest.mark.parametrize("ground", ["l1", "l3"])
def test_kernel_matches_ssp_on_minkowski(ground):
    pts = _lattice()
    C = ground_distance_matrix(pts.ravel(), dimension=2, ground=ground)
    rng = np.random.default_rng(3)
    for _ in range(150):
        a = np.zeros(9)
        b = np.zeros(9)
        for i in rng.choice(9, rng.integers(2, 5), replace=False):
            a[i] = rng.integers(1, 9)
        for i in rng.choice(9, rng.integers(2, 5), replace=False):
            b[i] = rng.integers(1, 9)
        e1 = emd_exact(normalize(a[None])[0], normalize(b[None])[0], C)
        e2 = ssp_emd(a, b, C)
        assert abs(e1 - e2) < 1e-9


@pytest.fixture(scope="module")
def hist_df(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        w = np.zeros(9)
        for j in rng.choice(9, rng.integers(2, 6), replace=False):
            w[j] = float(rng.integers(1, 9))
        rows.append((i, w.tolist()))
    return spark.createDataFrame(rows, "id long, w array<double>")


def _pairs(df):
    return {(r.rid, r.sid): r.emd for r in df.collect()}


@pytest.mark.parametrize("ground", ["l1", "l3"])
def test_grid_matches_bruteforce_minkowski(spark, hist_df, ground):
    pts = _lattice()
    theta = 0.9
    got = _pairs(
        emd_join_nd(hist_df, pts, theta, strategy="grid", grid=3, ground=ground)
    )
    exp = _pairs(
        emd_join_nd(hist_df, pts, theta, strategy="bruteforce", ground=ground)
    )
    assert set(got) == set(exp) and len(exp) > 0
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9


@pytest.mark.parametrize("ground", ["l1", "l3"])
def test_pivot_matches_bruteforce_minkowski(spark, hist_df, ground):
    pts = _lattice()
    theta = 0.9
    got = _pairs(
        emd_join_nd(hist_df, pts, theta, strategy="pivot", ground=ground)
    )
    exp = _pairs(
        emd_join_nd(hist_df, pts, theta, strategy="bruteforce", ground=ground)
    )
    assert set(got) == set(exp) and len(exp) > 0


def test_arbitrary_cost_matrix(spark, hist_df):
    """An explicit cost matrix (here: a metric, but the engine must not
    assume centroid geometry) runs via pivot + bruteforce and both agree
    with the kernel."""
    pts = _lattice()
    # a genuine metric that is NOT any Minkowski norm of the lattice:
    # sqrt of L1 (metric by subadditivity of sqrt)
    C = np.sqrt(ground_distance_matrix(pts.ravel(), dimension=2, ground="l1"))
    theta = 0.8
    bf = _pairs(
        emd_join_nd(hist_df, pts, theta, strategy="bruteforce", ground=C)
    )
    pv = _pairs(emd_join_nd(hist_df, pts, theta, strategy="pivot", ground=C))
    assert set(bf) == set(pv) and len(bf) > 0
    # kernel spot-check against the independent solver
    rows = {r.id: normalize(np.asarray(r.w)[None])[0] for r in hist_df.collect()}
    for (rid, sid), e in list(bf.items())[:10]:
        assert abs(e - ssp_emd(rows[rid], rows[sid], C)) < 1e-9
    # grid must refuse rather than silently produce unsound pruning
    with pytest.raises(ValueError, match="Minkowski"):
        emd_join_nd(hist_df, pts, theta, strategy="grid", ground=C).collect()


def test_pivot_refuses_non_metric_matrix(spark, hist_df):
    """The pivot plan's hyperplane windows assume the triangle inequality;
    a non-metric matrix (squared L2 here) must raise instead of silently
    dropping qualifying pairs."""
    pts = _lattice()
    C2 = ground_distance_matrix(pts.ravel(), dimension=2, ground="l2") ** 2
    with pytest.raises(ValueError, match="METRIC"):
        emd_join_nd(hist_df, pts, 0.8, strategy="pivot", ground=C2)


def test_auto_routes_non_metric_to_bruteforce(spark, monkeypatch):
    """strategy='auto' with an arbitrary matrix must pick pivot only for
    VERIFIED metrics and fall back to the sound block join otherwise.
    Routing is asserted directly (the physical joins are stubbed): the
    metric branch only engages above the small-input probe (512 rows), so
    the input is 600 rows."""
    import melody_join_spark.operators.emd_join_nd as m

    rng = np.random.default_rng(5)
    rows = []
    for i in range(600):
        w = np.zeros(9)
        for j in rng.choice(9, 3, replace=False):
            w[j] = float(rng.integers(1, 9))
        rows.append((i, w.tolist()))
    df = spark.createDataFrame(rows, "id long, w array<double>")
    pts = _lattice()
    Cm = np.sqrt(ground_distance_matrix(pts.ravel(), dimension=2, ground="l1"))
    C2 = ground_distance_matrix(pts.ravel(), dimension=2, ground="l2") ** 2

    chosen: list[str] = []
    sentinel = spark.createDataFrame([], "rid long, sid long, emd double")
    monkeypatch.setattr(
        m, "_block_bruteforce", lambda *a, **k: chosen.append("bruteforce") or sentinel
    )
    monkeypatch.setattr(
        m, "_pivot_join", lambda *a, **k: chosen.append("pivot") or sentinel
    )

    emd_join_nd(df, pts, 0.5, strategy="auto", ground=C2)
    assert chosen == ["bruteforce"]  # non-metric: pivot would be unsound
    chosen.clear()
    emd_join_nd(df, pts, 0.5, strategy="auto", ground=Cm)
    assert chosen == ["pivot"]  # verified metric: the scalable plan


@pytest.mark.parametrize("ground", ["l1", "l3"])
def test_projection_scaling_sound(ground):
    """Hoelder-scaled projected 1-D EMD must lower-bound the Minkowski EMD
    for random directions — the contraction the grid screens rely on."""
    from melody_join_spark.kernel.bounds import projection_positions

    pts = _lattice()
    C = ground_distance_matrix(pts.ravel(), dimension=2, ground=ground)
    rng = np.random.default_rng(7)
    for _ in range(60):
        v = rng.standard_normal(2)
        pos = projection_positions(pts, v, ground=ground)
        o = np.argsort(pos, kind="stable")
        a = rng.random(9)
        b = rng.random(9)
        an, bn = a / a.sum(), b / b.sum()
        proj_1d = float(
            np.abs(np.cumsum(an[o] - bn[o]))[:-1] @ np.diff(pos[o])
        )
        exact = emd_exact(an, bn, C)
        assert proj_1d <= exact + 1e-9
