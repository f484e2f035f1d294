"""Normal-approximation machinery: fits, Hough transform, CDF errors, and
the normal-distribution lower bounds.

Reference parity (files under /root/reference/src/com/iojin/melody/):
- fit_normal        -> HistUtil.getNormal moment fit with the 1e-8 sigma
                       floor (utils/HistUtil.java:280-304)
- hough             -> the (m, b) = (1/sigma, -mu/sigma) point transform
                       (mr/normal/NEPreMapper.java:106-111)
- cdf_approx_error  -> the discrete-vs-normal CDF approximation error
                       machinery (HistUtil.getMinMaxError/getFullError,
                       utils/HistUtil.java:357-434), here as the EXACT
                       integral  err = ∫|F - Phi| dx  in closed form per
                       step interval (the reference tabulates interval-wise
                       min/max errors; one exact scalar serves the same
                       bound correction)
- normal_bound_pairs-> HistUtil.getNormalEmd (utils/HistUtil.java:68-116):
                       lower-bounds the projected 1-D EMD by the
                       1-Wasserstein distance between the fitted normals
                       minus both records' approximation errors
- cell_normal_bound -> Grid.getEmdBr in spirit (utils/Grid.java:884-1085):
                       a record-to-cell lower bound over a (mu, sigma) bbox;
                       the 9-direction dominance analysis is replaced by
                       interval arithmetic on two closed-form W1 minorants
                       (each sound pointwise, hence sound under min)

Math note: for two step CDFs F_a, F_b on the projected line,
    ∫|F_a - F_b| >= ∫|Phi_a - Phi_b| - ∫|F_a - Phi_a| - ∫|F_b - Phi_b|
(triangle inequality), and ∫|Phi_a - Phi_b| between two normal CDFs is the
closed-form  W1(N_a, N_b) = E|delta + s Z| = delta(2 Phi(delta/s) - 1)
+ 2 s phi(delta/s)  with delta = |mu_a - mu_b|, s = |sigma_a - sigma_b|
(|.|-symmetric in Z).  Everything is numpy + math.erf (no scipy).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "fit_normal",
    "hough",
    "normal_w1",
    "cdf_approx_error",
    "normal_bound_pairs",
    "cell_normal_bound",
]

SIGMA_FLOOR = 1e-8  # HistUtil.java:292-302 sigma floor for degenerate fits
_SQRT2 = math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)
_E_ABS_Z = math.sqrt(2.0 / math.pi)  # E|Z| for Z ~ N(0,1)

_erf = np.vectorize(math.erf, otypes=[np.float64])


def _phi(z):
    """Standard normal pdf (vectorized)."""
    return _INV_SQRT2PI * np.exp(-0.5 * np.square(z))


def _Phi(z):
    """Standard normal cdf (vectorized)."""
    return 0.5 * (1.0 + _erf(np.asarray(z, dtype=np.float64) / _SQRT2))


def fit_normal(weights: np.ndarray, positions: np.ndarray):
    """Moment-matched normal fit per record: mu = sum w x, sigma =
    sqrt(E[x^2] - mu^2) (floored).  ``weights`` (R, B) normalized rows,
    ``positions`` (B,).  Returns (mu (R,), sigma (R,))."""
    W = np.atleast_2d(np.asarray(weights, dtype=np.float64))
    x = np.asarray(positions, dtype=np.float64)
    mu = W @ x
    ex2 = W @ np.square(x)
    var = np.maximum(ex2 - np.square(mu), 0.0)
    sigma = np.maximum(np.sqrt(var), SIGMA_FLOOR)
    return mu, sigma


def hough(mu: np.ndarray, sigma: np.ndarray):
    """(m, b) = (1/sigma, -mu/sigma) — the reference's Hough-plane point
    (NEPreMapper.java:106-111); the quantile grid of the MELODY plan lives
    in this plane."""
    m = 1.0 / np.asarray(sigma, dtype=np.float64)
    b = -np.asarray(mu, dtype=np.float64) * m
    return m, b


def normal_w1(mu_a, sigma_a, mu_b, sigma_b):
    """Closed-form 1-Wasserstein distance between two univariate normals
    (= area between their CDFs).  Vectorized over arrays."""
    d = np.abs(np.asarray(mu_a, dtype=np.float64) - np.asarray(mu_b, dtype=np.float64))
    s = np.abs(
        np.asarray(sigma_a, dtype=np.float64) - np.asarray(sigma_b, dtype=np.float64)
    )
    out = np.where(s < 1e-300, d, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(s > 0, d / np.where(s > 0, s, 1.0), 0.0)
        val = d * (2.0 * _Phi(z) - 1.0) + 2.0 * s * _phi(z)
    return np.where(s < 1e-300, out, val)


def _int_Phi(x, mu, sigma):
    """∫_{-inf}^{x} Phi((t-mu)/sigma) dt  =  (x-mu) Phi(z) + sigma phi(z)."""
    z = (x - mu) / sigma
    return (x - mu) * _Phi(z) + sigma * _phi(z)


def cdf_approx_error(weights: np.ndarray, positions: np.ndarray, mu=None, sigma=None):
    """Exact  err_r = ∫ |F_r - Phi_r| dx  per record (R,) — the normal-
    approximation error that corrects the normal bounds.

    Piecewise closed form: on each step interval the discrete CDF is a
    constant c, and ∫|c - Phi| splits at the crossing x* where Phi = c
    (x* = mu + sigma Probit(c)); tails integrate Phi and 1-Phi exactly.
    """
    W = np.atleast_2d(np.asarray(weights, dtype=np.float64))
    x = np.asarray(positions, dtype=np.float64)
    order = np.argsort(x, kind="stable")
    xs = x[order]
    W = W[:, order]
    if mu is None or sigma is None:
        mu, sigma = fit_normal(W, xs)
    R, B = W.shape
    cdf = np.cumsum(W, axis=1)  # (R, B); F = cdf[:, k] on [xs[k], xs[k+1])
    err = np.zeros(R)
    # left tail: F = 0 on (-inf, xs[0]) -> ∫ Phi
    err += _int_Phi(xs[0], mu, sigma)
    # right tail: F = 1 on [xs[-1], inf) -> ∫ (1 - Phi) = sigma*phi(z)+ (mu-x)(1-Phi(z))
    zB = (xs[-1] - mu) / sigma
    err += sigma * _phi(zB) + (mu - xs[-1]) * (1.0 - _Phi(zB))
    # steps
    for k in range(B - 1):
        x0, x1 = xs[k], xs[k + 1]
        if x1 <= x0:
            continue
        c = cdf[:, k]
        # ∫_{x0}^{x1} |c - Phi| dx with crossing at x* = mu + sigma*Probit(c)
        # Probit via binary-free closed form: Phi monotone -> clamp x* into
        # [x0, x1]; outside the interval the integrand keeps one sign.
        # Solve Phi((x*-mu)/sigma) = c  ->  z* = Probit(c)
        zc = _probit(np.clip(c, 1e-16, 1.0 - 1e-16))
        xstar = np.clip(mu + sigma * zc, x0, x1)
        # area where Phi < c (left of x*): ∫ (c - Phi); right: ∫ (Phi - c)
        left = c * (xstar - x0) - (_int_Phi(xstar, mu, sigma) - _int_Phi(x0, mu, sigma))
        right = (_int_Phi(x1, mu, sigma) - _int_Phi(xstar, mu, sigma)) - c * (x1 - xstar)
        err += np.abs(left) + np.abs(right)
    return err


def _probit(p):
    """Inverse standard normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — far below the bound slack it feeds)."""
    p = np.asarray(p, dtype=np.float64)
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    out = np.empty_like(p)
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    return out


def normal_bound_pairs(mu, sigma, err, left_idx, right_idx):
    """Vectorized normal lower bound of the projected 1-D EMD for pairs:
    max(0, W1(N_l, N_r) - err_l - err_r).  O(1) per pair given the
    precomputed per-record (mu, sigma, err) columns — cheaper than the O(B)
    projection bound it approximates (HistUtil.getNormalEmd semantics)."""
    li = np.asarray(left_idx)
    ri = np.asarray(right_idx)
    w1 = normal_w1(mu[li], sigma[li], mu[ri], sigma[ri])
    return np.maximum(w1 - err[li] - err[ri], 0.0)


def cell_normal_bound(
    mu_r, sigma_r, err_r, mu_lo, mu_hi, sigma_lo, sigma_hi, err_cell_max
):
    """Record-to-cell lower bound over a (mu, sigma) bbox (Grid.getEmdBr
    capability, utils/Grid.java:884-1085): a sound lower bound of
    min over (mu_c, sigma_c) in the box of the normal pair bound.

    Two pointwise W1 minorants, interval-minimized independently:
      W1 >= |mu_r - mu_c|                  >= dist(mu_r, [mu_lo, mu_hi])
      W1 >= E|Z| |sigma_r-sigma_c| - |mu_r-mu_c|
                                           >= E|Z| dist_sigma - maxdist_mu
    (max of sound lower bounds is sound).  Errors subtract as usual."""
    dmu = np.maximum(np.maximum(mu_lo - mu_r, mu_r - mu_hi), 0.0)
    max_dmu = np.maximum(np.abs(mu_r - mu_lo), np.abs(mu_r - mu_hi))
    dsig = np.maximum(np.maximum(sigma_lo - sigma_r, sigma_r - sigma_hi), 0.0)
    core = np.maximum(dmu, _E_ABS_Z * dsig - max_dmu)
    return np.maximum(core - err_r - err_cell_max, 0.0)
