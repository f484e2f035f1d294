"""EMD lower/upper bounds — the pruning kernel library.

Every function here is pure numpy and vectorized over *blocks of records*
wherever possible, because the Spark operators call them on Arrow batches
inside pandas UDFs.  Invariant (property-tested): every lower bound
``<= emd_exact + 1e-9``; the greedy-flow upper bound ``>= emd_exact - 1e-9``.

Reference parity map (files under /root/reference/src/com/iojin/melody/):
- projection bound  -> DistanceUtil.get1dEmd / getProjectEmd
  (utils/DistanceUtil.java:57-79, utils/HistUtil.java:118-130)
- Rubner (centroid) bound -> DistanceUtil.getRubnerEmd (utils/DistanceUtil
  .java:184-230); the 27-case point-to-bbox variant (:232-417) is replaced by
  the equivalent ``clip`` form which generalizes to any dimension.
- dual-feasibility bound -> DualBound (utils/DualBound.java:28-139); we get
  dual-feasible potentials for free from the transportation simplex instead
  of a separate LP.
- reduction bound -> ReductionBound (utils/ReductionBound.java:13-110)
- independent-minimization bound -> DistanceUtil.getIndMinEmd
  (utils/DistanceUtil.java:148-182), here in closed form over net flows.
- greedy-flow upper bound -> HistUtil.getFlowBetween (utils/HistUtil
  .java:606-639)
"""

from __future__ import annotations

import numpy as np

from .emd import emd_exact, emd_exact_with_duals, normalize

__all__ = [
    "centroids",
    "rubner_bound",
    "rubner_bound_to_bbox",
    "projection_positions",
    "projection_bound_pairs",
    "DualPotentials",
    "dual_bound_pairs",
    "ReductionMap",
    "reduction_bound",
    "indmin_bound",
    "indmin_bound_pairs",
    "is_metric_cost",
    "greedy_flow_upper",
]


# ---------------------------------------------------------------------------
# Rubner (centroid) bound
# ---------------------------------------------------------------------------

def centroids(weights: np.ndarray, bin_points: np.ndarray) -> np.ndarray:
    """(R, d) centroids of (R, B) normalized weight rows over (B, d) bins."""
    return np.asarray(weights, dtype=np.float64) @ np.asarray(bin_points, dtype=np.float64)


def rubner_bound(ca: np.ndarray, cb: np.ndarray, ord: float = 2) -> np.ndarray:
    """|| centroid(a) - centroid(b) ||  — lower-bounds EMD for Minkowski
    ground distances (Jensen's inequality).  Vectorized over rows."""
    d = np.atleast_2d(ca) - np.atleast_2d(cb)
    return np.linalg.norm(d, ord=ord, axis=1)


def rubner_bound_to_bbox(
    c: np.ndarray, lo: np.ndarray, hi: np.ndarray, ord: float = 2
) -> np.ndarray:
    """Distance from centroid(s) ``c`` (R, d) to the axis-aligned bbox
    [lo, hi] of a cell's centroids: 3-line replacement for the reference's
    27-octant case analysis (DistanceUtil.java:232-417), valid for any d
    and any Minkowski ``ord`` (the clamp point minimizes every p-norm
    coordinate-wise, so it is the p-norm-nearest box point for all p)."""
    c = np.atleast_2d(np.asarray(c, dtype=np.float64))
    clamped = np.clip(c, lo, hi)
    return np.linalg.norm(c - clamped, ord=ord, axis=1)


# ---------------------------------------------------------------------------
# Projection (1-D) bound
# ---------------------------------------------------------------------------

def projection_positions(
    bin_points: np.ndarray, vector: np.ndarray, ground: str = "l2"
) -> np.ndarray:
    """Project (B, d) bin locations onto a vector -> (B,) positions scaled
    so the projected 1-D EMD lower-bounds the ``ground``-Minkowski EMD.

    Parity: HistUtil.projectBins (utils/HistUtil.java:495-517) with
    unitArray (:532-542) — the reference normalizes to unit L2, which is
    exactly the Hoelder scaling for its L2 ground.  General Minkowski p:
    |v . (x - y)| <= ||v||_q ||x - y||_p with q = p/(p-1), so dividing the
    positions by the DUAL norm ||v||_q keeps the contraction property
    (p=1 -> q=inf, p=2 -> q=2, p=3 -> q=1.5)."""
    v = np.asarray(vector, dtype=np.float64)
    q = {"l1": np.inf, "l2": 2.0, "l3": 1.5}[ground]
    v = v / np.linalg.norm(v, ord=q)
    return np.asarray(bin_points, dtype=np.float64) @ v


def projection_bound_pairs(
    weights: np.ndarray,
    positions: np.ndarray,
    left_idx: np.ndarray,
    right_idx: np.ndarray,
) -> np.ndarray:
    """1-D EMD along projected bin positions for many pairs — a lower bound
    of the d-dimensional EMD (contraction of the L2 ground distance).

    ``weights`` (R, B) normalized; ``positions`` (B,) projected positions
    (need not be sorted — sorted internally once)."""
    order = np.argsort(positions, kind="stable")
    pos = positions[order]
    w = np.asarray(weights, dtype=np.float64)[:, order]
    cdf = np.cumsum(w, axis=1)
    dx = np.diff(pos)
    d = np.abs(cdf[left_idx] - cdf[right_idx])
    return d[:, :-1] @ dx


# ---------------------------------------------------------------------------
# Dual-feasibility bound
# ---------------------------------------------------------------------------

class DualPotentials:
    """A dual-feasible potential pair (u, v): u_i + v_j <= c_ij for all i,j.

    Obtained by exactly solving one seed pair's transportation problem (the
    simplex returns optimal — hence feasible — duals).  The reference sets
    these up with a dedicated LP per random pair (DualBound.java:28-60); the
    bound semantics are identical:  emd(A, B) >= max(u.A + v.B, u.B + v.A)
    (cost symmetry allows the swapped form, DualBound.getDualEmd:62-74).
    """

    __slots__ = ("u", "v")

    def __init__(self, u: np.ndarray, v: np.ndarray):
        self.u = np.asarray(u, dtype=np.float64)
        self.v = np.asarray(v, dtype=np.float64)

    @classmethod
    def from_seed_pair(cls, a: np.ndarray, b: np.ndarray, cost: np.ndarray) -> "DualPotentials":
        _, u, v = emd_exact_with_duals(a, b, cost)
        return cls(u, v)

    def keys(self, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-record key = w.u and counter-key = w.v (DualBound.getKey /
        getCKey, DualBound.java:76-90) — precomputable columns."""
        w = np.asarray(weights, dtype=np.float64)
        return w @ self.u, w @ self.v


def dual_bound_pairs(
    key: np.ndarray,
    ckey: np.ndarray,
    left_idx: np.ndarray,
    right_idx: np.ndarray,
) -> np.ndarray:
    """max(key[l] + ckey[r], key[r] + ckey[l]) over pair index arrays."""
    return np.maximum(key[left_idx] + ckey[right_idx], key[right_idx] + ckey[left_idx])


# ---------------------------------------------------------------------------
# Reduction (dimensionality-grouping) bound
# ---------------------------------------------------------------------------

class ReductionMap:
    """Random grouping of B bins into ``reduced`` groups; reduced ground cost
    = min member-to-member distance (ReductionBound.java:13-61).  EMD on the
    reduced histograms lower-bounds the full EMD."""

    __slots__ = ("groups", "reduced_cost", "reduced")

    def __init__(self, cost: np.ndarray, reduced: int = 8, seed: int = 42):
        B = cost.shape[0]
        rng = np.random.default_rng(seed)
        groups = rng.integers(0, reduced, size=B)
        # guarantee every group non-empty for stable reduced cost
        for g in range(min(reduced, B)):
            groups[g] = g
        self.groups = groups
        self.reduced = reduced
        rc = np.full((reduced, reduced), np.inf)
        for gi in range(reduced):
            mi = groups == gi
            if not mi.any():
                rc[gi, :] = 0.0
                rc[:, gi] = 0.0
                continue
            for gj in range(reduced):
                mj = groups == gj
                if not mj.any():
                    continue
                rc[gi, gj] = cost[np.ix_(mi, mj)].min()
        rc[~np.isfinite(rc)] = 0.0
        np.fill_diagonal(rc, 0.0)
        self.reduced_cost = rc

    def reduce_weights(self, weights: np.ndarray) -> np.ndarray:
        """(R, B) -> (R, reduced) group sums — precomputable columns."""
        w = np.asarray(weights, dtype=np.float64)
        out = np.zeros((w.shape[0], self.reduced))
        for g in range(self.reduced):
            m = self.groups == g
            if m.any():
                out[:, g] = w[:, m].sum(axis=1)
        return out


def reduction_bound(rmap: ReductionMap, ra: np.ndarray, rb: np.ndarray) -> float:
    """Exact EMD between reduced histograms (tiny LP, e.g. 8x8)."""
    return emd_exact(ra, rb, rmap.reduced_cost)


# ---------------------------------------------------------------------------
# Independent-minimization bound (closed form over net flows)
# ---------------------------------------------------------------------------

def is_metric_cost(cost: np.ndarray, tol: float = 1e-12) -> bool:
    """True when ``cost`` is a metric: symmetric, non-negative, zero
    diagonal, and triangle inequality C[i,j] <= min_k C[i,k] + C[k,j].

    O(B^3) one-time driver-side check (B is the bin count, so ~4k ops at
    B=16); compute it ONCE on the driver and ship the verdict
    (NdJoinConfig caches it — executors must not re-run this per group).
    Used to soundly enable the netted IndMin stage for ARBITRARY
    cost matrices: netting (cancelling common mass) preserves the EMD only
    when an optimal plan ships no common mass, which the zero diagonal +
    triangle inequality guarantee — exactly the precondition the pivot
    strategy already imposes (its hyperplane windows assume a metric,
    MRSimJoinHD.java:379-390 analog)."""
    C = np.asarray(cost, dtype=np.float64)
    if C.ndim != 2 or C.shape[0] != C.shape[1]:
        return False
    if (C < -tol).any():
        return False
    if np.abs(np.diag(C)).max(initial=0.0) > tol:
        return False
    if np.abs(C - C.T).max(initial=0.0) > tol:
        return False
    # running min over intermediate k keeps peak memory O(B^2) instead of
    # materializing the (B, B, B) broadcast (hundreds of MB at B in the
    # low hundreds)
    through = np.full_like(C, np.inf)
    for k in range(C.shape[0]):
        np.minimum(through, C[:, k, None] + C[None, k, :], out=through)
    return bool((C <= through + tol).all())


def indmin_bound_pairs(
    weights: np.ndarray,
    cost: np.ndarray,
    li: np.ndarray,
    ri: np.ndarray,
) -> np.ndarray:
    """Vectorized :func:`indmin_bound` over candidate pair blocks: the netted
    surplus at each bin must travel at least to that pair's cheapest deficit
    bin (max of both directions).

    Formulation (round 12): one pass PER BIN over (K, B) running-min
    buffers — for bin j, every pair with a deficit at j folds cost column
    C[:, j] into its per-bin deficit minimum (and symmetrically for
    surpluses).  Same masked-min math as the previous dense
    ``where((neg>0)[:, None, :], C, inf).min(axis=2)`` form, but the
    temporaries shrink from (K, B, B) — ~33 MB per sub-block, measured as
    the single largest CPU sink of the sf0.1 3-d join (171-334 s
    cumulative, memory-bandwidth-bound on this host's expensive fresh
    mmap pages) — to (K_j, B) slices that stay cache-resident, and bins
    where no pair has mass are skipped entirely (histogram support is
    sparse: the work drops from K*B^2 to K*support*B)."""
    W = weights
    C = np.asarray(cost, dtype=np.float64)
    B = C.shape[0]
    n = li.size
    out = np.empty(n, dtype=np.float64)
    step = max(1, (1 << 21) // B)
    for s in range(0, n, step):
        ls = li[s : s + step]
        rs = ri[s : s + step]
        D = W[ls] - W[rs]  # (K, B) net flow
        pos = np.maximum(D, 0.0)
        neg = np.maximum(-D, 0.0)
        K = D.shape[0]
        min_to_def = np.full((K, B), np.inf)
        min_to_sur = np.full((K, B), np.inf)
        for j in range(B):
            col = C[:, j]  # C[i, j] for every source bin i
            nj = np.flatnonzero(D[:, j] < 0.0)
            if nj.size:
                min_to_def[nj] = np.minimum(min_to_def[nj], col[None, :])
            pj = np.flatnonzero(D[:, j] > 0.0)
            if pj.size:
                min_to_sur[pj] = np.minimum(min_to_sur[pj], col[None, :])
        # One-sided net flow (surplus bins but NO deficit bins, or the
        # reverse — rounding-ulp different normalizations of near-identical
        # rows): the masked min stays +inf for every bin, and pos * inf
        # would propagate an inf "bound" that falsely prunes the pair.  The
        # scalar indmin_bound returns 0.0 there (no deficit -> nothing to
        # ship); match it by zeroing the non-finite mins, which also covers
        # the identical-rows 0 * inf guard.
        fwd = np.einsum(
            "kb,kb->k",
            pos,
            np.where((pos > 0.0) & np.isfinite(min_to_def), min_to_def, 0.0),
        )
        bwd = np.einsum(
            "kb,kb->k",
            neg,
            np.where((neg > 0.0) & np.isfinite(min_to_sur), min_to_sur, 0.0),
        )
        out[s : s + step] = np.maximum(fwd, bwd)
    return out


def indmin_bound(a: np.ndarray, b: np.ndarray, cost: np.ndarray) -> float:
    """Each unit of *net surplus* at bin i must travel to some *deficit* bin:
    sum_i max(a_i - b_i, 0) * min_{j in deficit} c_ij  lower-bounds EMD.

    Closed-form relaxation of DistanceUtil.getIndMinEmd's LP
    (utils/DistanceUtil.java:148-182); max of both directions."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    diff = a - b
    surplus = diff > 0
    deficit = diff < 0
    if not surplus.any() or not deficit.any():
        return 0.0
    fwd = float(diff[surplus] @ cost[np.ix_(surplus, deficit)].min(axis=1))
    bwd = float((-diff[deficit]) @ cost[np.ix_(deficit, surplus)].min(axis=1))
    return max(fwd, bwd)


# ---------------------------------------------------------------------------
# Greedy-flow upper bound
# ---------------------------------------------------------------------------

def greedy_flow_upper(a: np.ndarray, b: np.ndarray, cost: np.ndarray) -> float:
    """Greedy feasible transport: repeatedly ship the cheapest available
    (source, target) unit of mass.  Any feasible flow's cost upper-bounds the
    optimum.  Parity in spirit with HistUtil.getFlowBetween
    (utils/HistUtil.java:606-639)."""
    a = normalize(np.asarray(a, dtype=np.float64)).copy()
    b = normalize(np.asarray(b, dtype=np.float64)).copy()
    total = 0.0
    order = np.argsort(cost, axis=None, kind="stable")
    B = cost.shape[1]
    for flat in order:
        i, j = divmod(int(flat), B)
        if a[i] <= 0.0 or b[j] <= 0.0:
            continue
        f = min(a[i], b[j])
        total += f * cost[i, j]
        a[i] -= f
        b[j] -= f
    return float(total)
