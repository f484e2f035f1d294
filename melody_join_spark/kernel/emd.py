"""Exact Earth Mover's Distance kernels (pure numpy, no Spark, no scipy).

Reference semantics: ``DistanceUtil.getEmd`` solves the transportation LP with
commons-math SimplexSolver at EPSILON=1e-4 / maxIter=5000
(/root/reference/src/com/iojin/melody/utils/DistanceUtil.java:25-146).
We solve the identical LP with a transportation-simplex (MODI) implementation,
which is exact (up to float round-off) and also yields the optimal dual
potentials used by the dual-feasibility lower bound
(/root/reference/src/com/iojin/melody/utils/DualBound.java:28-139).

Fast paths:
- ``emd_1d`` — closed form for 1-D bins: area between step CDFs
  (DistanceUtil.get1dEmd, DistanceUtil.java:40-79).
- ``emd_1d_pairs`` — fully vectorized over a block of pairs; this is the hot
  kernel backing the Spark join operators for 1-D histogram data.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "normalize",
    "emd_exact",
    "emd_exact_with_duals",
    "emd_1d",
    "emd_1d_pairs",
    "prefix_cdf",
]

EPSILON = 1e-4  # comparison slack, parity with DistanceUtil.EPSILON (line 25)
MAX_ITER = 5000  # parity with DistanceUtil maxIter (line 29)


def normalize(w: np.ndarray) -> np.ndarray:
    """L1-normalize non-negative weights to sum 1; 2-D inputs normalize
    row-wise (each record independently).

    Parity: HistUtil.normalizeArray (utils/HistUtil.java:519-530) including the
    zero-sum guard (a zero-sum record is returned unchanged).
    """
    w = np.asarray(w, dtype=np.float64)
    if w.ndim == 2:
        s = w.sum(axis=1, keepdims=True)
        safe = np.where(s == 0.0, 1.0, s)
        return w / safe
    s = w.sum()
    if s == 0.0:
        return w
    return w / s


# ---------------------------------------------------------------------------
# 1-D closed forms
# ---------------------------------------------------------------------------

def emd_1d(a: np.ndarray, b: np.ndarray, positions: np.ndarray | None = None) -> float:
    """Exact 1-D EMD between two normalized histograms.

    With ``positions=None`` bins are the integers 0..B-1 and this matches
    ``DistanceUtil.get1dEmd(double[],double[],int)`` (DistanceUtil.java:40-48):
    sum of |prefix-sum differences|.  With explicit sorted positions it is the
    area between the step CDFs (DistanceUtil.java:57-79).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.cumsum(a - b)
    if positions is None:
        return float(np.abs(c).sum())
    positions = np.asarray(positions, dtype=np.float64)
    return float(np.abs(c[:-1]) @ np.diff(positions))


def prefix_cdf(weights: np.ndarray) -> np.ndarray:
    """Row-wise prefix CDF of a (R, B) weight matrix (bins already sorted)."""
    return np.cumsum(np.asarray(weights, dtype=np.float64), axis=1)


def emd_1d_pairs(
    cdf: np.ndarray,
    left_idx: np.ndarray,
    right_idx: np.ndarray,
    positions: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized 1-D EMD for many pairs.

    ``cdf`` is the (R, B) prefix-CDF matrix (see :func:`prefix_cdf`);
    ``left_idx``/``right_idx`` are equal-length index arrays selecting the
    pairs.  Returns a float64 array of EMDs.  Uniform unit bin spacing when
    ``positions`` is None.
    """
    d = np.abs(cdf[left_idx] - cdf[right_idx])
    if positions is None:
        return d.sum(axis=1)
    dx = np.diff(np.asarray(positions, dtype=np.float64))
    return d[:, :-1] @ dx


# ---------------------------------------------------------------------------
# Transportation simplex (general bins / ground distances)
# ---------------------------------------------------------------------------


def _northwest_corner(a: np.ndarray, b: np.ndarray):
    """Initial basic feasible solution; returns basis cells and flows."""
    m, n = a.size, b.size
    basis: list[tuple[int, int]] = []
    flow: dict[tuple[int, int], float] = {}
    ar = a.copy()
    br = b.copy()
    i = j = 0
    while i < m and j < n:
        f = min(ar[i], br[j])
        basis.append((i, j))
        flow[(i, j)] = f
        ar[i] -= f
        br[j] -= f
        if i == m - 1 and j == n - 1:
            break
        # never run off one edge before covering the other: exactly m+n-1 cells
        if i == m - 1:
            j += 1
        elif j == n - 1:
            i += 1
        elif ar[i] <= br[j]:
            i += 1
        else:
            j += 1
    return basis, flow


def _potentials(basis, m, n, C):
    """Solve u_i + v_j = c_ij over the basis spanning tree (u[0]=0).

    Hot path: called once per simplex pivot.  Plain Python lists beat numpy
    here — the tree has m+n <= a few dozen nodes on support-reduced inputs,
    where np.full/np.isnan per-element overhead dominates (measured ~40% of
    total solve time on sparse d=2 workloads)."""
    adj: list[list[tuple[int, int, int]]] = [[] for _ in range(m + n)]
    for i, j in basis:
        adj[i].append((m + j, i, j))
        adj[m + j].append((i, i, j))
    pot: list[float | None] = [None] * (m + n)
    pot[0] = 0.0
    stack = [0]
    while stack:
        node = stack.pop()
        pn = pot[node]
        for other, i, j in adj[node]:
            if pot[other] is None:
                pot[other] = C[i, j] - pn
                stack.append(other)
    u = np.array(pot[:m], dtype=np.float64)
    v = np.array(pot[m:], dtype=np.float64)
    return u, v, adj


def _find_cycle(adj, m, enter_i, enter_j):
    """Path from row-node enter_i to col-node (m+enter_j) through the basis
    tree; together with the entering cell it forms the pivot cycle."""
    target = m + enter_j
    parent = {enter_i: None}
    parent_edge = {}
    stack = [enter_i]
    while stack:
        node = stack.pop()
        if node == target:
            break
        for other, i, j in adj[node]:
            if other not in parent:
                parent[other] = node
                parent_edge[other] = (i, j)
                stack.append(other)
    # walk back from target to enter_i collecting edges
    path = []
    node = target
    while parent[node] is not None:
        path.append(parent_edge[node])
        node = parent[node]
    path.reverse()
    return path


def emd_exact_with_duals(a, b, cost, max_iter: int = MAX_ITER):
    """Exact EMD plus optimal dual potentials (u, v).

    Solves  min <C, F> s.t. F 1 = a, F^T 1 = b, F >= 0  by the transportation
    simplex.  At optimality the potentials satisfy u_i + v_j <= c_ij for ALL
    (i, j), i.e. (u, v) is feasible for the dual LP that DualBound.java:28-60
    solves explicitly — so the returned duals plug straight into the
    dual-feasibility lower bound.
    """
    a = normalize(np.asarray(a, dtype=np.float64))
    b = normalize(np.asarray(b, dtype=np.float64))
    C = np.asarray(cost, dtype=np.float64)
    m, n = a.size, b.size
    if C.shape != (m, n):
        raise ValueError(f"cost shape {C.shape} != ({m},{n})")

    # Degeneracy perturbation on BOTH marginals (strictly positive, distinct)
    # so the initial BFS and subsequent pivots are generically nondegenerate;
    # the final flows are re-solved on the optimal basis with the unperturbed
    # marginals, so this costs no accuracy.
    eps = 1e-11
    ap = a + eps * np.arange(m, 0, -1)
    bp = b + eps * (np.arange(1, n + 1) * 0.618033988749895 % 1.0 + 0.5)
    bp *= ap.sum() / bp.sum()  # rebalance so totals match exactly

    basis, flow = _northwest_corner(ap, bp)
    converged = False
    for _ in range(max_iter):
        u, v, adj = _potentials(basis, m, n, C)
        red = C - u[:, None] - v[None, :]
        # mask basis cells (reduced cost exactly 0 there, avoid float noise)
        enter_flat = int(np.argmin(red))
        ei, ej = divmod(enter_flat, n)
        if red[ei, ej] >= -1e-12:
            converged = True
            break
        path = _find_cycle(adj, m, ei, ej)
        # entering cell gets +delta; path edges alternate -,+,-,... starting -
        minus_cells = path[0::2]
        deltas = np.array([flow[c] for c in minus_cells])
        k = int(np.argmin(deltas))
        delta = deltas[k]
        leave = minus_cells[k]
        sign = -1.0
        for cell in path:
            flow[cell] += sign * delta
            sign = -sign
        flow[(ei, ej)] = delta
        basis.remove(leave)
        del flow[leave]
        basis.append((ei, ej))

    # The optimal basis depends only on reduced costs, so it stays optimal for
    # the UNPERTURBED marginals; re-solve the tree flows exactly to remove the
    # perturbation's O(eps * cost) bias from the objective.
    exact_flow = _tree_flows(basis, a, b)
    total = sum(C[i, j] * f for (i, j), f in exact_flow.items())
    u, v, _ = _potentials(basis, m, n, C)
    if not converged and (C - u[:, None] - v[None, :]).min() < -1e-9:
        # iteration cap hit on a non-optimal basis: the flow is still
        # feasible (total is a valid EMD upper approximation, matching the
        # reference's maxIter=5000 behavior) but the potentials would
        # VIOLATE dual feasibility — a bound built on them could falsely
        # dismiss pairs.  Zero potentials are always dual-feasible for a
        # nonnegative cost (bound contribution 0, never unsound).
        u = np.zeros(m)
        v = np.zeros(n)
    return float(total), u, v


def _tree_flows(basis, a: np.ndarray, b: np.ndarray) -> dict:
    """Solve the (unique) flows on a spanning-tree basis by leaf elimination."""
    m, n = a.size, b.size
    supply = np.concatenate([a, -b])  # row nodes supply, col nodes demand
    edges = {}
    adj: dict[int, set] = {k: set() for k in range(m + n)}
    for i, j in basis:
        adj[i].add(m + j)
        adj[m + j].add(i)
        edges[(i, m + j)] = (i, j)
    flow: dict[tuple[int, int], float] = {}
    sup = supply.astype(np.float64).copy()
    degree = {k: len(adj[k]) for k in adj}
    leaves = [k for k, d in degree.items() if d == 1]
    while leaves:
        leaf = leaves.pop()
        if degree[leaf] == 0:
            continue
        other = next(iter(adj[leaf]))
        key = (leaf, other) if (leaf, other) in edges else (other, leaf)
        cell = edges[key]
        f = sup[leaf] if leaf < m else -sup[leaf]
        flow[cell] = max(0.0, f)
        # push the leaf's imbalance across the edge
        sup[other] += sup[leaf]
        sup[leaf] = 0.0
        adj[other].discard(leaf)
        adj[leaf].discard(other)
        degree[leaf] -= 1
        degree[other] -= 1
        if degree[other] == 1:
            leaves.append(other)
    return flow


def emd_exact(a, b, cost, max_iter: int = MAX_ITER) -> float:
    """Exact EMD between two (auto-normalized) histograms given a cost matrix.

    Solves on the nonzero SUPPORT of each side: zero-weight bins add
    rows/columns the optimal flow never touches, and real histograms are
    often sparse (a 16-bin order histogram typically has <=4 nonzero bins —
    the simplex then runs 4x4 instead of 16x16, ~10x faster)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ia = np.flatnonzero(a)
    ib = np.flatnonzero(b)
    if ia.size == 0 or ib.size == 0:
        return 0.0
    if ia.size < a.size or ib.size < b.size:
        sub = np.asarray(cost, dtype=np.float64)[np.ix_(ia, ib)]
        total, _, _ = emd_exact_with_duals(a[ia], b[ib], sub, max_iter)
        return total
    total, _, _ = emd_exact_with_duals(a, b, cost, max_iter)
    return total
