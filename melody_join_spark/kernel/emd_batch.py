"""Batched exact EMD — a transportation simplex vectorized ACROSS pairs.

The per-pair scalar simplex (`emd.emd_exact`) is exact but pays Python
interpreter time per LP; on d>=2 workloads the exact stage of the filter
cascade is thousands of small LPs and the interpreter — not the math —
dominates (30% of the sf0.1 bench, round-2 VERDICT).  This module solves a
*stack* of transportation problems with identical support shape (m, n) in
lockstep: every simplex ingredient — northwest-corner start, tree-potential
solve, entering-arc selection, pivot-cycle walk, flow update, final
unperturbed re-solve — is a numpy array operation over the whole batch, so
the interpreter cost is O(pivots) instead of O(pairs * pivots).  Problems
that converge are compacted out of the working set each pivot, and the
tree-potential solve keeps a shrinking frontier of unresolved arcs instead
of re-scanning the full edge list per sweep.

Semantics are identical to the scalar solver (same degeneracy perturbation,
same entering rule, same unperturbed tree re-solve — emd.py:184-251, itself
parity-matched to the reference's commons-math SimplexSolver usage,
/root/reference/src/com/iojin/melody/utils/DistanceUtil.java:112-146);
`tests/test_kernel_emd.py` asserts batch == scalar to 1e-9 on random
dense/sparse/degenerate inputs under L1/L2/arbitrary costs.

Entry points:
- ``emd_exact_batch(A, B, C)`` — one (m, n) class, stacked.
- ``emd_exact_pairs(W, cost, li, ri)`` — arbitrary index pairs of a weight
  matrix; groups pairs by support-size class, batches the big classes,
  falls back to the scalar solver for tiny classes (batch setup would cost
  more than it saves).
"""

from __future__ import annotations

import numpy as np

from .emd import MAX_ITER, emd_exact

__all__ = [
    "emd_exact_batch",
    "emd_exact_pairs",
    "emd_exact_pairs_memo",
    "support_table",
]

# classes smaller than this solve scalar — batch setup overhead dominates
MIN_BATCH = 48
# cap per-solve stack memory: 64k problems x (m*n) doubles
MAX_BATCH = 1 << 16


def support_table(W: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(SUP, CNT): per-row support indices (front-packed, ascending) and
    support sizes of a (R, B) weight matrix.  Precompute once per dataset."""
    nz = np.asarray(W) > 0.0
    cnt = nz.sum(axis=1).astype(np.int64)
    sup = np.argsort(~nz, axis=1, kind="stable").astype(np.int64)
    return sup, cnt


def _nw_corner_batch(ap: np.ndarray, bp: np.ndarray):
    """Vectorized northwest-corner start: (K, E) basis rows/cols/flows.

    Mirrors the scalar `_northwest_corner` walk; with the (nondegenerate)
    perturbed marginals every problem takes exactly m + n - 1 steps."""
    K, m = ap.shape
    n = bp.shape[1]
    E = m + n - 1
    bi = np.empty((K, E), dtype=np.int64)
    bj = np.empty((K, E), dtype=np.int64)
    fl = np.empty((K, E), dtype=np.float64)
    ar = ap.copy()
    br = bp.copy()
    ii = np.zeros(K, dtype=np.int64)
    jj = np.zeros(K, dtype=np.int64)
    ks = np.arange(K)
    for t in range(E):
        av = ar[ks, ii]
        bv = br[ks, jj]
        f = np.minimum(av, bv)
        bi[:, t] = ii
        bj[:, t] = jj
        fl[:, t] = f
        ar[ks, ii] = av - f
        br[ks, jj] = bv - f
        at_end = (ii == m - 1) & (jj == n - 1)
        # scalar rule: i==m-1 -> j+1; j==n-1 -> i+1; else smaller residual side
        adv_i = np.where(
            ii == m - 1, False, np.where(jj == n - 1, True, ar[ks, ii] <= br[ks, jj])
        )
        adv_i = adv_i & ~at_end
        ii = ii + adv_i
        jj = jj + (~adv_i & ~at_end)
    return bi, bj, fl


def _tree_sweep(bi, bj, ecost, m, n):
    """Root every basis tree at node 0; returns (pot, parent, parent_edge,
    depth, ok).  Nodes 0..m-1 are rows, m..m+n-1 are columns; potentials
    satisfy u_i + v_j = c_ij over basis arcs.

    Frontier form: the directed arc list starts at 2*K*E entries and each
    sweep keeps only arcs whose target is still unknown, so total work is
    sum over arcs of their tree depth — far below sweeps x full-list for
    path-shaped trees (the northwest-corner staircase)."""
    K, E = bi.shape
    N = m + n
    pot = np.zeros(K * N)
    known = np.zeros(K * N, dtype=bool)
    parent = np.full(K * N, -1, dtype=np.int64)
    parent_edge = np.full(K * N, -1, dtype=np.int64)
    depth = np.zeros(K * N, dtype=np.int64)
    base = (np.arange(K) * N)[:, None]
    known[np.arange(K) * N] = True  # node 0 per problem
    # flat directed arcs: row->col then col->row, per problem
    fsrc = np.concatenate([bi, bj + m], axis=1) + base  # flat node ids
    ftgt = np.concatenate([bj + m, bi], axis=1) + base
    fcost = np.concatenate([ecost, ecost], axis=1)
    feid = np.broadcast_to(
        np.concatenate([np.arange(E), np.arange(E)]), (K, 2 * E)
    )
    fsrc = fsrc.ravel()
    ftgt = ftgt.ravel()
    fcost = fcost.ravel()
    feid = feid.ravel()
    pend = np.arange(fsrc.size)
    for _ in range(N):
        if pend.size == 0:
            break
        s_n = fsrc[pend]
        t_n = ftgt[pend]
        s_known = known[s_n]
        t_known = known[t_n]
        fire = s_known & ~t_known
        if fire.any():
            p = pend[fire]
            ss = fsrc[p]
            tt = ftgt[p]
            pot[tt] = fcost[p] - pot[ss]
            known[tt] = True
            parent[tt] = ss
            parent_edge[tt] = feid[p]
            depth[tt] = depth[ss] + 1
        pend = pend[~(t_known | fire)]
    okn = known.reshape(K, N).all(axis=1)
    # parents as LOCAL node ids (0..N-1): flat ids would go stale when the
    # caller compacts converged problems out of the working set
    parent = np.where(parent >= 0, parent % N, -1)
    return (
        pot.reshape(K, N),
        parent.reshape(K, N),
        parent_edge.reshape(K, N),
        depth.reshape(K, N),
        okn,
    )


def _cycle_paths(parent, parent_edge, depth, ei, ej, m):
    """Pivot cycle of each problem: edges from row-node ei up to the LCA and
    from col-node m+ej up to the LCA, plus each edge's cycle-position parity.

    ``parent`` holds LOCAL node ids (as returned by `_tree_sweep`).  Returns
    (edges (K, L) int64 padded -1, minus (K, L) bool): ``minus`` marks edges
    at even cycle positions (they lose delta; the entering cell occupies
    position -1 and gains it) — the scalar `path[0::2]` rule."""
    K, N = parent.shape
    L = N  # path length bound per side
    parent_f = parent.ravel()
    pedge_f = parent_edge.ravel()
    depth_f = depth.ravel()
    base = np.arange(K) * N
    a_e = np.full((K, L), -1, dtype=np.int64)
    b_e = np.full((K, L), -1, dtype=np.int64)
    na = np.zeros(K, dtype=np.int64)
    nb = np.zeros(K, dtype=np.int64)
    pa = ei.copy()  # local node ids, per-problem
    pb = m + ej
    for _ in range(2 * N):
        live = np.flatnonzero(pa != pb)
        if live.size == 0:
            break
        fa = base[live] + pa[live]
        fb = base[live] + pb[live]
        da = depth_f[fa]
        db = depth_f[fb]
        step_a = live[da >= db]
        step_b = live[db >= da]
        if step_a.size:
            fsa = base[step_a] + pa[step_a]
            a_e[step_a, na[step_a]] = pedge_f[fsa]
            pa[step_a] = parent_f[fsa]
            na[step_a] += 1
        if step_b.size:
            fsb = base[step_b] + pb[step_b]
            b_e[step_b, nb[step_b]] = pedge_f[fsb]
            pb[step_b] = parent_f[fsb]
            nb[step_b] += 1
    # cycle positions: a-side edge t sits at position t; b-side edge t sits
    # at position (na + nb - 1 - t).  Even position => minus edge.
    tcol = np.arange(L)[None, :]
    a_minus = (tcol % 2 == 0) & (a_e >= 0)
    b_pos = (na + nb)[:, None] - 1 - tcol
    b_minus = (b_pos % 2 == 0) & (b_e >= 0)
    edges = np.concatenate([a_e, b_e], axis=1)
    minus = np.concatenate([a_minus, b_minus], axis=1)
    return edges, minus


def _finalize(bi, bj, C, A, B, m, n):
    """Unperturbed re-solve on final bases: subtree supply sums give the
    unique tree flows (scalar `_tree_flows` leaf elimination, vectorized by
    processing depth levels bottom-up).  Returns (totals, bad)."""
    K, E = bi.shape
    ks2 = np.broadcast_to(np.arange(K)[:, None], (K, E))
    ecost = C[ks2, bi, bj]
    _, parent, parent_edge, depth, ok = _tree_sweep(bi, bj, ecost, m, n)
    N = m + n
    base = np.arange(K) * N
    s = np.concatenate([A, -B], axis=1).ravel().copy()
    flow = np.zeros((K, E))
    max_depth = int(depth.max()) if depth.size else 0
    pe_f = parent_edge.ravel()
    pa_f = parent.ravel()
    for lvl in range(max_depth, 0, -1):
        at = depth == lvl
        if not at.any():
            continue
        k_s, nodes = np.nonzero(at)
        fn = base[k_s] + nodes
        e = pe_f[fn]
        val = s[fn]
        f = np.where(nodes < m, val, -val)
        flow[k_s, e] = np.maximum(f, 0.0)
        np.add.at(s, base[k_s] + pa_f[fn], val)  # parents are local node ids
    total = np.einsum("ke,ke->k", flow, ecost)
    return total, ~ok


def emd_exact_batch(
    A: np.ndarray, B: np.ndarray, C: np.ndarray, max_iter: int = MAX_ITER
) -> np.ndarray:
    """Exact EMD for K stacked transportation problems of one support shape.

    ``A`` (K, m) supplies, ``B`` (K, n) demands (normalized per row here),
    ``C`` (K, m, n) costs.  Returns (K,) optimal values.  Problems whose
    basis tree degenerates (never observed; defensive) re-solve scalar."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    K, m = A.shape
    n = B.shape[1]
    A = A / A.sum(axis=1, keepdims=True)
    B = B / B.sum(axis=1, keepdims=True)
    if m == 1:
        return np.einsum("kn,kn->k", B, C[:, 0, :])
    if n == 1:
        return np.einsum("km,km->k", A, C[:, :, 0])

    # identical perturbation scheme to the scalar solver (emd.py:204-207)
    eps = 1e-11
    ap = A + eps * np.arange(m, 0, -1)[None, :]
    bp = B + eps * ((np.arange(1, n + 1) * 0.618033988749895) % 1.0 + 0.5)[None, :]
    bp = bp * (ap.sum(axis=1) / bp.sum(axis=1))[:, None]

    bi, bj, fl = _nw_corner_batch(ap, bp)
    E = m + n - 1

    # final state (written as problems converge and leave the working set)
    bi_fin = bi.copy()
    bj_fin = bj.copy()
    bad = np.zeros(K, dtype=bool)
    idx = np.arange(K)  # working row -> original problem
    Cw = C
    for _ in range(max_iter):
        if idx.size == 0:
            break
        kw = idx.size
        ksw = np.arange(kw)
        ks2 = np.broadcast_to(ksw[:, None], (kw, E))
        ecost = Cw[ks2, bi, bj]
        pot, parent, parent_edge, depth, ok = _tree_sweep(bi, bj, ecost, m, n)
        u = pot[:, :m]
        v = pot[:, m:]
        red = Cw - u[:, :, None] - v[:, None, :]
        flat = red.reshape(kw, -1)
        enter = flat.argmin(axis=1)
        emin = flat[ksw, enter]
        done = (emin >= -1e-12) | ~ok
        if done.any():
            d = np.flatnonzero(done)
            bi_fin[idx[d]] = bi[d]
            bj_fin[idx[d]] = bj[d]
            bad[idx[d]] |= ~ok[d]
            keep = np.flatnonzero(~done)
            if keep.size == 0:
                idx = idx[:0]
                break
            idx = idx[keep]
            bi, bj, fl = bi[keep], bj[keep], fl[keep]
            Cw = Cw[keep]
            parent, parent_edge, depth = parent[keep], parent_edge[keep], depth[keep]
            enter = enter[keep]
            kw = keep.size
            ksw = np.arange(kw)
        ei = enter // n
        ej = enter - ei * n
        edges, minus = _cycle_paths(parent, parent_edge, depth, ei, ej, m)
        # delta = min flow over minus edges; leaving edge = that argmin
        path_fl = np.where(
            minus, fl[ksw[:, None], np.maximum(edges, 0)], np.inf
        )
        sel = path_fl.argmin(axis=1)
        delta = path_fl[ksw, sel]
        leave = edges[ksw, sel]
        # apply +-delta around the cycle: one flat scatter — a path's
        # (problem, edge) pairs are distinct, so fancy += is exact
        kk, cc = np.nonzero(edges >= 0)
        ee = edges[kk, cc]
        fl[kk, ee] += np.where(minus[kk, cc], -1.0, 1.0) * delta[kk]
        # entering cell replaces the leaving edge's slot
        bi[ksw, leave] = ei
        bj[ksw, leave] = ej
        fl[ksw, leave] = delta
    if idx.size:  # iteration cap: flows feasible, value is an upper approx
        bi_fin[idx] = bi
        bj_fin[idx] = bj

    total, fin_bad = _finalize(bi_fin, bj_fin, C, A, B, m, n)
    bad |= fin_bad
    if bad.any():
        for k in np.flatnonzero(bad):
            total[k] = emd_exact(A[k], B[k], C[k], max_iter)
    return total


def emd_exact_pairs(
    W: np.ndarray,
    cost: np.ndarray,
    li: np.ndarray,
    ri: np.ndarray,
    sup: np.ndarray | None = None,
    cnt: np.ndarray | None = None,
    max_iter: int = MAX_ITER,
) -> np.ndarray:
    """Exact EMD for index pairs (li[k], ri[k]) of a (R, B) weight matrix.

    Pairs are grouped by support-size class (m, n); each class solves as one
    stacked batch (`emd_exact_batch`) on the gathered support submatrices —
    the sparse-support reduction of the scalar path (emd.py:289-307), done
    for the whole class at once.  Classes below MIN_BATCH pairs fall back to
    the scalar solver.  ``sup``/``cnt`` from :func:`support_table` can be
    passed in to amortize the support scan across calls."""
    W = np.asarray(W, dtype=np.float64)
    li = np.asarray(li, dtype=np.int64)
    ri = np.asarray(ri, dtype=np.int64)
    if sup is None or cnt is None:
        sup, cnt = support_table(W)
    K = li.size
    out = np.zeros(K)
    ma = cnt[li]
    nb = cnt[ri]
    live = (ma > 0) & (nb > 0)  # zero-support rows: EMD defined as 0
    if not live.any():
        return out
    cost = np.asarray(cost, dtype=np.float64)
    # class key: (m, n) packed; argsort groups equal classes contiguously
    B1 = W.shape[1] + 1
    key = np.where(live, ma * B1 + nb, -1)
    order = np.argsort(key, kind="stable")
    order = order[key[order] >= 0]
    bounds = np.flatnonzero(np.diff(key[order])) + 1
    for grp in np.split(order, bounds):
        m = int(ma[grp[0]])
        n = int(nb[grp[0]])
        if grp.size < MIN_BATCH:
            for k in grp:
                out[k] = emd_exact(W[li[k]], W[ri[k]], cost, max_iter)
            continue
        for s in range(0, grp.size, MAX_BATCH):
            g = grp[s : s + MAX_BATCH]
            rsup = sup[li[g], :m]  # (k, m) support bin indices
            csup = sup[ri[g], :n]
            A = np.take_along_axis(W[li[g]], rsup, axis=1)
            Bm = np.take_along_axis(W[ri[g]], csup, axis=1)
            Cs = cost[rsup[:, :, None], csup[:, None, :]]
            out[g] = emd_exact_batch(A, Bm, Cs, max_iter)
    return out


def emd_exact_pairs_memo(
    W: np.ndarray,
    cost: np.ndarray,
    li: np.ndarray,
    ri: np.ndarray,
    group: np.ndarray,
    memo: dict,
    sup: np.ndarray | None = None,
    cnt: np.ndarray | None = None,
    n_groups: int | None = None,
) -> np.ndarray:
    """`emd_exact_pairs` with row-group memoization.

    ``group`` maps each row of W to its identical-histogram group (from
    np.unique(..., return_inverse=True)); same-group pairs short-circuit to
    0 and every DISTINCT unordered group pair solves its LP exactly once —
    memo hits are free repeats on dup-heavy data.  ``memo`` (packed-int key
    -> float) persists across calls so chunked callers share one table."""
    li = np.asarray(li, dtype=np.int64)
    ri = np.asarray(ri, dtype=np.int64)
    gl = group[li]
    gr = group[ri]
    emds = np.zeros(li.size)
    diff = np.flatnonzero(gl != gr)
    if diff.size == 0:
        return emds
    if n_groups is None:
        n_groups = int(group.max()) + 1
    lo = np.minimum(gl[diff], gr[diff])
    hi = np.maximum(gl[diff], gr[diff])
    ukey, inv = np.unique(lo * n_groups + hi, return_inverse=True)
    vals = np.empty(ukey.size)
    unknown = []
    for t, k_ in enumerate(ukey.tolist()):
        v = memo.get(k_)
        if v is None:
            unknown.append(t)
        else:
            vals[t] = v
    if unknown:
        un = np.asarray(unknown, dtype=np.int64)
        order = np.argsort(inv, kind="stable")
        first = np.searchsorted(inv[order], un)  # first occurrence per key
        rep = diff[order[first]]
        solved = emd_exact_pairs(W, cost, li[rep], ri[rep], sup=sup, cnt=cnt)
        vals[un] = solved
        for t, v in zip(unknown, solved.tolist()):
            memo[int(ukey[t])] = v
    emds[diff] = vals[inv]
    return emds
