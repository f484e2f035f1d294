"""Independent exact-EMD solver for building oracle fixtures.

This solver exists so the d>=2 fixture oracles are NOT produced by the same
code path the engine itself uses (`kernel/emd.py` solves the transportation
problem with a primal simplex on the full bipartite basis tree).  Here the
same optimum is computed by a *different algorithm family* — successive
shortest augmenting paths (min-cost flow, Bellman-Ford over the residual
graph) on the netted surplus/deficit problem — so a bug in either
implementation shows up as a fixture/engine mismatch rather than silently
agreeing.

Netting is valid because the ground distance is a metric (Euclidean on the
bin lattice): mass shared between the two histograms ships to itself at
cost 0 in some optimal plan, so EMD(a, b) == mincostflow((a-b)+, (b-a)+).
This mirrors the reference's support-reduction preprocessing
(utils/DistanceUtil.java, getEmdLTwo path) without sharing any code with
`kernel/emd.py`.

Histogram supports in the fixture workloads are tiny (<= B bins, typically
~5 nonzero), so the O(V * E) Bellman-Ford per augmentation is microseconds;
correctness of SSP needs only "augment along a shortest residual path",
which Bellman-Ford gives with true (possibly negative backward) arc costs
and no potential bookkeeping.

Pure numpy + stdlib; no Spark, no engine imports.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ssp_emd"]

_TOL = 1e-12


def ssp_emd(a: np.ndarray, b: np.ndarray, cost: np.ndarray) -> float:
    """Exact EMD between histograms ``a`` and ``b`` (L1-normalized here)
    under ground-distance matrix ``cost`` via successive shortest paths.

    ``cost[i, j]`` must be a metric (nonnegative, zero diagonal, triangle
    inequality) for the surplus/deficit netting to be exact.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    sa, sb = a.sum(), b.sum()
    if sa <= 0.0 or sb <= 0.0:
        return 0.0
    d = a / sa - b / sb
    src = np.flatnonzero(d > _TOL)
    snk = np.flatnonzero(d < -_TOL)
    if src.size == 0 or snk.size == 0:
        return 0.0
    sup = d[src].copy()  # remaining supply per source
    dem = -d[snk].copy()  # remaining demand per sink
    # rebalance fp drift so the flow problem is exactly feasible
    dem *= sup.sum() / dem.sum()
    C = cost[np.ix_(src, snk)]
    ns, nt = src.size, snk.size
    flow = np.zeros((ns, nt))
    remaining = sup.sum()
    # Residual graph nodes: 0..ns-1 sources, ns..ns+nt-1 sinks.  A virtual
    # super-source is modeled by seeding Bellman-Ford with dist=0 on every
    # source that still has supply (all virtual arcs cost 0), and the
    # super-sink by picking the min-dist sink with unmet demand.  Virtual
    # backward arcs never help: re-routing already-shipped supply between
    # interchangeable cost-0 virtual arcs cannot shorten any path.
    iters = 0
    max_iters = 16 * (ns + nt) ** 2  # far above any real augmentation count
    while remaining > 1e-11:
        iters += 1
        if iters > max_iters:
            raise RuntimeError("ssp_emd failed to converge")
        n = ns + nt
        dist = np.full(n, np.inf)
        prev = np.full(n, -1, dtype=np.int64)
        for i in range(ns):
            if sup[i] > _TOL:
                dist[i] = 0.0
        # Bellman-Ford: relax forward arcs (i -> sink j, cost C[i,j]) and
        # backward arcs (sink j -> i, cost -C[i,j], present iff flow > 0)
        for _ in range(n):
            changed = False
            for i in range(ns):
                if not np.isfinite(dist[i]):
                    continue
                nd = dist[i] + C[i]
                upd = np.flatnonzero(nd < dist[ns:] - 1e-15)
                if upd.size:
                    dist[ns + upd] = nd[upd]
                    prev[ns + upd] = i
                    changed = True
            for j in range(nt):
                if not np.isfinite(dist[ns + j]):
                    continue
                back = np.flatnonzero(flow[:, j] > _TOL)
                for i in back:
                    nd = dist[ns + j] - C[i, j]
                    if nd < dist[i] - 1e-15:
                        dist[i] = nd
                        prev[i] = ns + j
                        changed = True
            if not changed:
                break
        cand = [j for j in range(nt) if dem[j] > _TOL and np.isfinite(dist[ns + j])]
        if not cand:
            if remaining > 1e-9:
                raise RuntimeError("ssp_emd: unreachable demand with supply left")
            break  # numerically exhausted (residual ~ fp drift)
        t = ns + min(cand, key=lambda j: dist[ns + j])
        # walk back to the originating source, collecting path arcs
        path = []  # (i, j, forward?)
        v = t
        while prev[v] != -1:
            u = prev[v]
            if u < ns:
                path.append((u, v - ns, True))
            else:
                path.append((v, u - ns, False))
            v = u
        s0 = v
        delta = min(sup[s0], dem[t - ns])
        for i, j, fwd in path:
            if not fwd:
                delta = min(delta, flow[i, j])
        for i, j, fwd in path:
            flow[i, j] += delta if fwd else -delta
        sup[s0] -= delta
        dem[t - ns] -= delta
        remaining -= delta
    return float((flow * C).sum())
