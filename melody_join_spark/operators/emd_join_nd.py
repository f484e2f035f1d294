"""d-dimensional EMD similarity joins — the MELODY pruned plan on Spark.

This is the Spark-first rebuild of the reference's core join
(mr/normal/QuantileNormalEmd.java 4-phase MR pipeline, SURVEY.md §3.1),
re-expressed as one declarative plan:

phase 1+2 (preprocess/space)  -> narrow column expressions (centroids) +
                                 one percentile aggregation (quantile grid
                                 boundaries, QNEPreReducer.java:161-189)
phase 3 (process)             -> guest-cell enumeration UDF (Grid.
                                 getGuestWithDual:352-457 analog, using the
                                 bbox-clamp Rubner screen) -> explode ->
                                 groupBy(cell) -> applyInPandas block join
                                 running the numpy filter cascade
                                 (EmdFilter.java:49-82 order) with exact
                                 EMD (transportation simplex) on survivors
phase 4 (aggregate, top-k)    -> orderBy(emd).limit(k)

Partitioning is a *quantile* grid over the centroid (Rubner) coordinates:
cell boundaries are per-dimension percentiles, so cells are load-balanced by
construction (the reference's Grid.assignGrid greedy balancing, Grid.java:
611-641, becomes unnecessary).  Soundness of cell pruning: the Rubner bound
||cent(a) - cent(b)||_2 <= EMD(a, b) (DistanceUtil.getRubnerEmd:184-230)
implies a qualifying partner of record a lies within theta of cent(a), so
replicating a as a guest only to cells whose centroid-space bbox is within
theta (np.clip form of the 27-case analysis, DistanceUtil.java:232-417)
loses no pairs.

Each unordered pair is produced exactly once: same-cell pairs by id order;
cross-cell pairs only in the lower cell (guests are replicated only to cells
strictly below their native cell — the Spark equivalent of
QNEProcessMapper.shouldDistribute:371-395).

Scale: the only wide exchange is the groupBy(cell) shuffle of (G^d cells >>
cores) balanced groups; all bound tables (grid boundaries, dual potentials,
reduction maps, ground matrix) are tiny driver-side objects shipped by
closure — the DistributedCache side files of the reference
(QuantileNormalEmd.java:141-145) with no files involved.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..kernel import (
    DualPotentials,
    EmdCascade,
    ReductionMap,
    ground_distance_matrix,
    normalize,
    projection_positions,
)

__all__ = [
    "NdJoinConfig",
    "JoinStats",
    "build_config",
    "emd_join_nd",
    "emd_topk_nd",
    "emd_knn",
]


class JoinStats:
    """Distributed pruning-effectiveness counters — parity with the
    reference's TimerUtil counters (eliminated / dualElimination /
    qnePairCounter, utils/TimerUtil.java:12-26, BASELINE.md).

    Spark accumulators aggregate per-task CascadeStats back to the driver;
    read ``snapshot()`` after an action on the join result.  The
    ``guest_*`` counters track CELL-level elimination during guest
    enumeration (the Grid.getGuestWithDual screens, utils/Grid.java:352-457):
    how many candidate (record, cell) replications each screen removed
    before any row was shuffled."""

    FIELDS = (
        "candidates",
        "pruned_rubner",
        "pruned_normal",
        "pruned_projection",
        "pruned_dual",
        "pruned_reduction",
        "pruned_indmin",
        "exact_evaluated",
    )
    CELL_FIELDS = (
        "seed_ceiling_micro",  # emd_topk_nd kth seed ceiling, in 1e-6 EMD units
        "guest_considered",
        "guest_pruned_empty",
        "guest_pruned_rubner",
        "guest_pruned_normal",
        "guest_pruned_dual",
        "guest_replicas",
        "laesa_considered",  # pivot path, arbitrary cost: block pairs before
        "laesa_survivors",   # / after the pivot-space triangle screen
    )

    def __init__(self, sc):
        self.acc = {f: sc.accumulator(0) for f in self.FIELDS + self.CELL_FIELDS}

    def update(self, st) -> None:
        for f in self.FIELDS:
            self.acc[f].add(int(getattr(st, f)))

    def add(self, field: str, n: int) -> None:
        self.acc[field].add(int(n))

    def snapshot(self) -> dict[str, int]:
        return {f: self.acc[f].value for f in self.FIELDS + self.CELL_FIELDS}


@dataclass
class NdJoinConfig:
    """Driver-built, closure-shipped join state (all tiny).

    Mirrors the reference's side files: projection vectors (README.md:23-24),
    dual potentials (NEPreMapper cleanup -> dualPath), reduction matrices
    (NEProcessReducer.java:52-54) — computed once, shipped everywhere.
    """

    bin_points: np.ndarray          # (B, d)
    cost: np.ndarray                # (B, B) ground distance matrix
    proj_positions: list = field(default_factory=list)   # [(B,)] per vector
    duals: list = field(default_factory=list)            # [DualPotentials]
    reductions: list = field(default_factory=list)       # [ReductionMap]
    slack: float = 1e-4             # DistanceUtil.EPSILON output slack
    # Minkowski exponent of the ground distance, or None for an ARBITRARY
    # cost matrix (DistanceType parity).  None disables every centroid- and
    # projection-geometry screen (see EmdCascade.rubner_ord).
    rubner_ord: float | None = 2
    # Cached metric verdict for ``cost`` — computed ONCE on the driver
    # (build_config) and closure-shipped, so executors never re-run the
    # O(B^3) triangle check per applyInPandas group (ADVICE round 9).
    metric_cost: bool | None = None

    def is_metric(self) -> bool:
        """Metric verdict for the ground cost, cached on first use.

        ``build_config`` fills the cache eagerly on the driver; the lazy
        path exists only for configs constructed directly (tests)."""
        if self.metric_cost is None:
            from ..kernel.bounds import is_metric_cost

            self.metric_cost = (
                self.rubner_ord is not None or is_metric_cost(self.cost)
            )
        return self.metric_cost


def build_config(
    bin_points: np.ndarray,
    seed_weights: np.ndarray | None = None,
    n_proj: int | None = None,
    num_duals: int | None = None,
    num_reductions: int | None = None,
    reduced_dim: int = 8,
    seed: int = 42,
    slack: float = 1e-4,
    ground: str | np.ndarray = "l2",
) -> NdJoinConfig:
    """Build the broadcastable join config on the driver.

    ``seed_weights`` (>=2 rows of normalized weights) seed the dual
    potentials exactly as the reference seeds duals from cached record pairs
    (NEPreMapper.java:123-128); seeded rng makes runs reproducible
    (SURVEY.md §5 determinism note).

    ``ground`` selects the ground distance: ``'l1' | 'l2' | 'l3'``
    (Minkowski, DistanceType LONE/LTWO/LTHREE) or an explicit (B, B) cost
    matrix (ARBITRARY, DistanceUtil.java:440-474).  Minkowski grounds get
    the full screen stack (projections Hoelder-scaled to the chosen norm,
    Rubner in the matching p-norm); an arbitrary matrix keeps only the
    cost-matrix-generic stages (dual, reduction, IndMin, exact) — like the
    reference, whose grid/normal machinery is built on L2 geometry."""
    bin_points = np.atleast_2d(np.asarray(bin_points, dtype=np.float64))
    if bin_points.shape[0] == 1 and bin_points.shape[1] > 1:
        bin_points = bin_points.T
    cost = ground_distance_matrix(
        bin_points.ravel(), dimension=bin_points.shape[1], ground=ground
    )
    minkowski = {"l1": 1.0, "l2": 2.0, "l3": 3.0}.get(ground) if isinstance(
        ground, str
    ) else None
    d = bin_points.shape[1]
    rng = np.random.default_rng(seed)

    # screen budget auto-scales with what geometry offers: Minkowski
    # grounds get the full stack (Rubner/projection/normal/IndMin), so 2
    # duals + 1 reduction suffice; an ARBITRARY matrix keeps only the
    # cost-generic dual/reduction screens, so spend more of them — each
    # extra dual is one O(B) dot per pair vs an LP per unpruned survivor
    # (measured on the sf0.1 sqrt(L1) join: 6/2 cut exact LPs 466k -> 341k
    # and wall 20.2 -> 14.8 s; see ABCHECK_r05.md)
    if num_duals is None:
        num_duals = 2 if minkowski is not None else 6
    if num_reductions is None:
        num_reductions = 1 if minkowski is not None else 2

    projs = []
    if n_proj is None:
        # default: one axis projection per dimension (the reference ships 3
        # vectors for its default d=3, melody-conf.properties:45-64), capped
        # at 4 — each projection costs an O(B) cascade stage per candidate
        n_proj = max(2, min(d, 4))
    if minkowski is None:
        n_proj = 0  # projection contraction needs a Minkowski ground
    elif d == 1:
        n_proj = 1  # every 1-D projection is the same line (up to sign)
    for k in range(n_proj):
        if k < d:
            v = np.zeros(d)
            v[k] = 1.0          # axis projections first (always useful)
        else:
            v = rng.standard_normal(d)
        projs.append(projection_positions(bin_points, v, ground=ground))

    duals = []
    if seed_weights is not None and len(seed_weights) >= 2:
        sw = np.atleast_2d(np.asarray(seed_weights, dtype=np.float64))
        sw = sw / sw.sum(axis=1, keepdims=True)
        n = len(sw)
        for k in range(num_duals):
            i, j = rng.choice(n, size=2, replace=False)
            if np.allclose(sw[i], sw[j]):
                continue
            duals.append(DualPotentials.from_seed_pair(sw[i], sw[j], cost))

    reductions = [
        ReductionMap(cost, reduced=min(reduced_dim, cost.shape[0]), seed=seed + k)
        for k in range(num_reductions)
    ]
    cfg = NdJoinConfig(
        bin_points, cost, projs, duals, reductions, slack, rubner_ord=minkowski
    )
    cfg.is_metric()  # fill the cached verdict driver-side before shipping
    return cfg


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

_PAIR_SCHEMA = StructType(
    [
        StructField("rid", LongType()),
        StructField("sid", LongType()),
        StructField("emd", DoubleType()),
    ]
)


def _cascade_for(weights: np.ndarray, cfg: NdJoinConfig) -> EmdCascade:
    return EmdCascade(
        weights=weights,
        cost=cfg.cost,
        bin_points=cfg.bin_points,
        proj_positions=cfg.proj_positions,
        duals=cfg.duals,
        reductions=cfg.reductions,
        rubner_ord=cfg.rubner_ord,
        metric_cost=cfg.metric_cost,
    )


def _emit_pairs(ids, li, ri, emds, ordered: bool = False) -> pd.DataFrame:
    """ordered=False: unordered self-join pairs normalized to rid < sid.
    ordered=True: two-table pairs — rid is the left (R) id, sid the right."""
    rid = ids[li]
    sid = ids[ri]
    if ordered:
        return pd.DataFrame({"rid": rid, "sid": sid, "emd": emds})
    lo = np.minimum(rid, sid)
    hi = np.maximum(rid, sid)
    return pd.DataFrame({"rid": lo, "sid": hi, "emd": emds})


# minimum rows per task before the parallelism floor widens an input: with
# fewer, per-task Arrow/UDF overhead exceeds the parallelism it buys
_FLOOR_ROWS_PER_TASK = 128


def _parallelism_floor(df: DataFrame, n_rows: int | None = None) -> DataFrame:
    """Guarantee CPU parallelism for the per-record Python stages.

    Scan partitioning is BYTE-sized (spark.sql.files.maxPartitionBytes),
    which is blind to per-row compute: a dense histogram table is tiny on
    disk (57k records of 27 doubles ~ 12 MB = ONE split), yet every record
    downstream pays a normal fit, guest-cell screens and possibly an exact
    LP — measured as a single 456 s task (31/32 cores idle) on the sf1
    scale run before this guard.  Repartition UP to the session's shuffle
    parallelism when the input arrives below it; when the input is already
    at least that wide (any cluster-scale read with real file splits) this
    is a no-op with no added exchange.  Round-robin repartition, so it
    never changes results — only where rows sit.

    MISUSE GUARD: probing ``df.rdd.getNumPartitions()`` EXECUTES the
    upstream plan when the relation is not already materialized (measured
    +4.0-4.6 s per call on the sf0.1 bridge chains, ABCHECK_r05 §5) — so
    this helper refuses inputs that are not persisted, leaving a third
    call site no way to silently pay an extra chain execution (round-5
    VERDICT next #7).  Both call sites probe cached relations by design.
    """
    lvl = df.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        # a narrow projection of a persisted frame is also fine (its own
        # storageLevel reads NONE but the probe hits the InMemoryRelation);
        # check the cache-substituted plan for one
        try:
            plan = df._jdf.queryExecution().withCachedData().toString()
        except Exception:
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        if "InMemoryRelation" not in plan:
            raise ValueError(
                "_parallelism_floor requires a persisted (cache-backed) "
                "input: probing partition count on a raw chain re-executes "
                "it. persist() the relation first (see "
                "emd_join_nd._build_grid_ctx)."
            )
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    if n_rows is not None:
        # row-aware cap: >= ~_FLOOR_ROWS_PER_TASK rows per task.  Tiny
        # tables gain nothing from full width — shattering the 72-image
        # media join into 32 near-empty Arrow/UDF tasks measured +0.9-1.0 s
        # (round-6 A/B, BENCHAB_r06.md), a pure overhead tax — while the
        # regimes the floor exists for keep the cap (sf0.1 bridge 5.8k
        # rows -> 46 > 32 unchanged; sf1 57k rows -> cap).  Callers pass
        # the count of the already-materialized cache, so this costs no
        # extra job.
        target = min(target, max(1, -(-n_rows // _FLOOR_ROWS_PER_TASK)))
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def _centroid_cols(hist: DataFrame, bin_points: np.ndarray, w_col: str) -> DataFrame:
    """Append cent_0..cent_{d-1} = normalized-weight centroid coordinates.
    Pure JVM expressions (no UDF): cent_k = sum_i w_i * bins[i, k] / total.

    Zero-mass rows are REJECTED here (their centroid is undefined; the
    kernel's normalize() would leave them as zero vectors whose EMD to
    everything is 0 — mirroring build_histograms' total > 0 ingestion filter
    keeps every strategy consistent)."""
    d = bin_points.shape[1]
    total = F.aggregate(w_col, F.lit(0.0), lambda a, x: a + x)
    out = hist.withColumn("_tot", total).where(F.col("_tot") > 0)
    for k in range(d):
        coords = F.array(*[F.lit(float(b)) for b in bin_points[:, k]])
        dot = F.aggregate(
            F.zip_with(w_col, coords, lambda w, c: w * c), F.lit(0.0), lambda a, x: a + x
        )
        out = out.withColumn(f"cent_{k}", dot / F.col("_tot"))
    return out.drop("_tot")


def _stat_udf(cfg: NdJoinConfig):
    """Pandas UDF computing the per-record pruning-stat vector in one
    vectorized Arrow pass (the reference precomputes the same columns in its
    preprocess phase, mr/normal/NEPreMapper.java:90-140):

        st = [mu_p, sigma_p, err_p  for each projection p]
           + [key_q, ckey_q         for each dual q]

    These feed (a) the per-CELL stat aggregation that powers guest-cell
    screening and (b) nothing else — the in-cell cascade recomputes from
    weights because an Arrow array column round-trip costs more than the
    numpy refit on a cell-sized batch."""
    orders = []
    for pos in cfg.proj_positions:
        o = np.argsort(np.asarray(pos), kind="stable")
        orders.append((o, np.asarray(pos)[o]))
    dual_uv = [(dl.u, dl.v) for dl in cfg.duals]

    from ..kernel.normal import cdf_approx_error, fit_normal

    @F.pandas_udf(ArrayType(DoubleType()))
    def stats(w: pd.Series) -> pd.Series:
        W = normalize(np.stack(w.to_numpy()).astype(np.float64))
        cols = []
        for o, ps in orders:
            Ws = W[:, o]
            mu, sigma = fit_normal(Ws, ps)
            err = cdf_approx_error(Ws, ps, mu, sigma)
            cols += [mu, sigma, err]
        for u, v in dual_uv:
            cols += [W @ u, W @ v]
        S = np.stack(cols, axis=1)
        return pd.Series(list(S))

    return stats, 3 * len(orders) + 2 * len(dual_uv)


class _CellStats:
    """Dense per-cell screening tables, built from one groupBy(cell) agg and
    shipped by closure (G^d cells, all tiny — the analog of the reference's
    cell error/dual side files, mr/normal/NESpaceReducer.java:74-219).

    Arrays are indexed by cell id; absent cells keep cnt == 0."""

    def __init__(self, rows, d: int, n_proj: int, n_dual: int, ncells: int):
        self.cnt = np.zeros(ncells, dtype=np.int64)
        self.cmin = np.full((ncells, d), np.inf)
        self.cmax = np.full((ncells, d), -np.inf)
        self.mu_lo = np.zeros((n_proj, ncells))
        self.mu_hi = np.zeros((n_proj, ncells))
        self.sig_lo = np.zeros((n_proj, ncells))
        self.sig_hi = np.zeros((n_proj, ncells))
        self.err_max = np.zeros((n_proj, ncells))
        self.key_min = np.zeros((n_dual, ncells))
        self.ckey_min = np.zeros((n_dual, ncells))
        for r in rows:
            c = int(r["cell"])
            self.cnt[c] = r["cnt"]
            for k in range(d):
                self.cmin[c, k] = r[f"cmin_{k}"]
                self.cmax[c, k] = r[f"cmax_{k}"]
            for p in range(n_proj):
                self.mu_lo[p, c] = r[f"mu_lo_{p}"]
                self.mu_hi[p, c] = r[f"mu_hi_{p}"]
                self.sig_lo[p, c] = r[f"sig_lo_{p}"]
                self.sig_hi[p, c] = r[f"sig_hi_{p}"]
                self.err_max[p, c] = r[f"err_max_{p}"]
            for q in range(n_dual):
                self.key_min[q, c] = r[f"key_min_{q}"]
                self.ckey_min[q, c] = r[f"ckey_min_{q}"]


def _collect_cell_stats(
    rec: DataFrame, d: int, n_proj: int, n_dual: int, ncells: int
) -> _CellStats:
    aggs = [F.count("*").alias("cnt")]
    for k in range(d):
        aggs += [
            F.min(f"cent_{k}").alias(f"cmin_{k}"),
            F.max(f"cent_{k}").alias(f"cmax_{k}"),
        ]
    for p in range(n_proj):
        mu, sig, err = (F.element_at("st", 3 * p + i) for i in (1, 2, 3))
        aggs += [
            F.min(mu).alias(f"mu_lo_{p}"),
            F.max(mu).alias(f"mu_hi_{p}"),
            F.min(sig).alias(f"sig_lo_{p}"),
            F.max(sig).alias(f"sig_hi_{p}"),
            F.max(err).alias(f"err_max_{p}"),
        ]
    for q in range(n_dual):
        key, ckey = (F.element_at("st", 3 * n_proj + 2 * q + i) for i in (1, 2))
        aggs += [F.min(key).alias(f"key_min_{q}"), F.min(ckey).alias(f"ckey_min_{q}")]
    rows = rec.groupBy("cell").agg(*aggs).collect()
    return _CellStats(rows, d, n_proj, n_dual, ncells)


# ---------------------------------------------------------------------------
# grid (MELODY) strategy
# ---------------------------------------------------------------------------

def _grid_boundaries(
    hist: DataFrame, d: int, grid: int
) -> np.ndarray:
    """(d, grid-1) per-dimension quantile cell boundaries — the reference's
    Percentile.evaluate grid (QNEPreReducer.java:161-189) as one agg."""
    probs = [i / grid for i in range(1, grid)]
    aggs = [
        F.percentile_approx(f"cent_{k}", F.array(*[F.lit(p) for p in probs]), 10000).alias(f"b{k}")
        for k in range(d)
    ]
    row = hist.agg(*aggs).collect()[0]
    return np.array([row[f"b{k}"] for k in range(d)], dtype=np.float64)


def _derive_grid(n: int, d: int) -> int:
    """Auto grid resolution from (N, d) — a 100 TB user will not retune
    per-dataset constants (round-4 VERDICT item 2).  G = N^(1/(d+1)) for
    d >= 2 and N^0.4 at d=1, fit AND swept against the sf0.1 bench family
    (ABCHECK_r05.md): at d=2 it gives 18 (parity with the hand-tuned 20,
    measured); at d=3 it gives 9, which the grid sweep showed BEATS the
    hand-tuned 16 (7.5-7.7 s vs 8.4 s min-of-3).  Total cells G^d then
    grow as N^(d/(d+1)) — sublinear in N, so per-cell occupancy still
    rises slowly while the closure-shipped cell-stat tables stay far below
    N and bounded by the 64^d clamp."""
    exp = 0.4 if d == 1 else 1.0 / (d + 1)
    return int(np.clip(round(float(max(n, 2)) ** exp), 3, 64))


def _derive_pivots(n: int, arbitrary_cost: bool) -> int:
    """Auto pivot count ~ sqrt(N)/3: fit to the tuned sf0.1 constant
    (24 at N=5793).  Arbitrary costs used to get ~2x the pivots (the LAESA
    triangle screen was their only strong pair filter); since the
    metric-verified IndMin cascade stage took over that screening work the
    measured optimum matches the Minkowski constant — sf0.1 sweep,
    min-of-2 interleaved, identical outputs: P=16 27.5s / P=24 13.6s /
    P=32 17.5s / P=48 17.7s / P=64 21.3s.  Each pivot costs ~one exact LP
    per record in the assignment stage (97.9% of (record, pivot) slots
    fall inside the window cut at the bench theta), so excess pivots now
    buy little and pay linearly."""
    del arbitrary_cost  # one curve fits both since the IndMin stage landed
    return int(np.clip(round(np.sqrt(float(max(n, 4))) / 3.0), 8, 128))


def _derive_cell_cap(n: int, n_part: int) -> int:
    """Auto hot-cell salting cap: ~one equal slice of the record table per
    shuffle partition, floored at 200 (the measured skew_bench sweet spot —
    8.3x max-task cut at sf0.1).  Unskewed cells sit far below the cap and
    are never split; only genuinely hot cells shatter."""
    return max(200, int(np.ceil(n / float(max(n_part, 1)))))


def emd_join_nd(
    hist: DataFrame,
    bin_points: np.ndarray,
    threshold: float,
    cfg: NdJoinConfig | None = None,
    strategy: str = "grid",
    grid: int | None = None,
    num_blocks: int = 8,
    id_col: str = "id",
    w_col: str = "w",
    seed: int = 42,
    other: DataFrame | None = None,
    stats: "JoinStats | None" = None,
    ground: str | np.ndarray = "l2",
    cell_cap: int | None = None,
    num_pivots: int | None = None,
) -> DataFrame:
    """EMD threshold join -> DataFrame(rid, sid, emd).

    Self-join (``other=None``): all unordered pairs with EMD <= threshold
    (+cfg.slack); rid < sid.  Two-table (``other`` given): all (r in hist,
    s in other) pairs — the R x S generalization the reference lacks
    (its joins are self-joins only, SURVEY.md §2.3); rid is hist's id, sid
    is other's.

    ``hist``/``other``: (id long, w array<double>) — weights need not be
    normalized (normalized per-record in the kernel, HistUtil.normalizeArray
    parity).  ``strategy``: 'grid' (quantile-cell pruned plan), 'pivot'
    (MRSimJoin), 'bruteforce' (block join — the J7/BSP-baseline correctness
    oracle), or 'auto' (engine picks: bruteforce for tiny inputs, pivot for
    arbitrary cost matrices, grid otherwise — declare the query, let the
    engine choose the physical plan).

    ``ground``: 'l1' | 'l2' | 'l3' | explicit (B, B) cost matrix
    (DistanceType parity).  An arbitrary matrix supports 'bruteforce' and
    'pivot' (which needs it to be a metric, as the reference assumes); the
    grid strategy is centroid-geometry-based and requires Minkowski.
    """
    bin_points = np.atleast_2d(np.asarray(bin_points, dtype=np.float64))
    if bin_points.shape[0] == 1 and bin_points.shape[1] > 1:
        bin_points = bin_points.T
    # for the grid strategy, cfg seeding is DEFERRED into _build_grid_ctx so
    # the seed sample reads the cached centroid table instead of re-running
    # the (possibly expensive) upstream plan one extra time
    if cfg is None and strategy != "grid":
        seed_rows = hist.select(w_col).limit(8).collect()
        sw = np.array([r[0] for r in seed_rows], dtype=np.float64)
        cfg = build_config(bin_points, seed_weights=sw, seed=seed, ground=ground)
    theta = float(threshold)
    two_table = other is not None

    # zero-mass histograms are rejected up front (EMD undefined; parity with
    # build_histograms' total > 0 ingestion filter) so every strategy agrees
    mass = F.aggregate(F.col(w_col), F.lit(0.0), lambda a, x: a + x) > 0
    rec = hist.where(mass).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(w_col).alias("w"),
        F.lit(0).alias("side"),
    )
    if two_table:
        rec = rec.unionByName(
            other.where(mass).select(
                F.col(id_col).cast("long").alias("id"),
                F.col(w_col).alias("w"),
                F.lit(1).alias("side"),
            )
        )

    from ..cache import release_on_gc

    _auto_rec = None  # probe-persisted rec, released with the result

    def _auto_wrap(df: DataFrame) -> DataFrame:
        return release_on_gc(df, _auto_rec) if _auto_rec is not None else df

    if strategy == "auto":
        # physical-strategy pick, Catalyst-style: the caller states WHAT
        # (threshold join under this ground), the engine picks HOW.
        # - arbitrary cost matrix: the grid's geometric screens don't apply
        #   -> pivot (metric-generic) for self-joins, bruteforce otherwise
        # - tiny input: the grid's stats/boundaries jobs cost more than the
        #   O(n^2/blocks) block join they would save -> bruteforce
        # - else: the quantile-grid MELODY plan
        minkowski_g = (
            cfg.rubner_ord
            if cfg is not None
            else (
                {"l1": 1.0, "l2": 2.0, "l3": 3.0}.get(ground)
                if isinstance(ground, str)
                else None
            )
        )
        small_probe = 512
        # persist BEFORE the sizing probe: partitions the probe scans are
        # cached, so the chosen strategy reuses them instead of re-running
        # the upstream histogram build (ADVICE round-3: the same
        # unpersisted-double-execution class as dup_clusters/pivot)
        rec = rec.persist()
        _auto_rec = rec
        n_probe = rec.limit(small_probe + 1).count()
        if n_probe <= small_probe:
            strategy = "bruteforce"
        elif minkowski_g is None:
            # the pivot plan's hyperplane windows assume the triangle
            # inequality — a non-metric matrix silently drops qualifying
            # pairs there, so auto only picks pivot for VERIFIED metrics
            # and falls back to the sound block join otherwise
            if two_table or (cfg is not None and not cfg.is_metric()):
                strategy = "bruteforce"
            else:
                strategy = "pivot"
        else:
            strategy = "grid"

    if strategy == "bruteforce":
        return _auto_wrap(_block_bruteforce(rec, cfg, theta, num_blocks, two_table))
    if strategy == "pivot":
        if two_table:
            raise ValueError("pivot strategy supports self-joins only")
        if cfg.rubner_ord is None:
            # refuse loudly instead of silently dropping pairs: the
            # hyperplane window rule (and the LAESA screens) are sound only
            # under the triangle inequality.  The reference assumes the
            # caller hands it a metric (MRSimJoinHD's partitioning has the
            # same unchecked precondition); a one-time O(B^3) check makes
            # the contract enforceable here.
            if not cfg.is_metric():
                raise ValueError(
                    "pivot strategy requires a METRIC ground cost "
                    "(symmetric, zero diagonal, triangle inequality) — "
                    "this matrix violates it; use strategy='bruteforce' "
                    "for a general cost matrix"
                )
        # persist: the pivot sample (orderBy+limit collect) and the
        # assignment mapInPandas each consume rec — without the boundary the
        # upstream (histogram build at sf-scale) executes twice
        rec_c = rec if _auto_rec is not None else rec.persist()
        if num_pivots is None:
            num_pivots = _derive_pivots(
                rec_c.count(), arbitrary_cost=cfg.rubner_ord is None
            )
        return release_on_gc(
            _pivot_join(
                rec_c, cfg, theta, num_pivots=num_pivots, seed=seed, stats=stats
            ),
            rec_c,
        )
    if strategy != "grid":
        raise ValueError(f"unknown strategy {strategy!r}")
    minkowski = (
        cfg.rubner_ord
        if cfg is not None
        else ({"l1": 1.0, "l2": 2.0, "l3": 3.0}.get(ground) if isinstance(ground, str) else None)
    )
    if minkowski is None:
        raise ValueError(
            "grid strategy requires a Minkowski ground ('l1'/'l2'/'l3'); "
            "use strategy='pivot' (metric cost) or 'bruteforce' for an "
            "arbitrary cost matrix"
        )

    if bin_points.shape[1] == 1 and stats is None:
        # Collinear bins: 1-D EMD is a closed form over prefix CDFs, fully
        # expressible as JVM codegen — delegate to the cells plan of the 1-D
        # operator (hash-checked emd_threshold_cells machinery) instead of
        # shipping arrays through a Python cascade.  Same semantics: the
        # cells plan filters emd <= passed threshold, so pass theta + slack
        # (cascade parity); every Minkowski p coincides with |x - y| on a
        # line.  Covers self- AND two-table joins; the pandas path remains
        # when the caller wants JoinStats instrumentation.
        from .emd_join import emd_threshold_join
        from .histograms import with_cum

        pos = bin_points[:, 0]
        order = np.argsort(pos, kind="stable")

        def _prep(side_df):
            h = side_df.select("id", "w")
            if not np.array_equal(order, np.arange(pos.size)):
                h = h.withColumn(
                    "w", F.array(*[F.col("w")[int(i)] for i in order])
                )
            return with_cum(
                h.withColumn(
                    "total", F.aggregate("w", F.lit(0.0), lambda a, x: a + x)
                )
            )

        slack = cfg.slack if cfg is not None else 1e-4
        if two_table:
            # persist the unioned record table BEFORE the side split: each
            # .where(side=...) otherwise re-executes BOTH sides' upstream
            # histogram builds (measured 2x the whole query)
            rec_c = rec if _auto_rec is not None else rec.persist()
            out = emd_threshold_join(
                _prep(rec_c.where(F.col("side") == 0)),
                theta + slack,
                positions=pos[order],
                strategy="cells",
                other=_prep(rec_c.where(F.col("side") == 1)),
            )
            return release_on_gc(out, rec_c)
        return _auto_wrap(
            emd_threshold_join(
                _prep(rec), theta + slack, positions=pos[order], strategy="cells"
            )
        )

    ctx = _build_grid_ctx(rec, bin_points, cfg, grid, seed=seed, ground=ground)
    out = _grid_join(ctx, theta, stats=stats, two_table=two_table, cell_cap=cell_cap)
    return _auto_wrap(release_on_gc(out, ctx.rec1))


@dataclass
class _GridCtx:
    """Theta-independent grid state, built once and reusable across probe
    radii (emd_topk_nd's escalation loop): the cached record table with
    cell + stat columns, the quantile boundaries, and the per-cell screen
    tables.  Call ``rec1.unpersist()`` when done."""

    rec1: DataFrame
    bnds: np.ndarray
    cs: "_CellStats"
    cfg: NdJoinConfig
    d: int
    grid: int


def _build_grid_ctx(
    rec: DataFrame,
    bin_points: np.ndarray,
    cfg: NdJoinConfig | None,
    grid: int | None,
    seed: int = 42,
    ground: str | np.ndarray = "l2",
) -> _GridCtx:
    d = bin_points.shape[1]
    # persist the centroid-annotated records BEFORE the driver-side stat
    # jobs: the quantile-boundary agg, the cfg seed sample, the stat-column
    # materialization and the cell-stat collect would otherwise each
    # re-execute the upstream plan (for the bench bridge tables that is a
    # 3-join + groupBy chain — measured ~40% of the whole d=2 query before
    # this cache)
    rec0 = _centroid_cols(rec, bin_points, "w").persist()
    if grid is None:
        # ONE fused job for count + boundaries (round 12, guide §2.1/§2.6:
        # the auto-grid path used to pay two sequential driver actions —
        # count() to derive G, then the percentile agg at probs i/G — each
        # a full pass/job with its own scheduling gap).  Both come from a
        # single agg now: the count plus one fixed fine quantile sketch
        # (127 points) per dimension; G is derived from the count and the
        # G-1 cell boundaries linearly interpolated from the sketch.
        # Boundaries are load-balancing geometry, not semantics — ANY
        # monotone boundary set yields the same join output (cell screens
        # are sound, the exact filter decides) — and the interpolated
        # values are deterministic for a given dataset.  Explicit-grid
        # callers (tests, emd_index) keep the exact percentile_approx
        # boundaries below.
        fine_probs = [i / 128.0 for i in range(1, 128)]
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.percentile_approx(
                f"cent_{k}", F.array(*[F.lit(p) for p in fine_probs]), 10000
            ).alias(f"b{k}")
            for k in range(d)
        ]
        if cfg is None:
            # fold the dual-seed sample into the same agg (round 12): 8
            # hash-min rows — min_by over xxhash64(id, salt) is one
            # deterministic row per salt — replace the separate limit(8)
            # collect job.  Seeds only shape the dual-potential SCREENS
            # (sound lower bounds), so any seed choice yields identical
            # join output; this one is also more deterministic than the
            # old partition-order limit(8).
            aggs += [
                F.min_by("w", F.xxhash64(F.col("id"), F.lit(9000 + t))).alias(
                    f"sw{t}"
                )
                for t in range(8)
            ]
        row = rec0.agg(*aggs).collect()[0]  # materializes rec0
        n_rec = int(row["n"])
        grid = _derive_grid(n_rec, d)
        want = np.arange(1, grid) / grid
        bnds = np.stack(
            [
                np.interp(want, fine_probs, np.asarray(row[f"b{k}"], dtype=np.float64))
                for k in range(d)
            ]
        )
        if cfg is None:
            seed_ws = [row[f"sw{t}"] for t in range(8)]
            sw = np.array(
                [list(w) for w in seed_ws if w is not None], dtype=np.float64
            )
            cfg = build_config(
                bin_points, seed_weights=sw if sw.size else None,
                seed=seed, ground=ground,
            )
    else:
        bnds = _grid_boundaries(rec0, d, grid)  # materializes rec0
        n_rec = rec0.count()  # cached by now: metadata-cheap
    if cfg is None:
        seed_rows = rec0.select("w").limit(8).collect()
        sw = np.array([r[0] for r in seed_rows], dtype=np.float64)
        cfg = build_config(bin_points, seed_weights=sw, seed=seed, ground=ground)

    # native cell id: per-dim index = #boundaries <= coord, base-`grid` encoded
    cell = F.lit(0)
    for k in range(d):
        idx_k = F.lit(0)
        for b in bnds[k]:
            idx_k = idx_k + F.when(F.col(f"cent_{k}") >= float(b), 1).otherwise(0)
        cell = cell * grid + idx_k

    stat_udf, stat_len = _stat_udf(cfg)
    # the parallelism floor sits BETWEEN the caches, after rec0 is
    # materialized (the boundary agg above always scans it): the partition
    # probe then reads the in-memory relation without re-running the
    # upstream plan — probing the RAW input instead would force AQE to
    # execute the whole chain one extra time (measured ~4 s per query on
    # the sf0.1 bridge tables).  rec1, the expensive per-record stat pass,
    # is what actually needs the width; rec0's cheap JVM aggregates do not.
    rec1 = (
        _parallelism_floor(rec0, n_rec)
        .withColumn("cell", cell.cast("long"))
        .withColumn("st", stat_udf("w"))
        .persist()
    )

    # one agg over the (small) cell space: per-cell centroid bbox, per-cell
    # (mu, sigma, err) bboxes per projection, per-cell dual-key minima — the
    # reference's NESpaceReducer cell-stat side files (NESpaceReducer.java:
    # 74-219) as a broadcastable numpy table
    cs = _collect_cell_stats(rec1, d, len(cfg.proj_positions), len(cfg.duals), grid**d)
    rec0.unpersist()  # rec1 (a superset) is materialized now
    return _GridCtx(rec1, bnds, cs, cfg, d, grid)


def _salt_factors(cnt: np.ndarray, cell_cap: int) -> np.ndarray:
    """Per-cell sub-block counts: cells whose native count exceeds cell_cap/2
    split into S blocks so a block-PAIR group holds ~2*cnt/S <= cell_cap
    rows.  Guest replication concentrates next to dense cells, so the native
    count is the driver (round-2 VERDICT item 4; the reference instead
    re-rounds oversized partitions through spill dirs,
    CloudJoinBaseReducer.java:150-272)."""
    return np.maximum(1, np.ceil(2.0 * cnt / float(cell_cap))).astype(np.int64)


def _grid_join(
    ctx: _GridCtx,
    theta: float,
    stats: "JoinStats | None" = None,
    two_table: bool = False,
    cell_cap: int | None = None,
) -> DataFrame:
    cfg, d, grid, bnds, cs = ctx.cfg, ctx.d, ctx.grid, ctx.bnds, ctx.cs
    rec1 = ctx.rec1
    if cell_cap is None:
        # free: the per-cell counts are already collected; N = their sum
        n_part_cap = int(
            rec1.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        cell_cap = _derive_cell_cap(int(cs.cnt.sum()), n_part_cap)
    n_proj = len(cfg.proj_positions)
    n_dual = len(cfg.duals)

    # guest cells: every *occupied* cell strictly below the native cell that
    # survives three sound record-to-cell screens (Grid.getGuestWithDual:
    # 352-457): (1) Rubner distance to the cell's ACTUAL centroid bbox,
    # (2) the normal/EMD_BR bound over the cell's (mu, sigma) bbox per
    # projection, (3) the dual-key range bound.  Fully vectorized: per-dim
    # candidate index windows come from two searchsorted calls (cell edges
    # are sorted), the mixed-radix combo expansion and every screen are
    # numpy array ops — no per-row Python loop.
    reach = theta + cfg.slack
    lo_edges = [np.concatenate(([-np.inf], bnds[k])) for k in range(d)]
    hi_edges = [np.concatenate((bnds[k], [np.inf])) for k in range(d)]
    from ..kernel.normal import cell_normal_bound

    @F.pandas_udf(ArrayType(LongType()))
    def guest_cells(cent_struct: pd.DataFrame, st: pd.Series, native: pd.Series) -> pd.Series:
        C = cent_struct.to_numpy(dtype=np.float64)  # (n, d)
        nat = native.to_numpy(dtype=np.int64)
        n = nat.size
        if n == 0:
            return pd.Series([], dtype=object)
        S = np.stack(st.to_numpy())  # (n, stat_len)
        jlo = np.empty((n, d), dtype=np.int64)
        counts = np.empty((n, d), dtype=np.int64)
        for k in range(d):
            jlo[:, k] = np.searchsorted(hi_edges[k], C[:, k] - reach, side="left")
            jhi = np.searchsorted(lo_edges[k], C[:, k] + reach, side="right")
            counts[:, k] = jhi - jlo[:, k]
        total = counts.prod(axis=1)
        rep = np.repeat(np.arange(n), total)
        starts = np.concatenate(([0], np.cumsum(total)[:-1]))
        rem = np.arange(int(total.sum())) - np.repeat(starts, total)
        cid = np.zeros(rem.size, dtype=np.int64)
        mult = 1
        for k in range(d - 1, -1, -1):  # decode mixed radix, dim 0 most significant
            ck = counts[rep, k]
            cid += (jlo[rep, k] + rem % ck) * mult
            rem //= ck
            mult *= grid
        if stats is not None:
            stats.add("guest_considered", rep.size)
        # dedup rule: guests go only to cells strictly below their native cell
        keep = cid < nat[rep]
        rep, cid = rep[keep], cid[keep]
        # screen 0: empty cells host no partners
        keep = cs.cnt[cid] > 0
        n_empty = int((~keep).sum())
        rep, cid = rep[keep], cid[keep]
        # screen 1: Rubner to the cell's actual centroid bbox (tighter than
        # the quantile-boundary bbox, esp. for unbounded edge cells), in the
        # ground distance's own p-norm
        clp = np.clip(C[rep], cs.cmin[cid], cs.cmax[cid])
        keep = np.linalg.norm(C[rep] - clp, ord=cfg.rubner_ord, axis=1) <= reach
        n_rub = int((~keep).sum())
        rep, cid = rep[keep], cid[keep]
        # screen 2: normal/EMD_BR bound per projection over the (mu, sigma) bbox
        n_norm = 0
        for p in range(n_proj):
            if rep.size == 0:
                break
            lb = cell_normal_bound(
                S[rep, 3 * p], S[rep, 3 * p + 1], S[rep, 3 * p + 2],
                cs.mu_lo[p, cid], cs.mu_hi[p, cid],
                cs.sig_lo[p, cid], cs.sig_hi[p, cid],
                cs.err_max[p, cid],
            )
            keep = lb <= reach
            n_norm += int((~keep).sum())
            rep, cid = rep[keep], cid[keep]
        # screen 3: dual-key ranges — min over cell members of the pair dual
        # bound max(key_r + ckey_b, key_b + ckey_r) is >= the screen value
        n_dualp = 0
        for q in range(n_dual):
            if rep.size == 0:
                break
            lb = np.maximum(
                S[rep, 3 * n_proj + 2 * q] + cs.ckey_min[q, cid],
                cs.key_min[q, cid] + S[rep, 3 * n_proj + 2 * q + 1],
            )
            keep = lb <= reach
            n_dualp += int((~keep).sum())
            rep, cid = rep[keep], cid[keep]
        if stats is not None:
            stats.add("guest_pruned_empty", n_empty)
            stats.add("guest_pruned_rubner", n_rub)
            stats.add("guest_pruned_normal", n_norm)
            stats.add("guest_pruned_dual", n_dualp)
            stats.add("guest_replicas", rep.size)
        # regroup survivors (rep stayed sorted through the boolean masks)
        edges = np.searchsorted(rep, np.arange(n + 1))
        return pd.Series([cid[edges[r]:edges[r + 1]] for r in range(n)])

    cent_struct = F.struct(*[F.col(f"cent_{k}") for k in range(d)])
    # single-read plan: each record explodes into 1 native + 0..k guest
    # entries in one pass over rec1 (no self-union, so the cached input is
    # scanned once by the final job)
    entries = F.concat(
        F.array(F.struct(F.col("cell").alias("c"), F.lit(True).alias("n"))),
        F.transform(
            guest_cells(cent_struct, F.col("st"), F.col("cell")),
            lambda g: F.struct(g.alias("c"), F.lit(False).alias("n")),
        ),
    )
    allrows = rec1.select(
        "id", "w", "side", F.explode(entries).alias("e")
    ).select(
        "id", "w", "side",
        F.col("e.c").alias("cell"),
        F.col("e.n").alias("native"),
    )

    # hot-cell salting: cells over the cap fan out into block-PAIR sub-groups
    # (the _block_bruteforce triangle applied per hot cell) so one
    # applyInPandas task holds ~cell_cap rows, never the whole cell.  Cold
    # cells keep salt factor 1 — the plan below degenerates to the unsalted
    # one (sub == 0) with no extra replication.
    #
    # The split factor keys off the cell's LOAD (natives + an upper estimate
    # of incoming guests), not the native count alone: when theta spans
    # multiple cells (clustered data, generous radius) guests dominate group
    # size and native-count salting under-splits — measured 2.4x straggler
    # residue in scripts/skew_bench.py's cluster shape.  Guests into cell j
    # are bounded at CELL granularity with the same Rubner bbox screen the
    # guest UDF applies per record: every higher occupied cell whose
    # centroid bbox lies within reach contributes its full count.  Driver-
    # side numpy over <= G^d occupied cells, chunked to stay O(m * 256 * d)
    # in memory.
    load = cs.cnt.astype(np.float64).copy()
    occ = np.flatnonzero(cs.cnt > 0)
    if occ.size > 1 and cfg.rubner_ord is not None:
        A_lo, A_hi = cs.cmin[occ], cs.cmax[occ]
        cnt_occ = cs.cnt[occ].astype(np.float64)
        guests_into = np.zeros(occ.size)
        for s0 in range(0, occ.size, 256):
            s1 = min(s0 + 256, occ.size)
            gap = np.maximum(
                A_lo[s0:s1, None, :] - A_hi[None, :, :],
                A_lo[None, :, :] - A_hi[s0:s1, None, :],
            )
            np.maximum(gap, 0.0, out=gap)
            dist = np.linalg.norm(gap, ord=cfg.rubner_ord, axis=2)  # (b, m)
            near = dist <= reach
            # guests into cell j (the chunk axis) come from higher cells i
            higher = occ[None, :] > occ[s0:s1, None]
            guests_into[s0:s1] = (near & higher) @ cnt_occ
        load[occ] += guests_into
    salt = _salt_factors(load, cell_cap)
    max_s = int(salt.max()) if salt.size else 1
    if max_s > 1:
        hot = {int(c): int(salt[c]) for c in np.flatnonzero(salt > 1)}
        smap = F.create_map(*[F.lit(x) for c, s in hot.items() for x in (c, s)])
        s_col = F.coalesce(smap[F.col("cell")], F.lit(1))
        b_col = F.pmod(F.xxhash64("id"), s_col)
        subs = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), s_col - F.lit(1)),
                lambda o: F.least(b_col, o) * max_s + F.greatest(b_col, o),
            )
        )
        allrows = allrows.select(
            "id", "w", "side", "cell", "native",
            b_col.alias("blk"), F.explode(subs).alias("sub"),
        )
    else:
        allrows = allrows.withColumn("blk", F.lit(0)).withColumn("sub", F.lit(0))
    grp_key = (F.col("cell") * (max_s * max_s) + F.col("sub")).alias("grp")
    allrows = allrows.select("id", "w", "side", "cell", "native", "blk", grp_key)

    def join_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Partition-batched cascade (round 12, guide §4): hash partitioning
        # on "grp" already places every row of a group in exactly one
        # partition, so per-GROUP pair generation below is unchanged — but
        # the cascade (np.unique row-grouping, support table, dual keys,
        # every pruning stage and the batched exact solver) runs ONCE on
        # the whole partition's rows and on the CONCATENATED candidate
        # list.  The old one-pandas-DataFrame-per-group applyInPandas paid
        # Arrow + cascade-construction overhead per group (9,597 groups of
        # a few rows each at sf0.1 3-d ~ 10 s of the 60 s join-stage CPU)
        # and fragmented the exact stage's support classes below MIN_BATCH
        # (scalar-LP fallback).  Output identity: the pair set is generated
        # per group exactly as before, and every cascade stage is a sound
        # per-pair screen whose survivors are decided by the same exact-EMD
        # filter — batching changes only WHERE a pair is pruned, never
        # whether it survives, so rid/sid/emd are bit-identical.
        pdfs = [pdf for pdf in it if len(pdf)]
        if not pdfs:
            return
        allp = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)
        ids = allp["id"].to_numpy()
        W = normalize(np.stack(allp["w"].to_numpy()).astype(np.float64))
        nat = allp["native"].to_numpy()
        side = allp["side"].to_numpy()
        blks = allp["blk"].to_numpy()
        grps = allp["grp"].to_numpy()
        casc = _cascade_for(W, cfg)
        c0 = casc.cents[:, 0]
        order = np.argsort(grps, kind="stable")
        gs = grps[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        ends = np.r_[starts[1:], order.size]
        li_parts: list[np.ndarray] = []
        ri_parts: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            idx = order[s:e]
            if two_table:
                # anchors: R rows; partners: S rows.  A pair is computed in
                # the lower of the two native cells, i.e. exactly when at
                # least one end is native here (never guest x guest).
                anchors = idx[side[idx] == 0]
                pool = idx[side[idx] == 1]
            else:
                anchors = idx[nat[idx]]
                pool = idx
            if anchors.size == 0 or pool.size == 0:
                continue
            # candidate generation via a sorted window on centroid dim 0: a
            # qualifying partner must lie within reach on EVERY centroid
            # dim (Rubner), so pairs outside the dim-0 window never
            # materialize
            pool_sorted = pool[np.argsort(c0[pool], kind="stable")]
            pcs = c0[pool_sorted]
            lo = np.searchsorted(pcs, c0[anchors] - reach, side="left")
            hi = np.searchsorted(pcs, c0[anchors] + reach, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                continue
            li = np.repeat(anchors, counts)
            # vectorized window expansion (no per-anchor Python loop)
            offs = np.arange(total) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            ri = pool_sorted[np.repeat(lo, counts) + offs]
            if two_table:
                # at least one native end (pair lives in the lower native
                # cell)
                keep = nat[li] | nat[ri]
            else:
                # native partners once by id order; guest partners all
                # (guests never appear in their native cell, so no
                # self/guest dups)
                keep = np.where(nat[ri], ids[ri] > ids[li], True)
            # salted cells: this sub-group owns exactly the pairs whose
            # block pair is (gi, gj) — each pair computed in one sub-group
            gi, gj = divmod(int(gs[s]) % (max_s * max_s), max_s)
            keep &= (np.minimum(blks[li], blks[ri]) == gi) & (
                np.maximum(blks[li], blks[ri]) == gj
            )
            li, ri = li[keep], ri[keep]
            if li.size:
                li_parts.append(li)
                ri_parts.append(ri)
        if not li_parts:
            return
        li = np.concatenate(li_parts) if len(li_parts) > 1 else li_parts[0]
        ri = np.concatenate(ri_parts) if len(ri_parts) > 1 else ri_parts[0]
        if stats is not None:
            from ..kernel import CascadeStats

            st = CascadeStats()
            li, ri, emds = casc.run(li, ri, theta, stats=st, slack=cfg.slack)
            stats.update(st)
        else:
            li, ri, emds = casc.run(li, ri, theta, slack=cfg.slack)
        if li.size:
            yield _emit_pairs(ids, li, ri, emds, ordered=two_table)

    # explicit hash repartition on the group key: the exact stage is
    # CPU-quadratic per group but tiny in BYTES, so AQE's byte-based
    # coalescing would pack salted sub-groups back onto one task and
    # re-serialize the hot cell (measured: scripts/skew_bench.py).  A
    # user-specified count is exempt from AQE coalescing, and hash
    # partitioning on "grp" keeps whole-group locality for the
    # partition-local grouping in join_partition, so this adds NO extra
    # exchange — it just pins the task count.
    spark = rec1.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    allrows = allrows.repartition(n_part, "grp")
    return allrows.mapInPandas(join_partition, _PAIR_SCHEMA)


# ---------------------------------------------------------------------------
# pivot (MRSimJoin) strategy
# ---------------------------------------------------------------------------

def _pivot_join(
    rec: DataFrame,
    cfg: NdJoinConfig,
    theta: float,
    num_pivots: int,
    seed: int,
    stats: "JoinStats | None" = None,
) -> DataFrame:
    """MRSimJoin re-expressed for Spark (SURVEY.md §2.3 J6, §3.2):

    1. P pivots sampled on the driver (InputSampler.RandomSampler analog,
       mrsim/generic/MRSimJoinHD.java:379-390) — deterministic seeded
       choice of P distinct records.
    2. One mapInPandas pass computes each record's exact EMD to every pivot
       (CloudJoinBaseMapper.map:81-196 does the same); nearest pivot = base
       partition.  Generalized-hyperplane window rule: record e is
       replicated to window partition (i, j) when
       (d(e, P_far) - d(e, P_near)) / 2 <= theta (+slack) — the condition
       under which a qualifying partner can live across the boundary.
    3. groupBy(partition) + applyInPandas: base partitions join all their
       own pairs; window partitions join base-i x base-j rows only.  Each
       qualifying pair appears exactly once (same base -> base partition;
       different bases i<j -> window (i,j), where the triangle inequality
       guarantees both ends satisfy the window rule).

    The reference's 32 MB spill-and-reround loop (CloudJoinBaseReducer.java:
    150-272) is unnecessary: Spark's shuffle spills, and partition counts
    scale with P^2 windows.
    """
    P = int(num_pivots)
    piv_rows = (
        rec.select("id", "w")
        .orderBy(F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(1 << 31)))
        .limit(P)
        .collect()
    )
    PV = normalize(np.array([r["w"] for r in piv_rows], dtype=np.float64))
    reach = theta + cfg.slack
    # pivot-pivot EMD matrix (arbitrary/metric costs only): P(P-1)/2 LPs on
    # the driver buy LAESA-style bounds everywhere downstream — the pivot
    # contract already requires a METRIC cost (hyperplane windows assume the
    # triangle inequality), so |d(r, p) - d(p, q)| lower-bounds d(r, q)
    PP = None
    if cfg.rubner_ord is None and len(PV) > 1:
        from ..kernel.emd_batch import emd_exact_pairs_memo as _eepm

        Pn = len(PV)
        ii, jj = np.triu_indices(Pn, 1)
        _, pgrp = np.unique(PV, axis=0, return_inverse=True)
        es = _eepm(PV, cfg.cost, ii, jj, pgrp, {})
        PP = np.zeros((Pn, Pn))
        PP[ii, jj] = es
        PP[jj, ii] = es
    # the 1-D CDF closed form assumes |x-y| costs — Minkowski-only
    d1 = np.atleast_2d(cfg.bin_points).shape[1] == 1 and cfg.rubner_ord is not None

    pv_cents = PV @ cfg.bin_points  # (P, d) pivot centroids for the lb screen

    def dists_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if d1:
            pos = cfg.bin_points[:, 0]
            order = np.argsort(pos, kind="stable")
            dx = np.diff(pos[order])
            pv_cdf = np.cumsum(PV[:, order], axis=1)[:, :-1]  # (P, B-1)
        proj = [
            (np.argsort(np.asarray(p), kind="stable"), np.asarray(p))
            for p in cfg.proj_positions
        ]
        for pdf in it:
            W = normalize(np.stack(pdf["w"].to_numpy()).astype(np.float64))
            n = W.shape[0]
            if d1:
                cdf = np.cumsum(W[:, order], axis=1)[:, :-1]
                D = np.abs(cdf[:, None, :] - pv_cdf[None, :, :]) @ dx  # (n, P)
            else:
                # exact EMD to a pivot is an LP; most pivots are screened out
                # by vectorized lower bounds first (the reference pays the
                # full P LPs per record, CloudJoinBaseMapper.java:81-196):
                # 1. Rubner centroid distance to every pivot (one matrix op)
                # 2. projection bounds (batched cumsum tensor per projection)
                # Then per record: exact EMDs in ascending-lb order stop as
                # soon as lb > d_near (multistep argmin optimality), and the
                # window distances only need exactness when
                # lb <= d_near + 2*reach — pivots beyond that can never admit
                # a cross-boundary match, so their slot stays +inf and the
                # JVM window rule drops them for free.
                cents = W @ cfg.bin_points  # (n, d)
                from ..kernel.emd_batch import (
                    emd_exact_pairs_memo,
                    support_table,
                )

                Wall = np.vstack([W, PV])
                _, grp_all = np.unique(Wall, axis=0, return_inverse=True)
                sup_all, cnt_all = support_table(Wall)
                ngrp = int(grp_all.max()) + 1
                memo: dict = {}
                EX = np.full((n, P), np.nan)
                rows_n = np.arange(n)
                d_near = np.full(n, np.inf)
                if cfg.rubner_ord is not None:
                    LB = np.linalg.norm(
                        cents[:, None, :] - pv_cents[None, :, :],
                        ord=cfg.rubner_ord,
                        axis=2,
                    )  # (n, P)
                    for o, p_pos in proj:
                        dxp = np.diff(p_pos[o])
                        wc = np.cumsum(W[:, o], axis=1)[:, :-1]
                        pc = np.cumsum(PV[:, o], axis=1)[:, :-1]
                        pb = np.abs(wc[:, None, :] - pc[None, :, :]) @ dxp
                        np.maximum(LB, pb, out=LB)
                    # batched multi-step assignment: round t evaluates, for
                    # every record still undecided, its t-th-closest pivot
                    # BY LOWER BOUND through one stacked simplex call; a
                    # record stops when its next lb exceeds its running
                    # nearest exact distance (same optimality as the scalar
                    # loop, interpreter cost O(rounds) not
                    # O(records x pivots)).  Memo dedups duplicate
                    # histograms' LPs.
                    lb_order = np.argsort(LB, axis=1, kind="stable")
                    ptr = np.zeros(n, dtype=np.int64)
                    while True:
                        j_next = lb_order[rows_n, np.minimum(ptr, P - 1)]
                        go = (ptr < P) & (LB[rows_n, j_next] <= d_near)
                        if not go.any():
                            break
                        rr = np.flatnonzero(go)
                        jn = j_next[rr]
                        es = emd_exact_pairs_memo(
                            Wall, cfg.cost, rr, n + jn, grp_all, memo,
                            sup=sup_all, cnt=cnt_all, n_groups=ngrp,
                        )
                        EX[rr, jn] = es
                        d_near[rr] = np.minimum(d_near[rr], es)
                        ptr[rr] += 1
                    # window distances (static LB: Minkowski bounds don't
                    # tighten from solves): exactness only needed where a
                    # cross-boundary match is possible
                    cut_w = d_near[:, None] + 2.0 * reach
                    need = (LB <= cut_w) & np.isnan(EX)
                    rr, jj = np.nonzero(need)
                    if rr.size:
                        EX[rr, jj] = emd_exact_pairs_memo(
                            Wall, cfg.cost, rr, n + jj, grp_all, memo,
                            sup=sup_all, cnt=cnt_all, n_groups=ngrp,
                        )
                else:
                    # arbitrary (metric) cost: no centroid geometry, but the
                    # pivot-pivot matrix gives LAESA bounds — each solved
                    # distance d(r, p) tightens every unsolved pivot q via
                    # |d(r, p) - PP[p, q]| <= d(r, q).  Round t solves each
                    # record's current-best unsolved pivot; records stop
                    # when that bound exceeds d_near.  This replaces the
                    # round-3 behavior (all n*P LPs, the reference's own
                    # cost, CloudJoinBaseMapper.java:81-196) with ~a few
                    # LPs per record.
                    # ONE loop covers both the nearest-pivot search and the
                    # window distances: round t solves each record's
                    # cheapest-lb unsolved pivot, every solve tightens all
                    # its unsolved slots via |d(r,p) - PP[p,q]| <= d(r,q),
                    # and a record stops when that bound exceeds the DYNAMIC
                    # window cut d_near + 2*reach (pivots past it can never
                    # admit a cross-boundary match).  Solving cheapest-first
                    # under the shrinking cut is strictly cheaper than the
                    # former two-phase shape (d_near loop + one bulk solve
                    # of every slot under the INITIAL cut): each solved slot
                    # can push later slots past the cut before they are
                    # paid for.
                    LB = np.zeros((n, P))
                    while True:
                        masked = np.where(np.isnan(EX), LB, np.inf)
                        jn_all = masked.argmin(axis=1)
                        lb_next = masked[rows_n, jn_all]
                        go = np.isfinite(lb_next) & (
                            lb_next <= d_near + 2.0 * reach
                        )
                        if not go.any():
                            break
                        rr = np.flatnonzero(go)
                        jn = jn_all[rr]
                        es = emd_exact_pairs_memo(
                            Wall, cfg.cost, rr, n + jn, grp_all, memo,
                            sup=sup_all, cnt=cnt_all, n_groups=ngrp,
                        )
                        EX[rr, jn] = es
                        d_near[rr] = np.minimum(d_near[rr], es)
                        if PP is not None:
                            # NB: fancy-indexed LB[rr] is a copy — assign back
                            LB[rr] = np.maximum(
                                LB[rr], np.abs(es[:, None] - PP[jn])
                            )
                # solved slots keep their exact value (more finite
                # coordinates for the join-time LAESA screen); unsolved
                # slots have lb > d_near + 2*reach, so the true distance
                # fails the hyperplane rule and +inf drops them for free.
                # A solved slot whose exact exceeds the cut is equally
                # dropped by the JVM rule, so membership is unchanged.
                D = np.where(np.isnan(EX), np.inf, EX)
                if os.environ.get("MJS_PIVOT_PROFILE"):
                    print(
                        f"[assign-prof] n={n} slots_solved="
                        f"{int(np.isfinite(D).sum())} of {n * P}",
                        flush=True,
                    )
            base = D.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "w": pdf["w"],
                    "side": pdf["side"],
                    "base": base,
                    "dists": list(D),
                }
            )

    dist_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("w", ArrayType(DoubleType())),
            StructField("side", LongType()),
            StructField("base", LongType()),
            StructField("dists", ArrayType(DoubleType())),
        ]
    )
    # spread the assignment stage: its input is usually a persisted frame
    # whose final AQE stage coalesced to very few partitions, but the
    # per-record work here is LP-bound (exact EMDs to pivots) — measured
    # 6.7 s on ONE task at sf0.1.  A round-robin repartition of the tiny
    # (id, w) rows costs nothing next to the work it parallelizes.
    rec_in = _parallelism_floor(
        rec.select("id", "w", F.col("side").cast("long").alias("side")),
        rec.count(),  # cached by the pivot sample above: metadata-cheap
    )
    with_d = rec_in.mapInPandas(dists_part, dist_schema)
    if os.environ.get("MJS_PIVOT_PROFILE"):
        # dev-only phase split: materialize the assignment stage alone so a
        # profiler can separate its wall from the window join's (the persist
        # changes the plan, so never on by default)
        import time as _time

        with_d = with_d.persist()
        _t0 = _time.time()
        _n = with_d.count()
        print(
            f"[pivot-profile] assignment stage: {_time.time() - _t0:.2f}s "
            f"({_n} rows, P={P})",
            flush=True,
        )

    # partition keys: base partition (b, b) always; window (i, j), i<j, when
    # the hyperplane rule admits a cross-boundary match with that pivot
    db = F.element_at("dists", F.col("base").cast("int") + 1)
    keys = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(P - 1)),
            lambda o: F.when(
                o == F.col("base"),
                F.col("base") * P + F.col("base"),
            ).when(
                (F.element_at("dists", o.cast("int") + 1) - db) / 2.0 <= reach,
                F.least(F.col("base"), o) * P + F.greatest(F.col("base"), o),
            ).otherwise(F.lit(-1)),
        ),
        lambda x: x >= 0,
    )
    # arbitrary costs keep the per-pivot exact distances: they are the only
    # strong pair screen available at join time (see join_part)
    carry = ["id", "w", "base"] + (["dists"] if cfg.rubner_ord is None else [])
    expanded = with_d.select(
        *carry, F.explode(F.array_distinct(keys)).alias("grp")
    )

    def join_part(pdf: pd.DataFrame) -> pd.DataFrame:
        _prof = os.environ.get("MJS_PIVOT_PROFILE")
        if _prof:
            import time as _time

            _t0 = _time.time()
        empty = pd.DataFrame({"rid": [], "sid": [], "emd": []}).astype(
            {"rid": "int64", "sid": "int64", "emd": "float64"}
        )
        ids = pdf["id"].to_numpy()
        W = normalize(np.stack(pdf["w"].to_numpy()).astype(np.float64))
        bases = pdf["base"].to_numpy()
        grp = int(pdf["grp"].iloc[0])
        gi, gj = divmod(grp, P)
        casc = _cascade_for(W, cfg)
        if _prof:
            _t_setup = _time.time() - _t0
        # candidate generation via a sorted window on centroid dim 0: the
        # Rubner contraction means a qualifying partner lies within reach on
        # every centroid dim, so pairs outside the dim-0 window never
        # materialize.  This replaces the reference's QuickJoin recursion
        # for oversized base partitions (CloudJoinBaseReducer.java:277-436,
        # leaf 5000): an oversized or skewed partition costs
        # O(n * window) candidates, not O(n^2).
        c0 = casc.cents[:, 0]
        if gi == gj:
            anchors = np.arange(ids.size)
            pool = anchors
        else:
            anchors = np.flatnonzero(bases == gi)
            pool = np.flatnonzero(bases == gj)
            if anchors.size == 0 or pool.size == 0:
                return empty
        if cfg.rubner_ord is not None:
            # centroid dim-0 window: |d cent_0| <= reach is implied by the
            # Rubner bound for any Minkowski ground
            pool_sorted = pool[np.argsort(c0[pool], kind="stable")]
            pcs = c0[pool_sorted]
            lo = np.searchsorted(pcs, c0[anchors] - (theta + cfg.slack), side="left")
            hi = np.searchsorted(pcs, c0[anchors] + (theta + cfg.slack), side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total == 0:
                return empty
            li = np.repeat(anchors, cnt)
            # vectorized window expansion (no per-anchor Python loop)
            offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            ri = pool_sorted[np.repeat(lo, cnt) + offs]
        else:
            # arbitrary (metric) cost: no centroid geometry, but the SAME
            # sorted-window shape as the Minkowski branch applies on the
            # pivot-gi distance axis — every row of this group carries an
            # EXACT distance to pivot gi (group admission required
            # dists[gi] finite), and |d(a,P_gi) - d(b,P_gi)| <= theta is
            # necessary for any qualifying pair (triangle inequality).  So
            # candidates come from a searchsorted window instead of the
            # full anchors x pool block (measured: 14.5M block pairs ->
            # the window's near-survivor set at sf0.1, and the block
            # materialization was the join stage's largest allocation).
            # The remaining pivots then screen the window's survivors: the
            # full LAESA max lb(a,b) = max_p |d(a,p) - d(b,p)| over pivots
            # exact on BOTH sides, in fixed-size chunks so the temporaries
            # stay cache-warm instead of one giant cold allocation.
            Dp = np.stack(pdf["dists"].to_numpy()).astype(np.float64)  # (n, P)
            key = Dp[:, gi]
            reach_w = theta + cfg.slack
            if np.isfinite(key).all():
                pool_sorted = pool[np.argsort(key[pool], kind="stable")]
                pcs = key[pool_sorted]
                lo = np.searchsorted(pcs, key[anchors] - reach_w, side="left")
                hi = np.searchsorted(pcs, key[anchors] + reach_w, side="right")
                cnt = hi - lo
                total = int(cnt.sum())
                if total == 0:
                    return empty
                li = np.repeat(anchors, cnt)
                # vectorized window expansion (no per-anchor Python loop)
                offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                ri = pool_sorted[np.repeat(lo, cnt) + offs]
            else:
                # defensive: the admission rule guarantees finiteness, but a
                # full block enumeration stays correct if it ever breaks
                li = np.repeat(anchors, pool.size)
                ri = np.tile(pool, anchors.size)
            ok = np.isfinite(Dp)
            keep = np.empty(li.size, dtype=bool)
            step = max(1, (1 << 22) // max(P, 1))
            reach_pair = theta + cfg.slack
            for s in range(0, li.size, step):
                ls, rs = li[s : s + step], ri[s : s + step]
                with np.errstate(invalid="ignore"):  # inf-inf slots masked
                    diffs = np.abs(Dp[ls] - Dp[rs])
                diffs[~(ok[ls] & ok[rs])] = 0.0
                keep[s : s + step] = diffs.max(axis=1) <= reach_pair
            if stats is not None:
                stats.add("laesa_considered", li.size)
                stats.add("laesa_survivors", int(keep.sum()))
            li, ri = li[keep], ri[keep]
        if gi == gj:
            keep = ids[ri] > ids[li]  # unordered pairs once
            li, ri = li[keep], ri[keep]
        if _prof:
            _t_cand = _time.time() - _t0 - _t_setup
        if li.size == 0:
            if _prof:
                print(
                    f"[join-prof] grp={grp} n={ids.size} cand=0 "
                    f"setup={_t_setup:.3f} gen={_t_cand:.3f} casc=0.000",
                    flush=True,
                )
            return empty
        _n_cand = li.size
        if stats is not None:
            from ..kernel import CascadeStats

            st = CascadeStats()
            li, ri, emds = casc.run(li, ri, theta, stats=st, slack=cfg.slack)
            stats.update(st)
        else:
            li, ri, emds = casc.run(li, ri, theta, slack=cfg.slack)
        if _prof:
            _t_casc = _time.time() - _t0 - _t_setup - _t_cand
            print(
                f"[join-prof] grp={grp} n={ids.size} cand={_n_cand} "
                f"setup={_t_setup:.3f} gen={_t_cand:.3f} casc={_t_casc:.3f}",
                flush=True,
            )
        return _emit_pairs(ids, li, ri, emds)

    # pin the task count: same CPU-quadratic-groups-vs-byte-based-AQE
    # rationale as _grid_join (see comment there / SCALE.md skew section).
    # Round 10: the previous groupBy().applyInPandas shape forced the task
    # count to spark.sql.shuffle.partitions, which packed ~P^2/2
    # CPU-weighted groups into (cores) bins by hash — measured ~50%
    # parallel efficiency at sf0.1 (234.8 core-s of group work, 32 tasks,
    # 15-19 s of join-stage wall vs the 7.3 s ideal; worst group 6.8 s).
    # repartition(4x, "grp") + mapInPandas with a partition-local groupby
    # keeps whole-group locality (hash on grp) and hands the scheduler 4
    # bins per core to pack — same results, no second exchange, and the
    # task count no longer aliases the shuffle-partition knob.  Partition
    # memory is bounded: the concat holds one partition's (id, w, base,
    # dists) rows, ~P*P-th of total replicated rows per partition.
    spark = rec.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    target = int(min(max(P * P, 1), 4 * n_part))
    expanded = expanded.repartition(target, "grp")

    def part_runner(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [pdf for pdf in it if len(pdf)]
        if not pdfs:
            return
        allp = pd.concat(pdfs, ignore_index=True)
        for _, sub in allp.groupby("grp", sort=False):
            out = join_part(sub.reset_index(drop=True))
            if len(out):
                yield out

    return expanded.mapInPandas(part_runner, _PAIR_SCHEMA)


# ---------------------------------------------------------------------------
# block bruteforce join (oracle / fallback)
# ---------------------------------------------------------------------------

def _block_bruteforce(
    rec: DataFrame,
    cfg: NdJoinConfig,
    theta: float,
    num_blocks: int,
    two_table: bool = False,
) -> DataFrame:
    """All-pairs block join (J7 semantics, bsp/BaselineBSP.join:274-345).

    Self-join: records hash into ``num_blocks`` blocks; each unordered block
    pair (i <= j) is one applyInPandas group — a triangle of B(B+1)/2 tasks
    with B-fold replication, never a row-level cross join.  Two-table: the
    full B x B block grid, R rows fan out over rows of the grid, S rows over
    columns."""
    P = int(num_blocks)
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(P))
    rec = rec.withColumn("blk", blk)
    if two_table:
        groups = F.when(
            F.col("side") == 0,
            F.transform(F.sequence(F.lit(0), F.lit(P - 1)), lambda o: F.col("blk") * P + o),
        ).otherwise(
            F.transform(F.sequence(F.lit(0), F.lit(P - 1)), lambda o: o * P + F.col("blk"))
        )
    else:
        # record in block b participates in groups (min(b,o), max(b,o)) ∀ o
        groups = F.transform(
            F.sequence(F.lit(0), F.lit(P - 1)),
            lambda o: F.least(F.col("blk"), o) * P + F.greatest(F.col("blk"), o),
        )
    expanded = rec.select(
        "id", "w", "side", "blk", F.explode(F.array_distinct(groups)).alias("grp")
    )

    def join_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        W = normalize(np.stack(pdf["w"].to_numpy()).astype(np.float64))
        blks = pdf["blk"].to_numpy()
        side = pdf["side"].to_numpy()
        grp = int(pdf["grp"].iloc[0])
        gi, gj = divmod(grp, P)
        casc = _cascade_for(W, cfg)
        if two_table:
            left = np.flatnonzero((side == 0) & (blks == gi))
            right = np.flatnonzero((side == 1) & (blks == gj))
            li = np.repeat(left, right.size)
            ri = np.tile(right, left.size)
        elif gi == gj:
            order = np.argsort(ids, kind="stable")
            a, b = np.triu_indices(order.size, k=1)
            li, ri = order[a], order[b]
        else:
            left = np.flatnonzero(blks == gi)
            right = np.flatnonzero(blks == gj)
            li = np.repeat(left, right.size)
            ri = np.tile(right, left.size)
        li, ri, emds = casc.run(li, ri, theta, slack=cfg.slack)
        return _emit_pairs(ids, li, ri, emds, ordered=two_table)

    return expanded.groupBy("grp").applyInPandas(join_block, _PAIR_SCHEMA)


# ---------------------------------------------------------------------------
# kNN lookup
# ---------------------------------------------------------------------------

def emd_knn(
    db: DataFrame,
    queries: DataFrame,
    bin_points: np.ndarray,
    k: int = 10,
    cfg: NdJoinConfig | None = None,
    id_col: str = "id",
    w_col: str = "w",
    seed: int = 42,
    ground: str | np.ndarray = "l2",
    distributed: bool | None = None,
    collect_threshold: int = 8192,
) -> DataFrame:
    """k nearest database histograms per query under exact EMD ->
    (qid, nid, emd, rank); excludes identical-id matches.

    The reference carries an unreachable kNN guest path (Grid.getGuestForKNN,
    utils/Grid.java:60-207, SURVEY.md §2.3 J5); this is the capability done
    Spark-first.  Small query sets (<= ``collect_threshold``; the lookup
    contract) are collected + broadcast, and each database partition runs
    the optimal multi-step kNN loop — candidates sorted by Rubner lower
    bound, exact EMD evaluated in that order, and the scan stops as soon as
    the next lower bound exceeds the running kth distance (Seidl-Kriegel
    optimality: no exact computation can be saved).  Per-partition top-k
    lists then merge through one small shuffle.

    Large query sets take the NO-collect block path (``distributed=None``
    auto-detects via a limit+count probe; True forces): queries hash into
    q-blocks and replicate across db-blocks via ``cogroup().applyInPandas``
    (block counts = each side's scan partition count, so group memory stays
    bounded by maxPartitionBytes at any total size); every (q-block,
    db-block) group runs the SAME multi-step screened loop, and the global
    ranking window merges.  ``distributed=False`` on an oversized query set
    raises instead of silently bottlenecking the driver.
    """
    bin_points = np.atleast_2d(np.asarray(bin_points, dtype=np.float64))
    if bin_points.shape[0] == 1 and bin_points.shape[1] > 1:
        bin_points = bin_points.T
    if cfg is None:
        seed_rows = db.select(w_col).limit(8).collect()
        sw = np.array([r[0] for r in seed_rows], dtype=np.float64)
        cfg = build_config(bin_points, seed_weights=sw, seed=seed, ground=ground)

    from ..cache import release_on_gc

    _holds: list[DataFrame] = []
    q = queries.select(F.col(id_col).alias("id"), F.col(w_col).alias("w"))
    if distributed is None or distributed is False:
        # persist BEFORE the sizing probe (round 12, same class as the
        # auto-strategy persist in emd_join_nd): the probe and the later
        # consumer (collect, or the cogroup's q-side) would otherwise each
        # re-execute the query-side upstream chain
        q = q.persist()
        _holds.append(q)
        n_probe = q.limit(collect_threshold + 1).count()
        big = n_probe > collect_threshold
        if big and distributed is False:
            raise ValueError(
                f"emd_knn: query set exceeds collect_threshold="
                f"{collect_threshold} rows; collecting it would bottleneck "
                "the driver. Pass distributed=True (cogrouped block path) "
                "or raise collect_threshold explicitly."
            )
        distributed = big

    spark = db.sparkSession
    cost = cfg.cost
    # the 1-D CDF closed form assumes |x-y| costs — Minkowski-only
    d1 = cfg.bin_points.shape[1] == 1 and cfg.rubner_ord is not None
    if d1:
        pos = cfg.bin_points[:, 0]
        order = np.argsort(pos, kind="stable")

    proj = [
        (np.argsort(np.asarray(p), kind="stable"), np.asarray(p))
        for p in cfg.proj_positions
    ]

    def knn_block(
        qids_: np.ndarray, QW_: np.ndarray, qc_: np.ndarray, pdf: pd.DataFrame
    ) -> pd.DataFrame:
        """The screened multi-step loop for one (query block, db block)
        pair — shared verbatim by the broadcast and cogrouped paths."""
        from ..kernel.emd_batch import emd_exact_pairs_memo, support_table

        nq = len(qids_)
        ids = pdf["id"].to_numpy()
        W = normalize(np.stack(pdf["w"].to_numpy()).astype(np.float64))
        cents = W @ cfg.bin_points
        out_q, out_n, out_e = [], [], []
        if d1:
            dcdf = np.cumsum(W[:, order], axis=1)[:, :-1]
            dx = np.diff(cfg.bin_points[order, 0])
            qcdf = np.cumsum(QW_[:, order], axis=1)[:, :-1]
            pcdfs = []
        else:
            # precompute per-block projection CDFs once: the Rubner
            # ordering alone admits too many exact LPs at d>=2; maxing in
            # the (vectorized) projection bounds cuts the exact count —
            # same multi-step loop, tighter screen
            pcdfs = [
                (np.cumsum(W[:, o], axis=1)[:, :-1], np.diff(p[o]),
                 np.cumsum(QW_[:, o], axis=1)[:, :-1])
                for o, p in proj
            ]
            # combined (queries + block rows) matrix for the batched
            # exact stage: group ids dedup identical histograms (one LP
            # per distinct group pair, memo'd across queries)
            Wall = np.vstack([QW_, W])
            _, grp_all = np.unique(Wall, axis=0, return_inverse=True)
            sup_all, cnt_all = support_table(Wall)
            n_groups = int(grp_all.max()) + 1
            memo: dict = {}
        if d1:
            for qi in range(nq):
                lb = np.linalg.norm(
                    cents - qc_[qi], ord=cfg.rubner_ord, axis=1
                )  # Rubner
                o = np.argsort(lb, kind="stable")
                o = o[ids[o] != qids_[qi]]
                kth = np.inf
                heap: list[tuple[float, int]] = []
                for j in o:
                    if lb[j] > kth:
                        break  # optimal multi-step stop
                    e = float(np.abs(dcdf[j] - qcdf[qi]) @ dx)
                    heap.append((e, int(ids[j])))
                    if len(heap) >= k:
                        heap.sort()
                        heap = heap[:k]
                        kth = heap[-1][0]
                for e, nid in sorted(heap)[:k]:
                    out_q.append(int(qids_[qi]))
                    out_n.append(nid)
                    out_e.append(e)
            return pd.DataFrame({"qid": out_q, "nid": out_n, "emd": out_e})

        # d >= 2: ROUND-BASED multi-step across ALL queries at once.  The
        # per-query chunked loop cost ~2 batch-solver calls per query —
        # each call's fixed overhead (group gather, tableau setup)
        # dominated emd_knn_big's wall time.  Instead every round collects
        # each active query's next lb-ordered candidate chunk and solves
        # ONE stacked batch for the whole block; rounds needed ~ a small
        # constant, so solver-call count drops from O(queries) to O(1) per
        # block.  Same optimal stop per query (a query goes inactive when
        # its next lower bound exceeds its running kth distance).
        ndb = W.shape[0]
        LBm = np.zeros((nq, ndb))
        # query-sliced: the (slice, ndb, B) broadcast intermediates stay
        # ~tens of MB regardless of block sizes
        QS = max(1, int(8_000_000 // max(1, ndb * cfg.bin_points.shape[0])))
        for s0 in range(0, nq, QS):
            s1 = min(s0 + QS, nq)
            if cfg.rubner_ord is not None:
                LBm[s0:s1] = np.linalg.norm(
                    cents[None, :, :] - qc_[s0:s1, None, :],
                    ord=cfg.rubner_ord,
                    axis=2,
                )
            for wc, dxp, qcp in pcdfs:
                pb = np.abs(wc[None, :, :] - qcp[s0:s1, None, :]) @ dxp
                np.maximum(LBm[s0:s1], pb, out=LBm[s0:s1])
        LBm[ids[None, :] == qids_[:, None]] = np.inf  # self-matches out
        orders_q = np.argsort(LBm, axis=1, kind="stable")
        LBs = np.take_along_axis(LBm, orders_q, axis=1)
        nvalid = (np.isfinite(LBs)).sum(axis=1)
        ptr = np.zeros(nq, dtype=np.int64)
        kth_arr = np.full(nq, np.inf)
        heaps: list[list[tuple[float, int]]] = [[] for _ in range(nq)]
        CHUNK = max(64, 2 * k)
        while True:
            li_parts: list[np.ndarray] = []
            ri_parts: list[np.ndarray] = []
            for qi in range(nq):
                p0 = ptr[qi]
                lim = min(nvalid[qi], p0 + CHUNK)
                if p0 >= lim or LBs[qi, p0] > kth_arr[qi]:
                    continue
                hi = p0 + int(
                    np.searchsorted(LBs[qi, p0:lim], kth_arr[qi], "right")
                )
                if hi == p0:
                    continue
                li_parts.append(np.full(hi - p0, qi, dtype=np.int64))
                ri_parts.append(orders_q[qi, p0:hi])
                ptr[qi] = hi
            if not li_parts:
                break
            liq = np.concatenate(li_parts)
            rjj = np.concatenate(ri_parts)
            es = emd_exact_pairs_memo(
                Wall, cost, liq, nq + rjj, grp_all, memo,
                sup=sup_all, cnt=cnt_all, n_groups=n_groups,
            )
            off = 0
            for part_q, part_r in zip(li_parts, ri_parts):
                qi = int(part_q[0])
                cnt = part_q.size
                vals = es[off : off + cnt]
                off += cnt
                h = heaps[qi]
                h.extend(zip(vals.tolist(), ids[part_r].astype(int).tolist()))
                if len(h) >= k:
                    h.sort()
                    del h[k:]
                    kth_arr[qi] = h[-1][0]
        for qi in range(nq):
            for e, nid in sorted(heaps[qi])[:k]:
                out_q.append(int(qids_[qi]))
                out_n.append(nid)
                out_e.append(e)
        return pd.DataFrame({"qid": out_q, "nid": out_n, "emd": out_e})

    dbr = db.select(F.col(id_col).alias("id"), F.col(w_col).alias("w"))
    if distributed:
        # cogrouped block path: no driver materialization of either side.
        # Persist + materialize BOTH sides first (round 12): probing .rdd
        # on the unpersisted AQE chains executed their query stages (the
        # documented _parallelism_floor trap, +4.0-4.6 s per probe on the
        # sf0.1 bridge chains), and the cogroup's two branches then
        # re-executed the chains again — four upstream executions per join.
        # With the caches the chains run once each, and the counts they
        # return drive the blocking.
        lvl = q.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            q = q.persist()
            _holds.append(q)
        nq_rows = q.count()
        # db side: count WITHOUT caching — the array-column cache write
        # costs more than the one chain re-execution it would save
        # (interleaved A/B: persisting both sides read 1.11x on
        # emd_knn_big), and the count replaces the old partition probe's
        # full execution one-for-one, so the db chain still runs exactly
        # twice (count + cogroup child), never more.
        nd_rows = dbr.count()
        # ROW-count-based blocking (round 12): partition counts are the
        # wrong signal here — both AQE chains coalesce to 1 partition at
        # sf0.1, so the old scan-partition heuristic degenerated to
        # whatever the parallelism floor produced, and probing the CACHED
        # relations instead returned the 64-partition pre-coalesce shape
        # (4,096 near-empty groups, per-group overhead measured 4.2x the
        # query).  Blocks are sized so each (q-block, db-block) group holds
        # bq x bd rows with bq*bd <= _KNN_LB_ENTRIES — bounding the
        # per-group (nq, ndb) lower-bound matrix at ~32 MB — and
        # bq/bd ~ nq/nd so neither side fragments; replicated row volume
        # (nq*dcN + nd*qcN) then grows as ~sqrt of the total block work,
        # the best an all-pairs block cover can do.  The 4x-cores floor
        # keeps small inputs from landing on a handful of tasks.
        LB_ENTRIES = 1 << 22
        ratio = max(nq_rows, 1) / max(nd_rows, 1)
        bq = max(1, int((LB_ENTRIES * ratio) ** 0.5))
        bd = max(1, int((LB_ENTRIES / ratio) ** 0.5))
        qcN = max(1, -(-nq_rows // bq))
        dcN = max(1, -(-nd_rows // bd))
        par = 4 * spark.sparkContext.defaultParallelism
        if qcN * dcN < par:
            qcN = -(-par // dcN)
        # key columns LONG on both sides — int-typed exploded literals
        # silently fail to align with pmod(xxhash64)'s long in the cogroup
        q2 = q.withColumn("qc", F.pmod(F.xxhash64("id"), F.lit(qcN))).withColumn(
            "dc", F.explode(F.array(*[F.lit(i).cast("long") for i in range(dcN)]))
        )
        d2 = dbr.withColumn("dc", F.pmod(F.xxhash64("id"), F.lit(dcN))).withColumn(
            "qc", F.explode(F.array(*[F.lit(i).cast("long") for i in range(qcN)]))
        )

        def block(qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
            if not len(qpdf) or not len(dpdf):
                return pd.DataFrame({"qid": [], "nid": [], "emd": []}).astype(
                    {"qid": "int64", "nid": "int64", "emd": "float64"}
                )
            qids_ = qpdf["id"].to_numpy().astype(np.int64)
            QW_ = normalize(np.stack(qpdf["w"].to_numpy()).astype(np.float64))
            return knn_block(qids_, QW_, QW_ @ cfg.bin_points, dpdf)

        # pin the cogroup's task count: the block work is LP/CPU-bound
        # while its shuffle bytes are small, so AQE byte-coalescing packs
        # the stage onto a few tasks (measured 5 tasks / 9.9 s median on
        # emd_knn_big).  Hash partitioning both children on the keys with
        # an explicit count satisfies CoGroup's clustering requirement and
        # is exempt from coalescing.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        local = (
            q2.repartition(n_part, "qc", "dc")
            .groupBy("qc", "dc")
            .cogroup(d2.repartition(n_part, "qc", "dc").groupBy("qc", "dc"))
            .applyInPandas(block, "qid long, nid long, emd double")
        )
    else:
        qrows = q.collect()
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        QW = normalize(np.array([r[1] for r in qrows], dtype=np.float64))
        qcents = QW @ cfg.bin_points
        b_q = spark.sparkContext.broadcast((qids, QW, qcents))

        def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qids_, QW_, qc_ = b_q.value
            for pdf in it:
                if not len(pdf):
                    continue
                yield knn_block(qids_, QW_, qc_, pdf)

        local = dbr.mapInPandas(part, "qid long, nid long, emd double")
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.col("emd").asc(), F.col("nid").asc())
    out = (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "emd", "rank")
    )
    return release_on_gc(out, *_holds) if _holds else out


# ---------------------------------------------------------------------------
# top-k
# ---------------------------------------------------------------------------

def emd_topk_nd(
    hist: DataFrame,
    bin_points: np.ndarray,
    k: int,
    cfg: NdJoinConfig | None = None,
    strategy: str = "grid",
    grid: int | None = None,
    num_blocks: int = 8,
    sample_size: int | None = None,
    id_col: str = "id",
    w_col: str = "w",
    seed: int = 42,
    ground: str | np.ndarray = "l2",
    stats: "JoinStats | None" = None,
) -> DataFrame:
    """k smallest-EMD pairs -> (rank, rid, sid, emd); ties by (emd, rid, sid)
    (JoinedPair.compareTo order, utils/JoinedPair.java:45-58).

    Sample-seeded bound (QNEPreReducer.java:96-109 / HistUtil.getKEmd:
    641-652): exact EMDs over the first ``sample_size`` ids give an upper
    bound for the global kth distance; the grid threshold join at that bound
    then covers the true top-k; orderBy(emd).limit(k) merges."""
    from pyspark.sql.window import Window

    bin_points = np.atleast_2d(np.asarray(bin_points, dtype=np.float64))
    if bin_points.shape[0] == 1 and bin_points.shape[1] > 1:
        bin_points = bin_points.T
    minkowski_g = (
        cfg.rubner_ord
        if cfg is not None
        else (
            {"l1": 1.0, "l2": 2.0, "l3": 3.0}.get(ground)
            if isinstance(ground, str)
            else None
        )
    )
    if minkowski_g is None and strategy == "grid":
        strategy = "bruteforce"  # arbitrary cost: no centroid grid geometry

    rec = hist.select(F.col(id_col).cast("long").alias("id"), F.col(w_col).alias("w"))
    ctx = None
    rec_n = None
    if strategy == "grid":
        # build the theta-independent grid context FIRST (round 12, guide
        # §2.1): its fused count+boundaries agg supplies N for the
        # sample-size rule (the per-cell counts sum to it for free), its
        # cached rec1 serves the seed sample without re-running the
        # upstream chain, and cfg seeding happens inside against the cache.
        # The old order — cfg seed collect on the raw chain, persist+count
        # rec, sample rec, then build the ctx with its own count/boundary
        # jobs — paid three extra upstream-chain actions for the same
        # information.  (Sampling from the mass-filtered cache is
        # output-safe: the ceiling is an upper bound for the kth distance
        # over rows the join actually considers, and any ceiling >= the
        # true kth yields the identical top-k.)
        mass = F.aggregate(F.col("w"), F.lit(0.0), lambda a, x: a + x) > 0
        ctx = _build_grid_ctx(
            rec.where(mass).withColumn("side", F.lit(0)),
            bin_points, cfg, grid, seed=seed, ground=ground,
        )
        cfg = ctx.cfg
        rec_n = int(ctx.cs.cnt.sum())
        sample_src = ctx.rec1
    else:
        if cfg is None:
            seed_rows = hist.select(w_col).limit(8).collect()
            sw = np.array([r[0] for r in seed_rows], dtype=np.float64)
            cfg = build_config(
                bin_points, seed_weights=sw, seed=seed, ground=ground
            )
        rec = rec.persist()
        sample_src = rec

    # driver-side seed bound for the global kth distance (QNEPreReducer.java:
    # 96-109 / HistUtil.getKEmd:641-652 analog, upgraded by the batched
    # simplex): exact EMDs of MANY sampled pairs in one stacked solve — the
    # kth smallest among them is a sound AND tight ceiling for the global kth
    # distance, and the k sampled pairs realizing it are real pairs of the
    # dataset, so the single threshold join at that radius is GUARANTEED to
    # return >= k pairs.  This replaces round-2's density-guessed probe plus
    # escalation loop (an extra full join pass on a miss) with one pass —
    # the single-pass property the reference gets from per-cell rank
    # ceilings (Grid.pruneCandidates:329-350).
    from ..kernel.emd_batch import emd_exact_pairs_memo

    # seeded hash-order sample, NOT first-N-by-id: on id-clustered data the
    # first ids are near-duplicates of each other, which loosens the kth
    # ceiling and inflates the exact stage of the one grid join (round-3
    # VERDICT wrong #2).  xxhash64(id, seed) is a deterministic shuffle of
    # the id space — same ceiling tightness as a uniform random sample,
    # stable across partitionings/reruns.
    if sample_size is None:
        # derive from N, not k alone: the seed must reach the duplicate/
        # near-duplicate tail of the TABLE for the kth ceiling to be tight
        # — the r5 k-only derivation (max(500, 15k)) resolved to 500 here
        # and cost +3 s on the sf0.1 d=3 bench (ceiling too loose, grid
        # pass at an inflated radius; within-process interleaved probe:
        # 500 -> 9.0-9.8 s vs 600/750 -> 6.2-6.9 s).  8*sqrt(N) reproduces
        # the hand-tuned 600 at sf0.1 (N=5793 -> 609) and scales the seed
        # with the dup-tail mass; the 4096 cap bounds the driver-side
        # LB matrix (seeds^2/2 pairs) at any N.
        if rec_n is None:
            rec_n = rec.count()  # persisted above: cheap, reused by the sample
        sample_size = max(500, 15 * k, min(int(8.0 * rec_n**0.5), 4096))
    sample = (
        sample_src.select("id", "w")
        .orderBy(F.xxhash64(F.col("id"), F.lit(int(seed))), F.col("id"))
        .limit(max(sample_size, 4 * k))
        .collect()
    )
    SW = normalize(np.array([r["w"] for r in sample], dtype=np.float64))
    n = SW.shape[0]
    scored = None
    if n * (n - 1) // 2 < k:
        scored = _block_bruteforce(
            rec.withColumn("side", F.lit(0)), cfg, float("inf"), num_blocks
        )
    else:
        # the ceiling is the kth-smallest EXACT EMD among the sample's
        # pairs; how close we get to the sample's true kth is pure LP
        # budget.  Instead of LPing a random pair subset (round-3), rank
        # ALL sample pairs by the vectorized Rubner lower bound and solve
        # in that order with the Seidl-Kriegel stop (once the running kth
        # exact <= the next pair's lower bound, no further pair can improve
        # it) — the ceiling equals the sample's exact kth with near-minimal
        # LPs, so the single grid join runs at the tightest radius any
        # sample of this size can justify.
        iu = np.triu_indices(n, 1)
        if cfg.rubner_ord is not None:
            Csamp = SW @ cfg.bin_points
            lb = np.linalg.norm(
                Csamp[iu[0]] - Csamp[iu[1]], ord=cfg.rubner_ord, axis=1
            )
        else:
            lb = np.zeros(iu[0].size)
        order = np.argsort(lb, kind="stable")
        lb_sorted = lb[order]
        _, sgrp = np.unique(SW, axis=0, return_inverse=True)
        memo: dict = {}
        vals = np.empty(0)
        kth = np.inf
        pos = 0
        CHUNK = max(256, 4 * k)
        while pos < order.size and lb_sorted[pos] <= kth:
            hi = pos + int(
                np.searchsorted(lb_sorted[pos : pos + CHUNK], kth, "right")
            )
            idx = order[pos:hi]
            pos = hi
            if idx.size == 0:
                break
            es = emd_exact_pairs_memo(
                SW, cfg.cost, iu[0][idx], iu[1][idx], sgrp, memo
            )
            vals = np.concatenate([vals, es])
            if vals.size >= k:
                vals = np.partition(vals, k - 1)[:k]
                kth = float(vals.max())
        probe = max(float(kth), 1e-9)
        if not np.isfinite(probe):
            # degenerate sample (e.g. all-identical or NaN-mass rows) left
            # the Seidl-Kriegel loop without k finite exact EMDs: there is
            # no finite ceiling, and round(inf * 1e6) / a radius-inf grid
            # join would both blow up — fall back to the all-pairs oracle,
            # which needs no radius (round-4 ADVICE, emd_join_nd.py:1669)
            scored = _block_bruteforce(
                rec.withColumn("side", F.lit(0)), cfg, float("inf"), num_blocks
            )
    if scored is None:
        if stats is not None:
            # ceiling tightness is the whole game for the single join pass:
            # log it (micro-units; accumulators are ints) so seed-sampling
            # changes are A/B-comparable
            stats.add("seed_ceiling_micro", round(probe * 1e6))
        while True:
            if ctx is not None:
                # the quantile grid + cell screens are theta-independent:
                # built once above; the (defensive) re-probe loop reuses them
                cand = _grid_join(ctx, probe, stats=stats)
            else:
                cand = emd_join_nd(
                    rec, bin_points, probe, cfg=cfg, strategy=strategy,
                    grid=grid, num_blocks=num_blocks, stats=stats,
                )
            # ONE action (round 12): TakeOrdered answers both "are there
            # >= k pairs at this radius" (len(rows) == k) and "which are
            # the global top k" — the old persist + count() + collect
            # shape paid an extra job and a cache for the same information.
            rows = cand.orderBy("emd", "rid", "sid").limit(k).collect()
            if len(rows) >= k:
                break
            # unreachable by construction (the k seed pairs qualify at
            # probe); kept as a defensive escape hatch only
            probe = probe * 4 + 4 * cfg.slack
    else:
        # the global top-k is k rows by definition — merge on the driver
        rows = scored.orderBy("emd", "rid", "sid").limit(k).collect()
    # release every cache deterministically and return a local DataFrame so
    # no cached RDDs outlive the call
    spark = hist.sparkSession
    if ctx is not None:
        ctx.rec1.unpersist()
    if rec.is_cached:
        rec.unpersist()
    out = spark.createDataFrame(
        [(i + 1, r.rid, r.sid, float(r.emd)) for i, r in enumerate(rows)],
        "rank long, rid long, sid long, emd double",
    )
    return out.orderBy("rank")
