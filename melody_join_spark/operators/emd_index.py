"""Persisted EMD grid index: build once, range-query many times.

The reference joins two ephemeral datasets per job; a production similarity
service instead indexes the corpus ONCE and serves point/batch lookups
against it (the IVF lifecycle in ``similarity.py``, here for exact-EMD
range search).  Spark-first shape:

- **build**: the quantile-grid state (`emd_join_nd`'s stage 1-2 — centroid
  cells, per-record screen stats) materializes to parquet PARTITIONED BY
  cell, plus a tiny manifest (bin points, quantile boundaries, ground,
  dual-seed weights).  The join config rebuilds DETERMINISTICALLY from the
  manifest at load (same seeded `build_config` path as the join), so no
  python objects are ever pickled to disk.
- **search**: each query computes its reachable cell set from the stored
  boundaries (the same Rubner contraction the join's guest screen uses);
  the scan carries a literal ``cell IN (...)`` filter, so a disk-backed
  index reads ONLY the reachable partitions (PartitionFilters — the EMD
  analog of `ivf_search`'s probed lists, plan-asserted in
  tests/test_plans.py).  Candidates then run the standard screen cascade +
  batched exact stage via one mapInPandas, queries broadcast (the lookup
  contract; `emd_knn`/`emd_join_nd` remain the scale paths for huge query
  sides).

Reference parity note: the reference has no persisted-index surface at all
(SURVEY.md §2.1 — every job re-reads histogram text); this generalizes its
stage 1-2 artifacts (NEPreMapper side files) into a reusable on-disk index.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import normalize
from .emd_join_nd import (
    NdJoinConfig,
    _centroid_cols,
    _grid_boundaries,
    _parallelism_floor,
    build_config,
)

__all__ = ["EmdIndex", "emd_index_build", "emd_index_load", "emd_index_search"]


class EmdIndex:
    """A built index: cell-partitioned record relation + grid geometry +
    the deterministic config recipe."""

    def __init__(
        self,
        records: DataFrame,
        bnds: np.ndarray,
        cfg: NdJoinConfig,
        grid: int,
    ):
        self.records = records  # (id, w, cent_0..d-1, cell)
        self.bnds = bnds        # (d, grid-1) quantile boundaries
        self.cfg = cfg
        self.grid = grid


def _cell_expr(bnds: np.ndarray, grid: int) -> F.Column:
    d = bnds.shape[0]
    cell = F.lit(0)
    for k in range(d):
        idx_k = F.lit(0)
        for b in bnds[k]:
            idx_k = idx_k + F.when(F.col(f"cent_{k}") >= float(b), 1).otherwise(0)
        cell = cell * grid + idx_k
    return cell.cast("long")


def emd_index_build(
    hist: DataFrame,
    bin_points: np.ndarray,
    path: str,
    grid: int = 8,
    id_col: str = "id",
    w_col: str = "w",
    seed: int = 42,
    ground: str = "l2",
) -> EmdIndex:
    """Index ``hist`` under the quantile grid and persist to ``path``:
    ``<path>/v_<build_id>/records`` (parquet PARTITIONED BY cell) +
    ``.../manifest`` (bin points, boundaries, dual-seed weights, ground,
    grid), committed by atomically flipping ``<path>/CURRENT``.  Minkowski
    grounds only (the grid needs centroid geometry, like the join)."""
    if not isinstance(ground, str):
        raise ValueError("emd_index_build requires a Minkowski ground")
    bin_points = np.atleast_2d(np.asarray(bin_points, dtype=np.float64))
    if bin_points.shape[0] == 1 and bin_points.shape[1] > 1:
        bin_points = bin_points.T
    d = bin_points.shape[1]
    spark = hist.sparkSession

    mass = F.aggregate(F.col(w_col), F.lit(0.0), lambda a, x: a + x) > 0
    rec = hist.where(mass).select(
        F.col(id_col).cast("long").alias("id"), F.col(w_col).alias("w")
    )
    rec0 = _centroid_cols(rec, bin_points, "w").persist()
    bnds = _grid_boundaries(rec0, d, grid)
    # deterministic dual seeds: hash-ordered sample, stored in the manifest
    # so load() rebuilds the IDENTICAL config
    seed_rows = (
        rec0.select("w")
        .orderBy(F.xxhash64(F.col("w").cast("string")), "w")
        .limit(8)
        .collect()
    )
    sw = np.array([r[0] for r in seed_rows], dtype=np.float64)

    # full-data digest (round-6 ADVICE, emd_index.py:149): the boundaries
    # and the 8-row seed sample are DERIVED summaries — appending rows to a
    # large or duplicate-heavy table can leave both unchanged, and a
    # manifest keyed only on them would short-circuit the rebuild and
    # silently serve stale records.  One order-independent JVM agg over the
    # already-persisted rec0 (count + sum of per-row xxhash64(id, w))
    # guarantees the build id moves whenever the data does, while
    # genuinely-identical inputs still short-circuit.  The sum runs in
    # decimal(38,0) so it never wraps/overflows regardless of row count.
    dig = rec0.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("id", "w").cast("decimal(38,0)")).alias("s"),
    ).first()
    manifest = {
        "grid": grid,
        "d": d,
        "seed": seed,
        "ground": ground,
        "bin_points": bin_points.tolist(),
        "bnds": bnds.tolist(),
        "seed_weights": sw.tolist(),
        "data_digest": [int(dig["n"]), str(dig["s"])],
    }
    # build id = digest of the manifest (params + data-derived boundaries/
    # seeds): records + manifest land together under a versioned subdir and
    # become visible only when the CURRENT pointer flips — a crash mid-build
    # leaves the previous build fully intact instead of pairing new cell
    # assignments with a stale manifest (round-4 ADVICE, emd_index.py:126).
    # Same inputs -> same id, so rebuilds are idempotent.
    build_id = hashlib.md5(
        json.dumps(manifest, sort_keys=True).encode()
    ).hexdigest()[:12]
    manifest["build_id"] = build_id
    vdir = f"{path}/v_{build_id}"

    # idempotent rebuild: if CURRENT already points at this exact build_id
    # (same params + same data-derived boundaries/seeds) the committed
    # build IS the requested one — rewriting mode('overwrite') into the
    # very directory CURRENT references would un-commit it mid-write and a
    # crash would leave CURRENT dangling (round-5 ADVICE, emd_index.py:146)
    cur = os.path.join(_local_root(path), "CURRENT")
    if os.path.exists(cur):
        with open(cur) as fh:
            if fh.read().strip() == build_id:
                rec0.unpersist()
                return emd_index_load(spark, path)

    # parallelism floor AFTER rec0 is materialized (the boundary agg and
    # seed sample above scan it): a small-but-dense table arriving as ONE
    # byte-sized scan split would otherwise serialize the partitioned-by-
    # cell write into a single task; probing the cached relation costs no
    # extra upstream execution (see emd_join_nd._build_grid_ctx)
    out = _parallelism_floor(rec0, rec0.count()).withColumn(
        "cell", _cell_expr(bnds, grid)
    )
    out.write.mode("overwrite").partitionBy("cell").parquet(f"{vdir}/records")
    rec0.unpersist()
    spark.createDataFrame(
        [(json.dumps(manifest),)], "manifest string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{vdir}/manifest")
    # atomic commit (POSIX rename; on object stores substitute a conditional
    # put of the pointer object)
    root = _local_root(path)
    tmp = os.path.join(root, ".CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(build_id)
    os.replace(tmp, os.path.join(root, "CURRENT"))
    return emd_index_load(spark, path)


def _local_root(path: str) -> str:
    """Driver-local filesystem root for the CURRENT pointer.

    The pointer commit uses POSIX rename, which only exists on a local
    (or file:) path.  A non-file scheme (hdfs://, s3a://...) would
    silently read/write a bogus driver-local path — the load would fall
    back to the legacy flat layout and the build would "commit" a pointer
    Spark never sees — so refuse loudly (round-5 ADVICE, emd_index.py:155).
    Object-store deployments should route the pointer through Hadoop FS /
    a conditional put; the parquet payloads themselves are scheme-agnostic.
    """
    if path.startswith("file:"):
        return path[len("file:"):]
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme:
        raise ValueError(
            f"emd_index: CURRENT-pointer commit requires a local or file: "
            f"index path; got scheme {scheme!r} ({path}). Route the pointer "
            "through Hadoop FS APIs for object stores."
        )
    return path


def emd_index_load(spark: SparkSession, path: str) -> EmdIndex:
    """Load an index persisted by :func:`emd_index_build`: resolve the
    CURRENT pointer to the committed versioned subdir, verify the embedded
    build id, and rebuild the join config deterministically from the
    manifest.  Falls back to the pre-versioned flat layout if no pointer
    exists."""
    cur = os.path.join(_local_root(path), "CURRENT")
    build_id = None
    base = path
    if os.path.exists(cur):
        with open(cur) as fh:
            build_id = fh.read().strip()
        base = f"{path}/v_{build_id}"
    m = json.loads(
        spark.read.parquet(f"{base}/manifest").first()["manifest"]
    )
    if build_id is not None and m.get("build_id") != build_id:
        raise ValueError(
            f"emd_index_load: CURRENT points at build {build_id} but the "
            f"manifest there claims {m.get('build_id')!r} — index is "
            "inconsistent; rebuild."
        )
    bin_points = np.array(m["bin_points"], dtype=np.float64)
    cfg = build_config(
        bin_points,
        seed_weights=np.array(m["seed_weights"], dtype=np.float64),
        seed=int(m["seed"]),
        ground=m["ground"],
    )
    bnds = np.array(m["bnds"], dtype=np.float64)
    return EmdIndex(
        spark.read.parquet(f"{base}/records"), bnds, cfg, int(m["grid"])
    )


def emd_index_search(
    index: EmdIndex,
    queries: DataFrame,
    threshold: float,
    id_col: str = "id",
    w_col: str = "w",
    collect_threshold: int = 8192,
) -> DataFrame:
    """Range search: every (qid, nid, emd) with EMD <= threshold (+slack),
    id-equal matches excluded.  The reachable-cell union of all queries
    becomes a literal ``cell IN (...)`` scan filter — partition pruning on
    the disk-backed index — then ONE mapInPandas runs the screen cascade +
    batched exact stage against the broadcast query block.  Query sets over
    ``collect_threshold`` are rejected (use ``emd_join_nd(other=...)`` /
    ``emd_knn(distributed=True)`` for table-scale query sides)."""
    from ..kernel.cascade import EmdCascade

    cfg, bnds, grid = index.cfg, index.bnds, index.grid
    d = bnds.shape[0]
    n_probe = queries.limit(collect_threshold + 1).count()
    if n_probe > collect_threshold:
        raise ValueError(
            f"emd_index_search: query set exceeds collect_threshold="
            f"{collect_threshold}; use emd_join_nd(other=...) or "
            "emd_knn(distributed=True) for table-scale query sides."
        )
    qrows = queries.select(id_col, w_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    QW = normalize(np.array([r[1] for r in qrows], dtype=np.float64))
    qc = QW @ cfg.bin_points

    # reachable cells per dim via the boundary arrays (the join's guest
    # window math), unioned across queries
    reach = float(threshold) + cfg.slack
    lo_edges = [np.concatenate(([-np.inf], bnds[k])) for k in range(d)]
    hi_edges = [np.concatenate((bnds[k], [np.inf])) for k in range(d)]
    cells: set[int] = set()
    for qi in range(qc.shape[0]):
        ranges = []
        for k in range(d):
            jlo = int(np.searchsorted(hi_edges[k], qc[qi, k] - reach, "left"))
            jhi = int(np.searchsorted(lo_edges[k], qc[qi, k] + reach, "right"))
            ranges.append(range(jlo, jhi))
        idxs = [0] * d
        # cartesian expansion of the per-dim windows (small: windows are a
        # few cells wide per dim)
        def rec_expand(k: int, acc: int) -> None:
            if k == d:
                cells.add(acc)
                return
            for j in ranges[k]:
                rec_expand(k + 1, acc * grid + j)

        rec_expand(0, 0)
    probe_cells = sorted(cells)

    spark = index.records.sparkSession
    b_q = spark.sparkContext.broadcast((qids, QW, qc))
    cost = cfg.cost

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, QW_, qc_ = b_q.value
        nq = len(qids_)
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            W = normalize(np.stack(pdf["w"].to_numpy()).astype(np.float64))
            # ONE cascade over [queries; partition rows]: the full screen
            # stack + batched exact stage, exactly like the join's in-cell
            # verify, with all query pairs stacked into one candidate list
            Wall = np.vstack([QW_, W])
            casc = EmdCascade(
                weights=Wall,
                cost=cost,
                bin_points=cfg.bin_points,
                proj_positions=cfg.proj_positions,
                duals=cfg.duals,
                reductions=cfg.reductions,
                rubner_ord=cfg.rubner_ord,
                metric_cost=cfg.metric_cost,
            )
            li_parts, ri_parts = [], []
            for qi in range(nq):
                if cfg.rubner_ord is not None:
                    lb = np.linalg.norm(
                        casc.cents[nq:] - qc_[qi], ord=cfg.rubner_ord, axis=1
                    )
                    cand = np.flatnonzero((lb <= reach) & (ids != qids_[qi]))
                else:
                    cand = np.flatnonzero(ids != qids_[qi])
                if cand.size:
                    li_parts.append(np.full(cand.size, qi, dtype=np.int64))
                    ri_parts.append(cand + nq)
            if not li_parts:
                continue
            li, ri, emds = casc.run(
                np.concatenate(li_parts),
                np.concatenate(ri_parts),
                float(threshold),
                slack=cfg.slack,
            )
            yield pd.DataFrame(
                {
                    "qid": qids_[li],
                    "nid": ids[ri - nq],
                    "emd": emds,
                }
            )

    pruned = index.records.where(F.col("cell").isin(probe_cells))
    return pruned.select("id", "w").mapInPandas(
        part, "qid long, nid long, emd double"
    )
