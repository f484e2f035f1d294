"""Embedding similarity search: cosine threshold join + top-k ANN.

Spark-first design:
- ``cosine_expr``: the pair cosine as a JVM-side SQL expression over
  double-cast arrays (sequential aggregate -> bit-stable vs the DuckDB
  oracle's list_sum formulation).
- ``cosine_pairs``: brute-force threshold self-join (correctness oracle) —
  crossJoin + expression; fine to ~10^4 vectors.
- ``cosine_topk``: exact top-k neighbors per query via per-partition numpy
  matmul (mapInPandas over the database side with the query block broadcast)
  + distributed TakeOrdered merge — the scalable brute-force baseline.
- ``lsh_cosine_pairs``: random-hyperplane LSH bucketing (sign sketch,
  banded like SimHash) -> candidate equi-join -> exact verification.
  EXPLICIT-only: measured second to IVF at 20k/100k and DNF at 10^6 on a
  single node (candidate-shuffle bound); its linear candidate volume is
  a cluster-shuffle-bandwidth bet, not the default (SCALE.md round 7).
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger("melody_join_spark.similarity")

__all__ = [
    "cosine_expr",
    "cosine_pairs",
    "cosine_topk",
    "lsh_cosine_pairs",
    "ivf_cosine_pairs",
    "ivf_topk",
    "IvfIndex",
    "ivf_build",
    "ivf_load",
    "ivf_search",
    "similar_pairs",
    "choose_similarity_method",
    "derive_nlist",
    "derive_nprobe",
]


def _as_double(col: str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _norm_expr(v: str) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def cosine_expr(va: str = "va", vb: str = "vb", na: str = "na", nb: str = "nb") -> Column:
    """cos = dot(va, vb) / (na * nb) with precomputed norms."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return dot / (F.col(na) * F.col(nb))


def _sides(emb: DataFrame, id_col: str, vec_col: str) -> tuple[DataFrame, DataFrame]:
    e = emb.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    ).withColumn("nrm", _norm_expr("v"))
    a = e.select(F.col("id").alias("rid"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("id").alias("sid"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return a, b


# Pair evaluations one exact cross-join task should hold: ~2e6 dim<=64 dot
# products keeps a task in the tens-of-ms band (measured: sf0.1's 6.4k
# vectors = 2.0e7 pairs over 32 tasks ~ 1 s total), small enough for AQE /
# speculation to absorb stragglers without per-task overhead dominating.
_CROSS_PAIRS_PER_TASK = 2_000_000
# ... but never more than this many task WAVES per core: past the point
# where every core has 8 tasks queued, extra splits only add scheduler and
# Arrow-batch overhead (the skew-resilience payoff has flattened).
_CROSS_MAX_WAVES = 8


def _cross_width(spark, n: int | None = None) -> int:
    """Task width for the exact all-pairs cross join — derived, never
    hard-coded (round-8 VERDICT next #5: a literal 32 was a cluster-wide
    parallelism ceiling once ``recall_target>=1.0`` started routing up to
    10^6 vectors here).  Floor = ``defaultParallelism`` (every core gets
    work on any cluster size); when the caller knows N, widen toward one
    task per ``_CROSS_PAIRS_PER_TASK`` pair evaluations, capped at
    ``_CROSS_MAX_WAVES`` waves so a 10^6-vector exact join becomes many
    bounded tasks instead of 32 monsters — on local[32] every driver/bench
    shape (N <= ~11k) resolves to exactly the old width of 32, so walls
    and hashes are unchanged where it was already right."""
    dp = int(spark.sparkContext.defaultParallelism)
    if n is None:
        return dp
    need = -(-(n * n // 2) // _CROSS_PAIRS_PER_TASK)
    return int(min(max(dp, need), _CROSS_MAX_WAVES * dp))


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold -> (rid, sid, cosine).  Brute-force
    cross join — the correctness oracle for the LSH variant.  ``n`` (row
    count, when the caller already knows it — :func:`similar_pairs` passes
    its dispatch count through) sizes the task width via
    :func:`_cross_width`; results never depend on it."""
    a, b = _sides(emb, id_col, vec_col)
    width = _cross_width(emb.sparkSession, n)
    pairs = a.repartition(width).crossJoin(b).where(F.col("rid") < F.col("sid"))
    return pairs.select("rid", "sid", cosine_expr().alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def cosine_pairs_oracle_sql(
    threshold: float,
    dim: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    return f"""
WITH e AS (
  SELECT {id_col} AS id, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
n AS (SELECT id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
SELECT a.id AS rid, b.id AS sid,
       list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]))
         / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.id < b.id
WHERE list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]))
        / (a.nrm * b.nrm) >= {threshold}"""


def _rank_topk(local: DataFrame, k: int, round_to: int | None) -> DataFrame:
    """Global merge of per-block top-k candidates: optional rounding (de-
    couples ranking from last-ulp matmul/fold differences), then one ranking
    window keyed on qid — ties resolve by nid."""
    from pyspark.sql.window import Window

    if round_to is not None:
        local = local.withColumn("cosine", F.round("cosine", round_to))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def _cosine_topk_blocked(
    emb: DataFrame,
    q: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    round_to: int | None,
    q_blocks: int | None = None,
    db_blocks: int | None = None,
    fold_exact: bool = False,
) -> DataFrame:
    """Distributed exact top-k: block-matrix matmul over a cogroup of
    (q-block x db-block) pairs.  No driver-side materialization of either
    side (see :func:`cosine_topk` docstring for the scale argument).

    ``fold_exact`` replaces the blocked matmul with sequential left-fold
    accumulation over the dimension index — bit-identical to the SQL
    ``aggregate(zip_with(...)) / (na*nb)`` formulation and the DuckDB
    ``list_sum`` oracle, so results can be hash-compared WITHOUT rounding;
    local selection then sorts by (cosine desc, nid asc), the exact global
    tie order, so exact-duplicate vectors never drop nondeterministically
    at the block boundary.  ~3x the matmul's constant; same asymptotics."""
    from ..cache import release_on_gc
    from .dedup import _spread

    db = emb.select(F.col(id_col).alias("nid"), _as_double(vec_col).alias("v"))
    # Persist + count the query side BEFORE any sizing (round 12): the old
    # .rdd partition probes executed the query-synthesis chain once each
    # (two 1-task serial stages, 1.6 s + 0.9 s on cosine_topk_big's
    # single-file scan), and the cogroup's q-branch then re-ran it again.
    # _spread first so the synthesis materializes into the cache at full
    # width instead of on the scan's single split.  The db side is counted
    # only (column-pruned parquet count ~ metadata) — caching the vector
    # payload costs more than the one re-execution it saves (measured on
    # the emd_knn cogroup, same shape).
    q = _spread(q).persist()
    nq_rows = q.count()
    nd_rows = db.count()
    # ROW-count-based blocking (round 12): partition counts were the wrong
    # signal — AQE coalesces these chains to one partition locally, so the
    # old heuristic degenerated to whatever the parallelism floor made of
    # it.  Size blocks so each (q-block, db-block) group's score matrix
    # stays ~32 MB with bq/bd ~ nq/nd (see emd_knn for the replication
    # argument).
    S_ENTRIES = 1 << 22
    ratio = max(nq_rows, 1) / max(nd_rows, 1)
    bq = max(1, int((S_ENTRIES * ratio) ** 0.5))
    bd = max(1, int((S_ENTRIES / ratio) ** 0.5))
    qcN = max(1, q_blocks or -(-nq_rows // bq))
    dcN = max(1, db_blocks or -(-nd_rows // bd))
    # floor the group count at 4x cluster parallelism: small inputs would
    # otherwise yield 1x1 blocks — one giant group on one core — and
    # CPU-dense matmul groups need slack for balance.  Scale the QUERY
    # axis (replicating queries across db blocks is the cheap direction
    # when queries outnumber lists).
    par = 4 * q.sparkSession.sparkContext.defaultParallelism
    if q_blocks is None and qcN * dcN < par:
        qcN = -(-par // dcN)

    # NB: both key columns must be LONG on both sides — pmod(xxhash64) is
    # long, and int-typed exploded literals would silently fail to align in
    # the cogroup (keys compare by type+value)
    q2 = q.withColumn("qc", F.pmod(F.xxhash64("qid"), F.lit(qcN))).withColumn(
        "dc", F.explode(F.array(*[F.lit(i).cast("long") for i in range(dcN)]))
    )
    d2 = db.withColumn("dc", F.pmod(F.xxhash64("nid"), F.lit(dcN))).withColumn(
        "qc", F.explode(F.array(*[F.lit(i).cast("long") for i in range(qcN)]))
    )

    def block(qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(dpdf):
            return pd.DataFrame({"qid": [], "nid": [], "cosine": []}).astype(
                {"qid": "int64", "nid": "int64", "cosine": "float64"}
            )
        qids = qpdf["qid"].to_numpy()
        Q = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
        ids = dpdf["nid"].to_numpy()
        V = np.stack(dpdf["v"].to_numpy()).astype(np.float64)
        kk = min(k + 1, V.shape[0])  # +1 headroom for self-match removal
        if fold_exact:
            dim = Q.shape[1]
            S = np.zeros((Q.shape[0], V.shape[0]))
            nq2 = np.zeros(Q.shape[0])
            nv2 = np.zeros(V.shape[0])
            for j in range(dim):  # left-fold order == SQL aggregate/list_sum
                S += Q[:, j : j + 1] * V[None, :, j]
                nq2 += Q[:, j] * Q[:, j]
                nv2 += V[:, j] * V[:, j]
            S = S / (np.sqrt(nq2)[:, None] * np.sqrt(nv2)[None, :])
            rows_q, rows_n, rows_c = [], [], []
            for qi in range(Q.shape[0]):
                row = S[qi]
                idx = np.lexsort((ids, -row))[:kk]  # global tie order
                rows_q.append(np.full(idx.size, qids[qi]))
                rows_n.append(ids[idx])
                rows_c.append(row[idx])
            out = pd.DataFrame(
                {
                    "qid": np.concatenate(rows_q),
                    "nid": np.concatenate(rows_n),
                    "cosine": np.concatenate(rows_c),
                }
            )
            return out[out.qid != out.nid]
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = Qn @ Vn.T  # (q, n)
        idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        out = pd.DataFrame(
            {
                "qid": np.repeat(qids, kk),
                "nid": ids[idx].ravel(),
                "cosine": np.take_along_axis(S, idx, axis=1).ravel(),
            }
        )
        return out[out.qid != out.nid]

    # pin the cogroup's task count against AQE byte-coalescing (matmul work
    # is CPU-dense per byte; see emd_knn's identical note)
    n_part = int(
        q.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    local = (
        q2.repartition(n_part, "qc", "dc")
        .groupBy("qc", "dc")
        .cogroup(d2.repartition(n_part, "qc", "dc").groupBy("qc", "dc"))
        .applyInPandas(block, "qid long, nid long, cosine double")
    )
    return release_on_gc(_rank_topk(local, k, round_to), q)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    round_to: int | None = None,
    distributed: bool | None = None,
    collect_threshold: int = 8192,
    fold_exact: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query -> (qid, nid, cosine,
    rank); excludes self-matches (qid == nid).

    Two physical strategies, picked by query-set size (``distributed=None``
    probes with a cheap ``limit(collect_threshold+1).count()``; pass
    True/False to force):

    - **lookup** (small query set): the query block is collected and
      broadcast into a ``mapInPandas`` over the database partitions; each
      partition computes a (q x block) matmul in numpy and emits its local
      top-k — no shuffle of the database side at all.
    - **distributed** (large query set): NO driver collect — the classic
      block-matrix algorithm via ``cogroup().applyInPandas``: queries hash
      into ``qcN`` blocks and replicate across ``dcN`` database blocks (and
      vice versa), every (q-block, db-block) group runs one numpy matmul
      and emits its local top-k, and the global ranking window merges.
      Block counts default to each side's scan partition count, so group
      memory stays ~2 x ``spark.sql.files.maxPartitionBytes`` no matter the
      total size; shuffle volume is Q*dcN + N*qcN rows — the unavoidable
      replication of an exact all-pairs top-k, with no driver in the path.

    A query set over ``collect_threshold`` with ``distributed=False`` is
    rejected with a clear error instead of silently bottlenecking the
    driver."""
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    q = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("qv")
    )
    if distributed is None or distributed is False:
        n_probe = q.limit(collect_threshold + 1).count()
        big = n_probe > collect_threshold
        if big and distributed is False:
            raise ValueError(
                f"cosine_topk: query set exceeds collect_threshold="
                f"{collect_threshold} rows; collecting it would bottleneck "
                "the driver. Pass distributed=True (block-matrix path) or "
                "raise collect_threshold explicitly."
            )
        distributed = big
    if distributed:
        return _cosine_topk_blocked(
            emb, q, k, id_col, vec_col, round_to, fold_exact=fold_exact
        )
    qrows = q.collect()
    qids = np.array([r[0] for r in qrows])
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    spark = emb.sparkSession
    b_q = spark.sparkContext.broadcast((qids, Qn))

    db = emb.select(F.col(id_col).alias("nid"), _as_double(vec_col).alias("v"))

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Qn_ = b_q.value
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf["nid"].to_numpy()
            V = np.stack(pdf["v"].to_numpy())
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Qn_ @ Vn.T  # (q, n)
            kk = min(k + 1, S.shape[1])  # +1 headroom for self-match removal
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            out = pd.DataFrame(
                {
                    "qid": np.repeat(qids_, kk),
                    "nid": ids[idx].ravel(),
                    "cosine": np.take_along_axis(S, idx, axis=1).ravel(),
                }
            )
            yield out[out.qid != out.nid]

    local = db.mapInPandas(part, "qid long, nid long, cosine double")
    return _rank_topk(local, k, round_to)


def _spherical_kmeans(X: np.ndarray, nlist: int, iters: int, seed: int) -> np.ndarray:
    """Seeded spherical k-means on unit vectors (driver-side, sample-sized).
    Returns (nlist, d) unit centroids."""
    rng = np.random.default_rng(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=min(nlist, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = (Xn @ C.T).argmax(axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                v = Xn[m].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    C[c] = v / n
    return C


def _ivf_codebook(
    emb: DataFrame,
    nlist: int,
    id_col: str,
    vec_col: str,
    kmeans_sample: int,
    kmeans_iters: int,
    seed: int,
) -> np.ndarray:
    """Seeded spherical-kmeans codebook over a deterministic HASH-ordered
    sample — shared by :func:`ivf_build` and :func:`ivf_cosine_pairs`.

    Not limit()'s partition order: on id- or time-clustered tables the
    first rows are correlated, which skews the codebook (the round-3 top-k
    seed lesson applied here); md5 keeps the order reproducible in pure
    python for the spec fixture.  The sample is the kmeans_sample SMALLEST
    md5 keys — but ranked via a scan-side hash-prefix filter that keeps
    ~4x the needed rows first, so the sort ranks O(sample) rows instead of
    a full-table TakeOrdered (round-4 VERDICT wrong #1: a full pass +
    global top-K of vector rows for an O(sample) need).  The filtered set
    provably contains the global top-kmeans_sample keys whenever it has
    >= kmeans_sample rows (the md5-string order agrees with the numeric
    prefix order), so the codebook is BIT-IDENTICAL to the unfiltered
    formulation."""
    key = F.md5(F.col(id_col).cast("string"))
    src = emb.select(id_col, vec_col)
    n = emb.count()  # parquet metadata count: no vector bytes read
    rows = None
    if n > 4 * kmeans_sample:
        cut = 4.0 * kmeans_sample / n
        pref = (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("double")
            / F.lit(float(1 << 32))
        )
        rows = (
            src.where(pref < cut)
            .orderBy(key, F.col(id_col))
            .limit(kmeans_sample)
            .collect()
        )
        if len(rows) < kmeans_sample:
            rows = None  # astronomically unlucky hash draw: exact fallback
    if rows is None:
        rows = src.orderBy(key, F.col(id_col)).limit(kmeans_sample).collect()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return _spherical_kmeans(X, nlist, kmeans_iters, seed)


class IvfIndex:
    """A built IVF index: the coarse codebook (unit row centroids) + the
    inverted-list relation (nid, v, list_id).  Build once with
    :func:`ivf_build` (optionally persisted), query many times with
    :func:`ivf_search` — the production ANN lifecycle, vs the one-shot
    :func:`ivf_topk` convenience wrapper."""

    def __init__(self, codebook: np.ndarray, lists: DataFrame):
        self.codebook = codebook
        self.lists = lists


def ivf_build(
    emb: DataFrame,
    nlist: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_sample: int = 4096,
    kmeans_iters: int = 5,
    seed: int = 42,
    path: str | None = None,
) -> IvfIndex:
    """Build the IVF index: spherical-kmeans codebook on a driver-side
    sample (broadcast), then ONE narrow mapInPandas pass assigns every
    vector to its nearest-centroid inverted list.

    ``path`` persists the index: the list relation as parquet PARTITIONED
    BY list_id — so a later :func:`ivf_search` reads only the probed
    lists' files (partition pruning: ~nprobe/nlist of the bytes, visible
    as PartitionFilters in the scan) — plus the codebook as a tiny
    parquet table.  Load with :func:`ivf_load`.
    """
    C = _ivf_codebook(
        emb, nlist, id_col, vec_col, kmeans_sample, kmeans_iters, seed
    )
    spark = emb.sparkSession
    b_c = spark.sparkContext.broadcast(C)

    db = emb.select(F.col(id_col).alias("nid"), _as_double(vec_col).alias("v"))

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C_ = b_c.value
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy())
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            lst = (Vn @ C_.T).argmax(axis=1)
            yield pd.DataFrame(
                {"nid": pdf["nid"], "v": pdf["v"], "list_id": lst}
            )

    db_lists = db.mapInPandas(assign, "nid long, v array<double>, list_id long")
    if path is None:
        return IvfIndex(C, db_lists)
    db_lists.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )
    cb = spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(C.shape[0])],
        "list_id long, center array<double>",
    )
    cb.write.mode("overwrite").parquet(f"{path}/codebook")
    return ivf_load(spark, path)


def ivf_load(spark, path: str) -> IvfIndex:
    """Load an index persisted by :func:`ivf_build(path=...)`."""
    cb_rows = spark.read.parquet(f"{path}/codebook").orderBy("list_id").collect()
    C = np.array([r.center for r in cb_rows], dtype=np.float64)
    return IvfIndex(C, spark.read.parquet(f"{path}/lists"))


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    round_to: int | None = None,
    distributed: bool | None = None,
    collect_threshold: int = 8192,
) -> DataFrame:
    """Query a built index -> (qid, nid, cosine, rank): each query probes
    its ``nprobe`` nearest lists.  Excludes self-matches.

    Small query sets (<= ``collect_threshold``; the lookup contract) are
    collected: the probe relation is built on the driver, broadcast into
    the candidate join, and carries a literal list_id IN (...) filter so a
    disk-backed index scans only the probed partitions (PartitionFilters).

    Large query sets take the NO-collect path (``distributed=None``
    auto-detects; True forces): probe assignment runs as a ``mapInPandas``
    over the query partitions against the broadcast codebook (the codebook
    is nlist x d — tiny by construction), and candidates come from a plain
    equi-join on list_id, where AQE sizes the exchange; with a disk-backed
    index, runtime DPP can still prune unprobed list partitions.
    ``distributed=False`` on an oversized query set raises instead of
    silently bottlenecking the driver."""
    spark = index.lists.sparkSession
    C = index.codebook
    q = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("qv")
    )
    if distributed is None or distributed is False:
        n_probe_rows = q.limit(collect_threshold + 1).count()
        big = n_probe_rows > collect_threshold
        if big and distributed is False:
            raise ValueError(
                f"ivf_search: query set exceeds collect_threshold="
                f"{collect_threshold} rows; collecting it would bottleneck "
                "the driver. Pass distributed=True (mapInPandas probe "
                "assignment) or raise collect_threshold explicitly."
            )
        distributed = big

    np_eff = min(nprobe, C.shape[0])
    if distributed:
        b_c = spark.sparkContext.broadcast(C)

        def assign_probes(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C_ = b_c.value
            for pdf in it:
                if not len(pdf):
                    continue
                Q = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
                qn = np.linalg.norm(Q, axis=1)
                Qn = Q / np.maximum(qn[:, None], 1e-12)
                pl = np.argsort(-(Qn @ C_.T), axis=1)[:, :np_eff]
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(pdf["qid"].to_numpy(), np_eff),
                        "qv": np.repeat(pdf["qv"].to_numpy(), np_eff),
                        "qn": np.repeat(qn, np_eff),
                        "list_id": pl.ravel(),
                    }
                )

        probes = q.mapInPandas(
            assign_probes, "qid long, qv array<double>, qn double, list_id long"
        )
        cand = index.lists.join(probes, "list_id").where(
            F.col("qid") != F.col("nid")
        )
    else:
        qrows = q.collect()
        qids = [r[0] for r in qrows]
        Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        probe_lists = np.argsort(-(Qn @ C.T), axis=1)[:, :np_eff]
        probe_rows = [
            (int(qids[i]), [float(x) for x in Q[i]], float(np.linalg.norm(Q[i])), int(l))
            for i in range(len(qids))
            for l in probe_lists[i]
        ]
        probes = spark.createDataFrame(
            probe_rows, "qid long, qv array<double>, qn double, list_id long"
        )

        probe_set = sorted({int(l) for row in probe_lists for l in row})
        cand = (
            index.lists.where(F.col("list_id").isin(probe_set))
            .join(F.broadcast(probes), "list_id")
            .where(F.col("qid") != F.col("nid"))
        )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = cand.select(
        "qid", "nid", (dot / (nrm * F.col("qn"))).alias("cosine")
    )
    return _rank_topk(scored, k, round_to)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    kmeans_sample: int = 4096,
    kmeans_iters: int = 5,
    seed: int = 42,
    round_to: int | None = None,
    index: IvfIndex | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine neighbors -> (qid, nid, cosine, rank).

    One-shot convenience: :func:`ivf_build` + :func:`ivf_search` in a
    single call (index discarded).  Pass a prebuilt ``index`` (from
    :func:`ivf_build`/:func:`ivf_load`) to skip the per-call codebook +
    list-assignment rebuild — the right shape for repeated query batches
    against one corpus (round-4 VERDICT wrong #1).  The scale path for ANN
    over 10^8+ vectors: a coarse spherical-kmeans codebook (driver-side on
    a sample, broadcast) partitions the database into ``nlist`` inverted
    lists via one narrow mapInPandas pass; each query probes only its
    ``nprobe`` nearest lists, so the exact cosine work drops to
    ~nprobe/nlist of brute force.  Same output shape as ``cosine_topk``
    (recall < 1; tested against it).  Excludes self-matches."""
    if index is None:
        index = ivf_build(
            emb,
            nlist=nlist,
            id_col=id_col,
            vec_col=vec_col,
            kmeans_sample=kmeans_sample,
            kmeans_iters=kmeans_iters,
            seed=seed,
        )
    return ivf_search(
        index,
        queries,
        k=k,
        nprobe=nprobe,
        q_id_col=q_id_col or id_col,
        q_vec_col=q_vec_col or vec_col,
        round_to=round_to,
    )


LSH_RECALL_TARGET = 0.99


def _lsh_banding_recall(n: int, threshold: float) -> tuple[int, int, float]:
    """(rows_per_band, bands, achievable_recall) from (N, threshold) —
    the derivation shared by :func:`_derive_lsh_banding` (which also owns
    the low-recall warning) and the ``method='auto'`` dispatch (which uses
    the achievable recall to decide whether the sketch regime is usable at
    all).  Fixed banding is SCALE-COUPLED: 4-bit band keys mean ~16
    buckets per band, so at 100k vectors every band-bucket held ~6k rows
    and the candidate equi-join generated billions of rows (measured
    1269 s vs 13 s for the N-derived IVF path, SCALE.md).  Derivation:
    rows r sized so expected bucket occupancy N/2^r stays ~64
    (r = ceil(log2(N/64)), clamped 4..16 — the noise-collision control),
    then bands b from the published collision curve
    (recall = 1-(1-p^r)^b at per-plane agreement p = 1-acos(s)/pi) to
    reach >= LSH_RECALL_TARGET AT the requested threshold, clamped 2..64.
    When the band clamp binds (flat collision curve: low threshold, or
    moderate threshold at very large N) the target is NOT attainable at
    r's occupancy — reducing r instead would re-create the degenerate
    bucket blowup the occupancy rule exists to prevent (at 20k/0.4 the
    attainable r=5 leaves ~625-row buckets: ~275M candidate pairs) — so
    the achievable recall is returned for the caller to surface."""
    import math

    r = int(np.clip(math.ceil(math.log2(max(n, 2) / 64.0)), 4, 16))
    p = max(1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi, 1e-6)
    pr = p**r
    if pr >= 1.0 - 1e-12:
        return r, 2, 1.0
    b = int(np.clip(math.ceil(math.log(0.01) / math.log(1.0 - pr)), 2, 64))
    return r, b, 1.0 - (1.0 - pr) ** b


def _derive_lsh_banding(n: int, threshold: float) -> tuple[int, int]:
    """(rows_per_band, bands) via :func:`_lsh_banding_recall`; emits a loud
    UserWarning naming the ACHIEVABLE recall whenever the derivation cannot
    reach the documented >= 0.99 target (round-6 ADVICE similarity.py:626 /
    VERDICT next #5), so a user below the sketchable-threshold floor gets
    told to route through exact / IVF instead of silently losing pairs."""
    import warnings

    r, b, recall = _lsh_banding_recall(n, threshold)
    if recall < LSH_RECALL_TARGET:
        warnings.warn(
            f"lsh_cosine_pairs: derived banding (rows={r}, bands={b}) can "
            f"only reach expected recall {recall:.3f} at threshold "
            f"{threshold} with N={n} — the collision curve is too flat for "
            f"the >= {LSH_RECALL_TARGET} target at safe bucket occupancy. "
            "Use cosine_pairs (exact, recall 1) below ~10^6 vectors or "
            "ivf_cosine_pairs (angular locality, threshold-derived nprobe) "
            "above, or pass num_planes/bands explicitly to accept this "
            "recall.",
            UserWarning,
            stacklevel=3,
        )
    return r, b


def lsh_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int | None = None,
    bands: int | None = None,
    seed: int = 42,
    dim: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: sign sketch over ``num_planes`` hyperplanes,
    banded into ``bands`` keys; bucket equi-join for candidates; exact cosine
    verification.  Output ⊆ cosine_pairs (probabilistic recall).

    Banding defaults DERIVE from (N, threshold) via
    :func:`_derive_lsh_banding` (a 100 TB user will not retune sketch
    parameters per dataset — the same policy as the IVF codebook's
    sqrt(N) nlist); pass both explicitly to pin a spec (the committed
    fixtures re-execute the same derivation).  Recall with r rows per
    band at angle-similarity p = 1 - acos(cos)/pi is 1-(1-p^r)^bands —
    the derivation TARGETS >= 0.99 at the REQUESTED threshold, but when
    the band clamp binds (low thresholds, or moderate thresholds at very
    large N: the collision curve is too flat to select at safe bucket
    occupancy) the target is not attainable and a UserWarning names the
    achievable recall — route those regimes through cosine_pairs / IVF
    (or :func:`similar_pairs` with method='auto', which does exactly
    that) instead."""
    if num_planes is None or bands is None:
        if num_planes is not None or bands is not None:
            raise ValueError(
                "lsh_cosine_pairs: pass num_planes and bands together (or "
                "neither, to derive both from N and the threshold)"
            )
        r, bands = _derive_lsh_banding(
            n if n is not None else emb.count(), threshold
        )
        num_planes = r * bands
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    rows = num_planes // bands

    # single-split guard (guide §2.5): the norm fold, the sketch UDF and
    # both verify join-backs all read this relation; a one-file embeddings
    # table would otherwise run them at parallelism 1 (no-op at scale)
    from .dedup import _spread

    e = _spread(
        emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    ).withColumn("nrm", _norm_expr("v"))

    # sign bits via an Arrow-batched UDF that replicates the LEFT-FOLD
    # accumulation order of the SQL `aggregate(zip_with(...))` formulation
    # bit for bit (elementwise numpy += over the dimension index == per-row
    # sequential fold), so sketch keys — and the committed spec fixture —
    # are unchanged.  The pure-expression variant compiled 64 aggregate
    # trees of 128 terms each into one pathological codegen unit; constant
    # multi-second compile time dominated the whole query at bench scale.
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def bits_udf(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        n = V.shape[0]
        # accumulate over the DIMENSION index only — each (row, plane) lane
        # still sums in exact j order, so every lane is bit-identical to
        # the SQL left fold (and to the per-plane loop this replaces: that
        # shape paid num_planes * dim python/numpy dispatches per batch,
        # ~25 s of pure call overhead across the sf0.1 sketch stage)
        acc = np.zeros((n, num_planes))
        PT = planes.T  # (dim, num_planes)
        for j in range(dim):
            acc += V[:, j, None] * PT[j][None, :]  # == SQL fold order
        bits = (acc >= 0).astype(np.int32)
        return pd.Series(list(bits))

    e = e.persist()  # feeds the sketch plus both verify sides
    sk = e.withColumn("bits", bits_udf("v"))
    # band join and dedup move only (id, key) — the 128-double vectors join
    # back AFTER dedup, so the widest shuffle carries ids, not arrays
    band_keys = sk.select(
        "id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws(",", F.slice("bits", b * rows + 1, rows)))
                for b in range(bands)
            ])
        ).alias("band", "key"),
    )
    band_keys = band_keys.persist()  # sketch expressions run once, not twice
    a = band_keys.select(F.col("id").alias("rid"), "band", "key")
    b = band_keys.select(F.col("id").alias("sid"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("rid") < F.col("sid"))
        .select("rid", "sid")
        .distinct()
    )
    va = e.select(F.col("id").alias("rid"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = e.select(F.col("id").alias("sid"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    from ..cache import release_on_gc

    out = (
        cand.join(va, "rid")
        .join(vb, "sid")
        .select("rid", "sid", cosine_expr().alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
    return release_on_gc(out, e, band_keys)


def _fold_dots(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot products with Spark's F.aggregate(zip_with(...))
    arithmetic: elementwise products then np.cumsum along the dimension —
    cumsum's running total is a strict LEFT FOLD, bit-identical to the
    SQL fold (property-pinned in tests/test_llm_ops.py)."""
    return np.cumsum(A * B, axis=1)[:, -1]


def derive_nlist(n: int) -> int:
    """sqrt(N) codebook size: ~sqrt(N) vectors per list keeps IVF verify
    work at ~N^1.5 (sum over lists of |list|^2) — the no-hand-tuned-
    scale-constants default shared by :func:`ivf_cosine_pairs` and the
    :func:`similar_pairs` front door (which derives it from its ONE
    dispatch count and passes it through, so a derived input relation is
    never counted twice)."""
    return max(8, int(round(float(n) ** 0.5)))


def ivf_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int | None = None,
    nprobe: int | None = None,
    kmeans_sample: int = 4096,
    kmeans_iters: int = 5,
    seed: int = 42,
    list_cap: int = 4096,
    recall_target: float | None = None,
) -> DataFrame:
    """IVF-candidate cosine pairs: the sub-quadratic similarity path for
    the 10^5-10^6-vector MID-regime (round-5 VERDICT next #4), between the
    exact block-matmul plan (right below ~10^5) and hyperplane LSH (wins
    above ~10^6 — both measured, SCALE.md).

    Shape: seeded spherical-kmeans codebook on a hash-ordered sample
    (:func:`_ivf_codebook` — shared with :func:`ivf_build`, bit-identical),
    ONE Arrow-batched pass assigns every vector its ``nprobe``
    nearest-centroid lists (multi-probe on BOTH sides: two vectors are
    candidates iff their probe sets overlap, so boundary-straddling pairs
    survive a disagreeing primary), then ONE groupBy(list_id) +
    applyInPandas verifies all in-list pairs with a memory-blocked
    elementwise-product + cumsum dot — np.cumsum's running total is a
    strict LEFT FOLD, bit-identical to the `cosine_expr` /
    ``F.aggregate(zip_with(...))`` arithmetic of :func:`cosine_pairs`
    (property-pinned in tests), and norms ride along from the JVM
    `_norm_expr` column — so a pair found in two shared lists emits
    bit-identical rows and one `distinct()` dedups them.  Output ⊆
    cosine_pairs (candidate recall < 1; the emitted cosines are exact).

    Scale: the only wide shuffle moves N·nprobe (id, vector) rows — NOT
    per-candidate join-backs (the LSH route's shape, ~pair-count vector
    copies) — and verify work is sum over lists of |list|^2 ~
    N^2·nprobe^2 / nlist, so nlist ~ sqrt(N) (the default) gives ~N^1.5:
    sub-quadratic without LSH's threshold sensitivity (hyperplane banding
    degenerates at low thresholds; IVF candidates only need angular
    LOCALITY).  Spherical kmeans keeps lists near-balanced; a genuinely
    hot list (> ``list_cap`` assignments — duplicate-heavy or collapsed
    data) is DECOMPOSED into block-pair groups (ids % s blocks; group
    (bi, bj) verifies block-bi x block-bj cross pairs, (b, b) the
    triangle), so one hot key becomes s(s+1)/2 bounded tasks instead of
    one quadratic straggler — applyInPandas groups are not AQE-splittable,
    so the salt must be ours.  The decomposition covers each in-list pair
    exactly once and never changes a cosine, so the output (and the spec
    fixture hash) is invariant.
    """
    e = (
        emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .withColumn("nrm", _norm_expr("v"))
        .persist()
    )
    if nlist is None:
        # sqrt(N) lists: ~sqrt(N) vectors per list -> N^1.5 candidate work
        # (similar_pairs passes nlist through so its dispatch count is the
        # only count — a derived input relation must not scan twice)
        nlist = derive_nlist(emb.count())
    if nprobe is None:
        # threshold-derived probes (see derive_nprobe): wider angular caps
        # need more lists probed for the probe sets of a qualifying pair
        # to overlap — fixed nprobe=2 measured recall 0.689 at theta 0.4
        # while being exactly right (1.000) at 0.95; recall_target
        # escalates along the calibrated miss-decay model
        nprobe = derive_nprobe(nlist, threshold, recall_target)
    C = _ivf_codebook(
        e.select(F.col("id").alias(id_col), F.col("v").alias(vec_col)),
        nlist, id_col, vec_col, kmeans_sample, kmeans_iters, seed,
    )
    b_c = e.sparkSession.sparkContext.broadcast(C)
    np_ = min(nprobe, C.shape[0])
    thr = float(threshold)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C_ = b_c.value
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf["v"].to_numpy())
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = Vn @ C_.T
            # stable argsort: ties break toward the smaller list id, so the
            # probe set is deterministic and the spec fixture reproduces it
            probes = np.argsort(-sims, axis=1, kind="stable")[:, :np_]
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), np_),
                    "v": np.repeat(pdf["v"].to_numpy(), np_),
                    "nrm": np.repeat(pdf["nrm"].to_numpy(), np_),
                    "list_id": probes.reshape(-1),
                }
            )

    asg = e.mapInPandas(
        assign, "id long, v array<double>, nrm double, list_id long"
    )

    _empty = pd.DataFrame({"rid": [], "sid": [], "cosine": []})

    def _emit(ids_a, ids_b, cos):
        # duplicate ids in the input (two rows sharing a vec_id land in the
        # same list) would collapse under min/max into rid == sid rows,
        # breaking the documented `output ⊆ cosine_pairs` contract —
        # cosine_pairs enforces rid < sid (round-6 ADVICE similarity.py:826)
        keep = ids_a != ids_b
        return pd.DataFrame(
            {
                "rid": np.minimum(ids_a[keep], ids_b[keep]),
                "sid": np.maximum(ids_a[keep], ids_b[keep]),
                "cosine": cos[keep],
            }
        )

    def _triangle(ids, V, nrm) -> list[pd.DataFrame]:
        m = len(ids)
        out = []
        # row blocks bound the (pairs, d) product matrix to ~128k pairs
        B = max(1, 131072 // m)
        for i0 in range(0, m - 1, B):
            i1 = min(i0 + B, m - 1)
            li = np.concatenate(
                [np.full(m - i - 1, i, dtype=np.int64) for i in range(i0, i1)]
            )
            rj = np.concatenate(
                [np.arange(i + 1, m, dtype=np.int64) for i in range(i0, i1)]
            )
            cos = _fold_dots(V[li], V[rj]) / (nrm[li] * nrm[rj])
            keep = cos >= thr
            if keep.any():
                out.append(_emit(ids[li[keep]], ids[rj[keep]], cos[keep]))
        return out

    def _cross(ids1, V1, nrm1, ids2, V2, nrm2) -> list[pd.DataFrame]:
        m1, m2 = len(ids1), len(ids2)
        out = []
        B = max(1, 131072 // max(m2, 1))
        for i0 in range(0, m1, B):
            i1 = min(i0 + B, m1)
            li = np.repeat(np.arange(i0, i1, dtype=np.int64), m2)
            rj = np.tile(np.arange(m2, dtype=np.int64), i1 - i0)
            cos = _fold_dots(V1[li], V2[rj]) / (nrm1[li] * nrm2[rj])
            keep = cos >= thr
            if keep.any():
                out.append(_emit(ids1[li[keep]], ids2[rj[keep]], cos[keep]))
        return out

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return _empty
        parts = _triangle(
            pdf["id"].to_numpy(), np.stack(pdf["v"].to_numpy()),
            pdf["nrm"].to_numpy(),
        )
        return pd.concat(parts, ignore_index=True) if parts else _empty

    from ..cache import release_on_gc

    # one cheap count pass decides whether any list needs the block-pair
    # decomposition; asg persists so count + verify execute assign once
    asg = asg.persist()
    cnt_rows = asg.groupBy("list_id").count().collect()  # <= nlist rows
    splits = {
        int(r["list_id"]): -(-int(r["count"]) // list_cap) for r in cnt_rows
    }
    if max(splits.values(), default=1) <= 1:
        out = (
            asg.groupBy("list_id")
            .applyInPandas(verify, "rid long, sid long, cosine double")
            .distinct()  # shared-list duplicates are bit-identical rows
        )
        return release_on_gc(out, e, asg)

    b_sp = e.sparkSession.sparkContext.broadcast(splits)

    def explode_blocks(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sp = b_sp.value
        for pdf in it:
            if not len(pdf):
                continue
            s_arr = np.array(
                [sp.get(int(l), 1) for l in pdf["list_id"]], dtype=np.int64
            )
            blk = (pdf["id"].to_numpy() % s_arr).astype(np.int64)
            idx = np.repeat(np.arange(len(pdf)), s_arr)
            j = np.concatenate([np.arange(s) for s in s_arr])
            bb = blk[idx]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy()[idx],
                    "v": pdf["v"].to_numpy()[idx],
                    "nrm": pdf["nrm"].to_numpy()[idx],
                    "list_id": pdf["list_id"].to_numpy()[idx],
                    "blk": bb,
                    "bi": np.minimum(bb, j),
                    "bj": np.maximum(bb, j),
                }
            )

    def verify_blocked(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return _empty
        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        ids = pdf["id"].to_numpy()
        V = np.stack(pdf["v"].to_numpy())
        nrm = pdf["nrm"].to_numpy()
        if bi == bj:
            parts = _triangle(ids, V, nrm)
        else:
            m1 = pdf["blk"].to_numpy() == bi
            m2 = ~m1
            if not m1.any() or not m2.any():
                return _empty
            parts = _cross(
                ids[m1], V[m1], nrm[m1], ids[m2], V[m2], nrm[m2]
            )
        return pd.concat(parts, ignore_index=True) if parts else _empty

    blocked = asg.mapInPandas(
        explode_blocks,
        "id long, v array<double>, nrm double, list_id long, "
        "blk long, bi long, bj long",
    )
    out = (
        blocked.groupBy("list_id", "bi", "bj")
        .applyInPandas(verify_blocked, "rid long, sid long, cosine double")
        .distinct()
    )
    return release_on_gc(out, e, asg)


# ---------------------------------------------------------------------------
# method='auto' dispatch (round-6 VERDICT next #1)
#
# The reference engine owns the method choice (Join.java:42-131 dispatches
# the join strategy from the inputs); a user at 10^5 vectors should not have
# to know to pass 'ivf'.  The boundaries below are the MEASURED crossovers
# (SCALE.md "embedding similarity crossover, completed"):
#   - exact block-matmul wins below ~10^4 vectors (at 20k x 64 it already
#     loses 12x to IVF: 49.7 s vs 4.2 s at theta 0.95) and stays the
#     RECALL-1 fallback up to ~10^6 when the threshold is too low for the
#     sketches (derived LSH banding reaches only ~0.64 expected recall at
#     20k/0.4; IVF at fixed nprobe=2 measured 0.689 there);
#   - IVF (N^1.5 via the sqrt(N) codebook) owns EVERYTHING above 10^4 at
#     sketchable thresholds on measured evidence: recall 1.000 at
#     20k/0.95 (4.2 s vs LSH 4.1 s — tie), 13.3 s vs LSH 23.5 s at 100k,
#     and 657 s recall-1.000 at 10^6 where derived-banding LSH DID NOT
#     FINISH (its ~b*occ/2 ~ 600 candidate rows PER VECTOR are linear in
#     N but the constant is brutal: >80 GB of candidate shuffle spill at
#     1M on local[32] — SCALE.md round 7).  Hyperplane LSH therefore
#     stays an EXPLICIT method, not an auto choice: its linear candidate
#     volume can only beat IVF's N^1.5 compute on a cluster whose
#     aggregate shuffle bandwidth outruns its matmul throughput —
#     re-measure there before preferring it.
# ---------------------------------------------------------------------------

SIMILARITY_EXACT_MAX_N = 10_000
SIMILARITY_EXACT_FEASIBLE_MAX_N = 1_000_000


def choose_similarity_method(
    n: int, threshold: float, recall_target: float | None = None
) -> str:
    """Pick 'exact' | 'ivf' for a cosine-threshold self-join over ``n``
    vectors — the measured-crossover dispatch documented above ('lsh' is
    explicit-only; see the module comment).  "Sketchable" means the
    derived LSH banding can reach the >= 0.99 recall target at this
    (n, threshold) — the collision curve is the best available proxy for
    how hard the angular regime is for ANY sketch; below that floor the
    recall-1 exact plan is chosen as long as it is feasible (n <= 10^6),
    and above that IVF is the only sub-quadratic option — chosen with a
    loud warning about its reduced low-threshold recall.

    ``recall_target >= 1.0`` demands TOTAL recall: the exact plan is
    forced wherever it is feasible (n <= 10^6) even in the IVF regime —
    callers for whom a missed near-dup pair is a correctness bug (the
    old ``dedupe_embeddings(method='exact')`` default) say so here
    instead of hand-picking the method.  Past the exact ceiling the IVF
    route escalates to exhaustive probing (see :func:`derive_nprobe`).

    Calibration status of the sketchable-IVF branch (round-7 ADVICE #3):
    IVF recall at the derived nprobe is now measured across the
    threshold band, not just at the endpoints — 1.000/0.99999/1.00000 at
    theta 0.95 (20k/100k/10^6 planted truth), 1.000 at theta 0.7 (20k vs
    true exact — the intermediate band), 0.942 at theta 0.4 (20k vs true
    exact, the regime this function routes to exact anyway below 10^6),
    with the full recall-vs-nprobe curve in SCALE.md round 8.  The LSH
    collision curve stays the THRESHOLD-HARDNESS proxy only (auto never
    selects LSH); the recall decisions ride on the measured IVF points."""
    import warnings

    _, _, lsh_recall = _lsh_banding_recall(n, threshold)
    sketchable = lsh_recall >= LSH_RECALL_TARGET
    if n <= SIMILARITY_EXACT_MAX_N:
        return "exact"
    if recall_target is not None and recall_target >= 1.0:
        if n <= SIMILARITY_EXACT_FEASIBLE_MAX_N:
            return "exact"
        warnings.warn(
            f"similar_pairs: recall_target={recall_target} demands total "
            f"recall but N={n} is past the exact-feasible ceiling "
            f"({SIMILARITY_EXACT_FEASIBLE_MAX_N}); dispatching to IVF with "
            "EXHAUSTIVE probing (nprobe=nlist — recall 1 by construction, "
            "but quadratic verify work). Lower recall_target to regain the "
            "sub-quadratic plan.",
            UserWarning,
            stacklevel=3,
        )
        return "ivf"
    if not sketchable and n <= SIMILARITY_EXACT_FEASIBLE_MAX_N:
        return "exact"
    if sketchable:
        # ADVICE r7: auto replacing the old exact default must not be
        # silent about picking a recall<1-CAPABLE route — measured recall
        # at the derived nprobe is 1.000/0.99999 at theta 0.95
        # (20k/100k/10^6, SCALE.md) but that is empirical, not a proof.
        _log.info(
            "similar_pairs auto: N=%d threshold=%.3g -> IVF (measured "
            "recall 1.0 at the 0.95-threshold operating points; pass "
            "recall_target=1.0 to force the exact plan, or recall_target="
            "<r> to escalate nprobe).",
            n, threshold,
        )
        return "ivf"
    warnings.warn(
        f"similar_pairs: N={n} is past the exact-feasible ceiling "
        f"({SIMILARITY_EXACT_FEASIBLE_MAX_N}) and threshold {threshold} sits "
        f"below the sketch recall floor (derived LSH banding reaches only "
        f"{lsh_recall:.3f}); dispatching to IVF with threshold-derived "
        "nprobe — recall < 1. Pass recall_target= to buy recall with more "
        "probes (recall_target=1.0 probes exhaustively), raise the "
        "threshold, or pass an explicit method to override.",
        UserWarning,
        stacklevel=3,
    )
    return "ivf"


# Calibration anchors for recall_target escalation: the derived nprobe's
# measured pair-miss mass at two thresholds (20k x 64, nlist 141, vs true
# exact).  The escalation model treats the miss as geometric in the probe
# count — each extra block of `base` probes multiplies the miss by the
# anchor — validated against the measured recall-vs-nprobe curves
# (SCALE.md rounds 8-9).  theta 0.4 (base nprobe 7 -> recall 0.942):
# miss 0.058; theta 0.25 (base nprobe 8 -> recall 0.799): miss 0.201 —
# the round-8 anchor alone was OPTIMISTIC below 0.4 (its target-0.99
# pick measured 0.9712 at theta 0.25), so thresholds below 0.4 ride the
# 0.25 anchor, which the measured 0.25 curve shows is conservative
# (its target-0.99 pick, nprobe 23, sits above the measured 0.99-recall
# point at nprobe ~15-20; nprobe 20 measured 0.99935).
IVF_MISS_AT_DERIVED = 0.058
IVF_MISS_AT_DERIVED_LOW = 0.201
IVF_MISS_ANCHOR_THRESHOLD = 0.4  # measured-anchor switch point
# Lowest threshold with a measured recall anchor: below this the model
# refuses to extrapolate (derive_nprobe escalates to exhaustive probing
# unless the caller passes nprobe explicitly).
IVF_MISS_MEASURED_FLOOR = 0.25


def derive_nprobe(
    nlist: int, threshold: float, recall_target: float | None = None
) -> int:
    """Threshold-derived probe count for :func:`ivf_cosine_pairs` — the
    same no-hand-tuned-scale-constants policy as the LSH banding and the
    sqrt(N) codebook (round-6 VERDICT next #1: fixed nprobe=2 left 31% of
    recall on the table at theta 0.4 while being exactly right at 0.95).

    Geometry: a qualifying pair spans an angular cap of radius
    acos(threshold); the spherical codebook tiles the sphere, so the
    number of lists a cap intersects grows with its angular measure.
    Scaling the list count by the cap fraction of pi —
    nprobe = ceil(nlist ** (acos(threshold)/pi)) — reproduces the measured
    operating points: 2 at theta 0.95 (recall 1.000 at 20k and 0.99999 at
    100k) and 7 at theta 0.4 / nlist 141 (vs 0.689 recall at the fixed 2).
    Floored at 2 (multi-probe is what rescues boundary-straddling pairs),
    capped at nlist.

    ``recall_target`` buys recall with probes (round-7 VERDICT next #3:
    the low-threshold warning had no knob to act on).  The model is
    geometric miss decay anchored at the measured calibration point:
    miss(nprobe) = IVF_MISS_AT_DERIVED ** (nprobe / base), so
    nprobe(target) = base * log(1-target) / log(miss_anchor), never below
    the base derivation and capped at nlist.  Anchoring at the theta-0.4
    miss is CONSERVATIVE at easier thresholds (measured miss at 0.95 is
    0 already at the base nprobe — extra probes there only cost wall).
    ``recall_target >= 1.0`` returns nlist: with every vector assigned to
    every list, any pair shares a list — recall 1 by construction at
    quadratic verify cost (prefer the exact plan below 10^6;
    :func:`choose_similarity_method` does).

    Calibrated range (SCALE.md rounds 8-9, measured vs true exact at
    20k/nlist=141): at theta 0.4 the model's target-0.99 pick (nprobe 12)
    measured 0.99370 and the full curve {7: 0.942, 9: 0.971, 12: 0.994,
    16: 0.99887, 24: 1.0} brackets the model within ~0.003 everywhere; at
    the intermediate theta 0.7 (the previously unmeasured band) recall is
    already 1.0 at nprobe 2, so escalation there only buys margin; at
    theta 0.95 the base nprobe measured 1.0/0.99999/1.0 at 20k/100k/10^6.
    BELOW 0.4 the round-8 anchor measured OPTIMISTIC (theta 0.25: base
    nprobe 8 -> recall 0.799, its target-0.99 pick 13 -> 0.9712), so
    thresholds under ``IVF_MISS_ANCHOR_THRESHOLD`` ride the harder
    measured anchor ``IVF_MISS_AT_DERIVED_LOW`` — at theta 0.25 its
    target-0.99 pick is nprobe 23, above the measured curve's 0.99
    crossing (nprobe 20 measured 0.99935): conservative.  Below theta
    0.25 the low anchor extrapolates UNMEASURED and in the optimistic
    direction (miss at base grows as the threshold drops), so the model
    REFUSES there (round-9 VERDICT next #5): a ``recall_target`` below
    the lowest measured calibration point escalates straight to
    exhaustive probing (the ``recall_target=1.0`` route — recall 1 by
    construction) with a loud warning; a caller who wants a cheaper probe
    count below theta 0.25 must pass ``nprobe`` explicitly, owning the
    unmeasured recall.  The model never returns a silent extrapolated
    number where it has been shown optimistic."""
    import math
    import warnings

    t = min(max(threshold, -1.0), 1.0)
    frac = math.acos(t) / math.pi
    base = int(np.clip(math.ceil(nlist**frac), 2, max(nlist, 2)))
    if recall_target is None:
        return base
    if recall_target >= 1.0:
        return max(nlist, 2)
    if t >= IVF_MISS_ANCHOR_THRESHOLD:
        anchor = IVF_MISS_AT_DERIVED
    else:
        anchor = IVF_MISS_AT_DERIVED_LOW
        if t < IVF_MISS_MEASURED_FLOOR:
            warnings.warn(
                f"derive_nprobe: threshold {threshold} is below the lowest "
                f"measured calibration point ({IVF_MISS_MEASURED_FLOOR}) — "
                "the miss-decay model is unmeasured and optimistic here, "
                "so the recall_target escalates to EXHAUSTIVE probing "
                "(nprobe=nlist, the recall_target=1.0 route) instead of a "
                "model pick.  Pass nprobe explicitly to choose a cheaper "
                "probe count at your own (unmeasured) recall.",
                UserWarning,
                stacklevel=3,
            )
            return max(nlist, 2)
    scale = math.log(max(1.0 - recall_target, 1e-12)) / math.log(anchor)
    return int(np.clip(math.ceil(base * max(scale, 1.0)), base, max(nlist, 2)))


# Logical-plan node names whose count() does not execute real upstream
# compute: column-pruned file scans (parquet counts read footer row counts /
# empty-schema batches), an already-materialized cache, or literal rows.
# Anything else (Filter, Join, Aggregate, Generate, UDF stages, LogicalRDD
# of unknown provenance, ...) means count() may execute the full upstream
# plan once — the auto dispatch must persist first or be handed n=.
#
# Deliberately NOT admitted (round-8 VERDICT next #8, adjudicated round 9):
# `Filter`.  A filtered count is never metadata-class — it scans every
# predicate column at full width (at 100 TB, a full columnar pass), and a
# node-NAME classifier cannot see predicate cost: Filter(col > 0) and
# Filter(pandas_udf(...)) print the same node.  Admitting Filter would
# trade one bounded persist for an unbounded second execution of exactly
# the expensive chains the persist guard exists for.  The conservative
# default (persist + release_on_gc) costs one cache write on derived
# inputs and nothing on bare scans — structurally correct at every scale.
_CHEAP_COUNT_NODES = frozenset(
    {"Project", "Relation", "LogicalRelation", "LocalRelation"}
)


def _count_is_cheap(df: DataFrame) -> bool:
    """True when ``df.count()`` is a metadata-class scan (see
    ``_CHEAP_COUNT_NODES``) — the double-scan guard for
    :func:`similar_pairs`'s auto dispatch.  An ``InMemoryRelation`` is
    cheap as a whole (count reads the cache), so its nested PHYSICAL plan
    lines (ColumnarToRow/FileScan/...) are skipped by indentation.
    Conservative on any plan it cannot read (returns False -> the caller
    persists, which is always safe)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    skip_deeper_than: int | None = None
    for line in plan.splitlines():
        if not line.strip():
            continue
        stripped = line.lstrip(" :+-")
        indent = len(line) - len(stripped)
        if skip_deeper_than is not None and indent > skip_deeper_than:
            continue  # inside a cached subtree: its physical plan, not ours
        skip_deeper_than = None
        node = stripped.split(" ", 1)[0].split("[", 1)[0]
        if node == "InMemoryRelation":
            skip_deeper_than = indent
            continue
        if node and node not in _CHEAP_COUNT_NODES:
            return False
    return True


def similar_pairs(
    emb: DataFrame,
    threshold: float,
    method: str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    num_planes: int | None = None,
    bands: int | None = None,
    nlist: int | None = None,
    nprobe: int | None = None,
    n: int | None = None,
    recall_target: float | None = None,
) -> DataFrame:
    """Cosine-threshold self-join front door -> (rid, sid, cosine) with
    rid < sid: picks the physical strategy from the data when
    ``method='auto'`` (ONE count decides) — exact brute-force below 10^4
    (and as the recall-1 fallback below 10^6 at low thresholds), IVF
    probed-list candidates everywhere else — per the measured crossovers
    (:func:`choose_similarity_method`).  Hyperplane LSH is EXPLICIT-only
    (``method='lsh'``): measured second to IVF at every point up to 10^6,
    where its linear-but-huge candidate volume did not finish on a single
    node (SCALE.md round 7); its linearity can still pay on shuffle-rich
    clusters.  Explicit ``method`` values route directly; the sketch
    knobs (``num_planes``/``bands``, ``nlist``/``nprobe``) stay derived
    unless pinned.

    Double-scan safety (round-7 VERDICT next #2): the dispatch count is
    free on a bare scan (parquet metadata) but on a DERIVED relation it
    would execute the whole upstream plan once for the count and again
    for the chosen join — so when the optimized plan is not
    metadata-countable the input is persisted for the query's lifetime
    (released via the :mod:`..cache` two-phase protocol), and the derived
    count/nlist are passed through so no route re-counts.  Callers that
    already know N pass ``n=`` and skip the count entirely.

    ``recall_target`` (round-7 VERDICT next #3): the recall the caller
    requires from a sketch route.  >= 1.0 forces the exact plan wherever
    feasible (n <= 10^6) and exhaustive probing past it; fractional
    targets escalate the IVF probe count along the calibrated miss-decay
    model (:func:`derive_nprobe`).  Ignored by explicit
    ``method='exact'`` (already total) and ``'lsh'`` (banding has its own
    >= 0.99 derivation + achievable-recall warning)."""
    persisted = None
    if method == "auto":
        if n is None:
            if emb.isStreaming:
                raise ValueError(
                    "similar_pairs(method='auto') cannot count a streaming "
                    "relation — pass n= (or an explicit method)"
                )
            if not _count_is_cheap(emb):
                persisted = emb = emb.persist()
            n = emb.count()
        method = choose_similarity_method(n, threshold, recall_target)
    if method == "ivf" and nlist is None and n is not None:
        nlist = derive_nlist(n)  # ivf derives nprobe from it; no re-count
    if method == "exact":
        out = cosine_pairs(emb, threshold, id_col=id_col, vec_col=vec_col, n=n)
    elif method == "ivf":
        out = ivf_cosine_pairs(
            emb, threshold, id_col=id_col, vec_col=vec_col,
            nlist=nlist, nprobe=nprobe, seed=seed,
            recall_target=recall_target,
        )
    elif method == "lsh":
        out = lsh_cosine_pairs(
            emb, threshold, id_col=id_col, vec_col=vec_col,
            num_planes=num_planes, bands=bands, seed=seed, n=n,
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    if persisted is not None:
        from ..cache import release_on_gc

        out = release_on_gc(out, persisted)
    return out
