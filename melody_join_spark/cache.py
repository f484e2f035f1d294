"""Deterministic release of internal ``persist()`` handles.

Several operators cache an intermediate DataFrame that feeds multiple
branches of one lazy plan (e.g. both sides of a self-join).  The cache must
outlive the *returned* DataFrame's whole plan lifetime — callers routinely
derive (`.orderBy(...)`, `.select(...)`) from the result and drop the
original object long before triggering the action, so unpersisting directly
on result GC would evict the cache mid-query and force the upstream chain
(scan + agg + UDF signatures) to recompute once per join side — a measured
3-6x regression.

Two-phase release instead:

1. ``release_on_gc(result, *cached)`` registers the caches and arms a
   weakref on ``result``; when ``result`` is garbage-collected the entry is
   only MARKED releasable (nothing is unpersisted yet).
2. Marked entries are actually unpersisted at the next operator invocation
   (every registration starts with a ``drain()``), or explicitly via
   ``release_caches()``.  In a sequential workload query N's caches are
   freed the moment query N+1 is constructed — after N's action completed —
   so a long-lived session holds at most one query's worth of cached
   self-join inputs instead of accumulating them forever.

Interleaved lazy queries can at worst lose a cache early (recompute), never
correctness.  ``release_caches(spark)`` remains the explicit big hammer
(bench.py uses the equivalent ``spark.catalog.clearCache()``).

**Plan-equality hazard (the round-10 "second execution costs 3x" defect).**
``DataFrame.unpersist()`` does NOT release a private handle: Spark's
CacheManager uncaches every entry whose *analyzed plan* ``sameResult``s the
DataFrame's — so draining a DEAD query's handle evicts a LIVE,
identically-planned cache registered by a later query.  Concretely:
``dedup_clusters`` runs ``jaccard_pairs`` internally and its persisted
``docs`` handle goes dead when the query function returns; the deferred
drain then fires during the NEXT ``release_on_gc`` — i.e. right after
``dedup_jaccard_ngram``'s own ``docs.persist()``, whose plan is identical —
and evicts the fresh cache, so the tokenize+freq+groupBy chain recomputes
once per consumer (measured 3x wall: 21.6 s vs 6.9 s at sf0.1; survives
``clearCache()``/GC barriers because the eviction happens *after* the new
persist).  ``drain`` therefore skips unpersisting any marked handle whose
plan matches a live entry's (including the caches being registered by the
in-flight ``release_on_gc`` call): the live twin now owns the single
CacheManager entry both handles point at, and will release it on its own
schedule.
"""

from __future__ import annotations

import itertools
import weakref

from pyspark.sql import DataFrame, SparkSession

__all__ = ["release_on_gc", "drain", "release_caches"]


class _Entry:
    __slots__ = ("dfs", "releasable")

    def __init__(self, dfs):
        self.dfs = dfs
        self.releasable = False


_entries: dict[int, _Entry] = {}
_ids = itertools.count()


def _analyzed(df: DataFrame):
    return df._jdf.queryExecution().analyzed()


def drain(force: bool = False, protect: tuple[DataFrame, ...] = ()) -> int:
    """Unpersist every entry whose result DataFrame has been collected by
    the garbage collector (all entries when ``force``).  Returns the number
    of entries released.

    A marked handle whose analyzed plan ``sameResult``s a LIVE entry's (or
    one of ``protect`` — the caches the in-flight ``release_on_gc`` call is
    about to register) is dropped WITHOUT unpersisting: Spark uncaches by
    plan equality, so unpersisting the dead twin would evict the live
    query's freshly-registered cache (see module docstring)."""
    live_plans = []
    if not force:
        live = [df for e in _entries.values() if not e.releasable
                for df in e.dfs]
        live.extend(protect)
        for df in live:
            try:
                live_plans.append(_analyzed(df))
            except Exception:
                pass  # session stopped — nothing can be live
    released = 0
    for k in list(_entries):
        e = _entries[k]
        if e.releasable or force:
            for df in e.dfs:
                try:
                    if live_plans:
                        plan = _analyzed(df)
                        if any(plan.sameResult(lp) for lp in live_plans):
                            continue  # live twin owns this cache entry now
                    df.unpersist()
                except Exception:
                    pass  # session already stopped — nothing to release
            del _entries[k]
            released += 1
    return released


def release_on_gc(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tie ``cached`` DataFrames' persist lifetime to ``result`` (two-phase:
    mark on GC, unpersist at the next registration or explicit drain)."""
    drain(protect=cached)
    entry = _Entry(list(cached))
    _entries[next(_ids)] = entry

    def _mark(e=entry):
        e.releasable = True

    weakref.finalize(result, _mark)
    return result


def release_caches(spark: SparkSession | None = None) -> None:
    """Release every tracked cache now; with ``spark`` also clear the
    session-level cache registry."""
    drain(force=True)
    if spark is not None:
        spark.catalog.clearCache()
