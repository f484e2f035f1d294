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

**Ownership tokens (round 12).** The live-twin guard above only sees twins
that are already registered here — but a twin cache exists from the moment
the newer query calls ``.persist()``, which is typically at the START of
its construction, long before its own ``release_on_gc``.  A dead handle
drained in that window (by some INNER operator's registration) would evict
the new twin: measured on pipeline_llm_prep re-executed in one session,
whose freshly-counted ``docs`` cache was evicted by the drain inside
``dedup_paragraphs``, collapsing the heavy gate scan back into the
single-split file read (6 s -> 35-66 s per re-run).  Each registration now
also captures the identity of the CacheManager object backing the handle;
``drain`` unpersists only when the manager still holds THAT object — a
different object means someone newer re-cached the plan and the dead
handle has nothing left to release.
"""

from __future__ import annotations

import itertools
import weakref

from pyspark.sql import DataFrame, SparkSession

__all__ = ["release_on_gc", "drain", "release_caches"]


class _Entry:
    __slots__ = ("dfs", "tokens", "releasable")

    def __init__(self, dfs):
        self.dfs = dfs
        self.tokens = [_cache_token(df) for df in dfs]
        self.releasable = False


_entries: dict[int, _Entry] = {}
_ids = itertools.count()


def _analyzed(df: DataFrame):
    return df._jdf.queryExecution().analyzed()


def _cache_token(df: DataFrame):
    """Identity of the CacheManager object backing ``df``'s persist, captured
    at registration.  Lets ``drain`` tell *our* cache entry from a twin
    registered later under the same plan: ``DataFrame.unpersist()`` uncaches
    by plan equality, so without ownership a dead handle's drain evicts a
    NEWER query's freshly-materialized cache whenever that query has not yet
    reached its own ``release_on_gc`` (the round-12 pipeline_llm_prep
    re-execution defect: the second run's ``docs`` cache — persisted and
    counted at construction start — was evicted by the drain fired from
    ``dedup_paragraphs``'s inner registration, collapsing the gate scan to
    the raw single-split file, 6 s -> 35-66 s per isolated re-run)."""
    try:
        sess = df.sparkSession
        cm = sess._jsparkSession.sharedState().cacheManager()
        # Spark 4.x signature: lookupCachedData(Dataset); 3.x also had a
        # bare (LogicalPlan) overload — try the Dataset form first
        try:
            opt = cm.lookupCachedData(df._jdf)
        except Exception:
            opt = cm.lookupCachedData(_analyzed(df))
        if opt.isDefined():
            cd = opt.get()
            try:
                rep = cd.cachedRepresentation()
            except Exception:
                rep = cd
            return sess._jvm.System.identityHashCode(rep)
    except Exception:
        pass
    return None


def _owns_cache(df: DataFrame, token) -> bool:
    """True when the CacheManager entry for ``df``'s plan is still the one
    captured at registration (or ownership is unknown — fail open to the
    pre-round-12 unpersist behavior so nothing ever leaks)."""
    if token is None:
        return True
    now = _cache_token(df)
    if now is None:  # nothing cached under this plan: unpersist is a no-op
        return False
    return now == token


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
            for df, token in zip(e.dfs, e.tokens):
                try:
                    if live_plans:
                        plan = _analyzed(df)
                        if any(plan.sameResult(lp) for lp in live_plans):
                            continue  # live twin owns this cache entry now
                    # ownership check (round 12): only unpersist when the
                    # CacheManager still holds the object captured at THIS
                    # entry's registration — a different object means a
                    # newer query re-cached the same plan after ours was
                    # cleared, and plan-equality unpersist would evict its
                    # live cache (see _cache_token).  force bypasses: the
                    # caller wants the session cache-free regardless.
                    if not force and not _owns_cache(df, token):
                        continue
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
