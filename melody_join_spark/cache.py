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


def drain(force: bool = False) -> int:
    """Unpersist every entry whose result DataFrame has been collected by
    the garbage collector (all entries when ``force``).  Returns the number
    of entries released."""
    released = 0
    for k in list(_entries):
        e = _entries[k]
        if e.releasable or force:
            for df in e.dfs:
                try:
                    df.unpersist()
                except Exception:
                    pass  # session already stopped — nothing to release
            del _entries[k]
            released += 1
    return released


def release_on_gc(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tie ``cached`` DataFrames' persist lifetime to ``result`` (two-phase:
    mark on GC, unpersist at the next registration or explicit drain)."""
    drain()
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
