#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _cpu_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    stat0 = _cpu_stat()

    from melody_join_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr, flush=True)
        # queries persist self-join inputs; drop them so later queries
        # don't inherit the accumulated cache/GC pressure
        spark.catalog.clearCache()

    # host contention context: steal% is CPU time the hypervisor withheld
    # from this VM during the run.  Wall-clock timings above are inflated
    # by roughly 1/(1-steal) when nonzero — compare runs at similar steal.
    stat1 = _cpu_stat()
    d = [b - a for a, b in zip(stat0, stat1)]
    tot = sum(d) or 1
    steal_pct = round(100.0 * d[7] / tot, 2) if len(d) > 7 else None
    busy_pct = round(100.0 * (tot - d[3]) / tot, 2)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "host_steal_pct": steal_pct,
                "host_busy_pct": busy_pct,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
