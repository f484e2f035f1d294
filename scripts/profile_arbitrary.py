"""Profile emd_nd_threshold_arbitrary at sf0.1: wall split + pruning counters.

Where do the ~20s go — pivot distance pass (LAESA screens + exact EMDs to
pivots), the window join LPs, or shuffle/overhead?  JoinStats counters plus
a coarse two-phase timing (distance pass materialized alone vs full join).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

from melody_join_spark.operators.emd_join_nd import emd_join_nd, JoinStats
from melody_join_spark.plans.tpch_bridge import lineitem_histograms_2d, bin_points_2d
from __spark_entry__ import ND_THETA_ARB

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    if os.environ.get("MJS_BENCH_SESSION"):
        # the exact session bench.py uses (shuffle partitions 2x cpus, AQE,
        # arrow batching) — for apples-to-apples wall comparisons
        from melody_join_spark.session import get_spark

        spark = get_spark("profile-arbitrary")
    else:
        spark = (
            SparkSession.builder.master(f"local[{CPUS}]")
            .config("spark.sql.shuffle.partitions", CPUS)
            .config("spark.driver.memory", "32g")
            .appName("profile-arbitrary")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")

    hist = lineitem_histograms_2d(spark, SF_DIR)
    n = hist.count()
    pts = bin_points_2d()
    diff = np.abs(pts[:, None, :] - pts[None, :, :])
    C = np.sqrt(diff.sum(axis=2))
    print(f"records={n} bins={len(pts)}")

    # warm (JVM + parquet footer caches), measured run second; stats only
    # when MJS_PROFILE_STATS is set (accumulator/scalar-path overhead skews
    # the wall, so the default run matches what bench.py measures)
    want_stats = bool(os.environ.get("MJS_PROFILE_STATS"))
    for tag in ("warm", "measured"):
        spark.catalog.clearCache()  # defeat CacheManager plan-matching reuse
        stats = JoinStats(spark.sparkContext) if want_stats else None
        t0 = time.time()
        res = emd_join_nd(hist, pts, ND_THETA_ARB, strategy="pivot", ground=C, stats=stats)
        cnt = res.count()
        wall = time.time() - t0
        print(f"[{tag}] wall={wall:.2f}s pairs={cnt}", flush=True)
        if tag == "measured" and os.environ.get("MJS_STAGE_DUMP"):
            # Spark UI REST: wall vs summed task time per stage of this run
            import json as _json
            import urllib.request as _rq

            ui = spark.sparkContext.uiWebUrl
            apps = _json.load(_rq.urlopen(f"{ui}/api/v1/applications"))
            app_id = apps[0]["id"]
            stages = _json.load(
                _rq.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
            )
            stages.sort(key=lambda s: s["stageId"])
            for s in stages[-25:]:
                dur = (s.get("executorRunTime") or 0) / 1000.0
                cpu = (s.get("executorCpuTime") or 0) / 1e9
                print(
                    f"    stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                    f"runTime={dur:7.2f}s cpu={cpu:7.2f}s "
                    f"submit={s.get('firstTaskLaunchedTime','')} "
                    f"name={s['name'][:60]}"
                )
        if stats is not None:
            snap = stats.snapshot()
            for k, v in sorted(snap.items()):
                if v:
                    print(f"    {k:24s} {v}")
            ex = snap.get("exact_evaluated", 0)
            if cnt:
                print(f"    LP/output = {ex / cnt:.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
