"""Profile emd_nd_threshold_3d at sf0.1: wall + JoinStats pruning counters.

Same harness shape as profile_arbitrary.py but for the grid strategy at
the reference's default d=3 / 27-bin shape.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from melody_join_spark.operators.emd_join_nd import emd_join_nd, JoinStats
from melody_join_spark.plans.tpch_bridge import lineitem_histograms_3d, bin_points_3d
from __spark_entry__ import ND_THETA_3D

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from melody_join_spark.session import get_spark

    spark = get_spark("profile-grid3d")
    spark.sparkContext.setLogLevel("ERROR")

    hist = lineitem_histograms_3d(spark, SF_DIR)
    want_stats = bool(os.environ.get("MJS_PROFILE_STATS"))
    for tag in ("warm", "measured", "measured2"):
        spark.catalog.clearCache()
        stats = JoinStats(spark.sparkContext) if want_stats else None
        t0 = time.time()
        res = emd_join_nd(hist, bin_points_3d(), ND_THETA_3D, strategy="grid", stats=stats)
        cnt = res.count()
        wall = time.time() - t0
        print(f"[{tag}] wall={wall:.2f}s pairs={cnt}", flush=True)
        if stats is not None:
            for k, v in sorted(stats.snapshot().items()):
                if v:
                    print(f"    {k:24s} {v}")

    spark.stop()


if __name__ == "__main__":
    main()
