#!/usr/bin/env python
"""Round-11 VERDICT item 7: before investing further in EMD-ND job-count
reduction, measure whether the between-job driver gaps actually shrink in
PROPORTION at a larger scale — the claim that justified leaving the grid
join's multi-job prep structure.

Runs the 2-d grid join on the sf0.1 bridge table and on the synthesized
sf1 table (scale_run.build_scaled: 10x replicas, gamma-perturbed), each
REPEATS times in one session with the event log on, and prints per run:
wall, number of jobs, stage-interval union, and the uncovered gap (wall -
union = driver-side serialization: planning, collects, job submission).
The 100-TB argument holds if gap/wall falls materially from sf0.1 to sf1.

Usage: python scripts/scale_gap_probe.py [--repeats=3]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np  # noqa: E402

REPEATS = 3
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SF01 = "/root/testdata/sf0.1"
EVDIR = tempfile.mkdtemp(prefix="mjs_gap_")
os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = EVDIR


def union_len(intervals):
    if not intervals:
        return 0.0
    out, cur_s, cur_e = 0.0, None, None
    for s, e in sorted(intervals):
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s > cur_e:
            out += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    return out + cur_e - cur_s


def main() -> None:
    import importlib

    import scale_run

    from melody_join_spark.operators.emd_join_nd import emd_join_nd
    from melody_join_spark.session import get_spark

    ent = importlib.import_module("__spark_entry__")
    spark = get_spark("scale-gap-probe")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    scale_run.build_scaled(spark, ent)

    h_small = ent.lineitem_histograms_2d(spark, SF01).select("id", "w")
    h_big = spark.read.parquet(f"{scale_run.SCALE_DIR}/hist2d.parquet")
    pts = ent.bin_points_2d()

    marks = []
    for rep in range(REPEATS):
        for scale, h in (("sf0.1", h_small), ("sf1", h_big)):
            tag = f"{scale}-rep{rep}"
            spark.catalog.clearCache()
            sc.setJobGroup(tag, tag)
            t0 = time.time()
            res = emd_join_nd(h, pts, ent.ND_THETA_2D, strategy="grid")
            n = res.count()
            wall = time.time() - t0
            sc.setJobGroup("", "")
            marks.append((tag, wall, n))
            print(f"# {tag}: wall={wall:.2f}s out={n}", flush=True)

    spark.stop()

    logfs = []
    for dirpath, _d, files in os.walk(EVDIR):
        for f in files:
            if f.startswith("events_") or f.endswith(".inprogress"):
                logfs.append(os.path.join(dirpath, f))
    jobs, stages = {}, {}
    import itertools

    for line in itertools.chain.from_iterable(open(lf) for lf in sorted(logfs)):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "group": props.get("spark.jobGroup.id", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, com = si.get("Submission Time"), si.get("Completion Time")
            if sub and com:
                stages[si["Stage ID"]] = (sub / 1e3, com / 1e3)

    print("\n| scale | run | wall s | jobs | stage-union s | gap s | gap % |")
    print("|---|---|---|---|---|---|---|")
    for tag, wall, _n in marks:
        jids = [j for j, v in jobs.items() if v["group"] == tag]
        ivals = [stages[s] for j in jids for s in jobs[j]["stages"] if s in stages]
        cov = union_len(ivals)
        gap = wall - cov
        scale, rep = tag.rsplit("-", 1)
        print(f"| {scale} | {rep} | {wall:.2f} | {len(jids)} | {cov:.2f} "
              f"| {gap:.2f} | {100 * gap / wall:.0f}% |")


if __name__ == "__main__":
    main()
