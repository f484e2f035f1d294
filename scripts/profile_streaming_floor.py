#!/usr/bin/env python
"""Streaming startup-floor profile (round-6 VERDICT next #6).

The two streaming gate queries pay ~5 s each per bench run against a
static snapshot.  This breaks the wall into phases:

  - start():      stream resolution + temp checkpoint + async kickoff
  - await:        microbatch execution until availableNow drains
  - per-batch:    StreamingQueryProgress.durationMs (triggerExecution,
                  queryPlanning, getBatch/latestOffset = source listing,
                  addBatch = the actual work, walCommit/commitOffsets =
                  checkpoint WAL writes)
  - batch twin:   the same aggregation as a plain batch query on the same
                  snapshot — the irreducible compute; floor = streaming
                  wall minus batch wall.

Usage: python scripts/profile_streaming_floor.py [--repeats=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 2
for a in sys.argv[1:]:
    if a.startswith("--repeats="):
        REPEATS = int(a.split("=", 1)[1])

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    import __spark_entry__ as entry
    from melody_join_spark.session import get_spark
    from melody_join_spark.streaming import (
        stream_events,
        streaming_sessionize,
        streaming_window_counts,
    )

    spark = get_spark("streaming-floor")
    spark.sparkContext.setLogLevel("ERROR")
    snap = entry._events_stream_snapshot(spark, SF_DIR)
    # warm the session so JVM/codegen startup doesn't pollute rep0
    spark.read.parquet(snap).count()

    def win_stream(name):
        return (
            streaming_window_counts(
                stream_events(spark, snap), hours=1, watermark="0 seconds"
            )
            .writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )

    def sess_stream(name):
        return (
            streaming_sessionize(
                stream_events(spark, snap), gap_minutes=30,
                watermark="0 seconds",
            )
            .writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )

    def win_batch():
        from melody_join_spark.operators.events import event_window_agg

        return event_window_agg(spark.read.parquet(snap), hours=1)

    def sess_batch():
        from melody_join_spark.operators.events import sessionize

        return sessionize(spark.read.parquet(snap))

    for label, sfn, bfn in [
        ("window", win_stream, win_batch),
        ("sessionize", sess_stream, sess_batch),
    ]:
        for rep in range(REPEATS):
            name = f"prof_{label}_{rep}"
            t0 = time.perf_counter()
            q = sfn(name)
            t_start = time.perf_counter() - t0
            assert q.awaitTermination(600)
            t_total = time.perf_counter() - t0
            n = spark.table(name).count()
            batches = []
            for p in q.recentProgress:
                d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)["durationMs"]
                batches.append(d)
            t0 = time.perf_counter()
            bn = bfn().count()
            t_batch = time.perf_counter() - t0
            spark.catalog.clearCache()
            print(
                f"{label} rep{rep}: stream={t_total:.2f}s "
                f"(start() {t_start:.2f}s) batch_twin={t_batch:.2f}s "
                f"rows={n}/{bn} floor={t_total - t_batch:.2f}s",
                flush=True,
            )
            for i, d in enumerate(batches):
                keep = {
                    k: d.get(k) for k in (
                        "triggerExecution", "queryPlanning", "getBatch",
                        "latestOffset", "addBatch", "walCommit",
                        "commitOffsets",
                    ) if k in d
                }
                print(f"  microbatch{i} durationMs: {keep}", flush=True)


if __name__ == "__main__":
    main()
