#!/usr/bin/env python
"""Interleaved cross-version bench A/B (round-5 VERDICT items 1+2).

Bench hygiene on this host: only min-of-n INTERLEAVED timings count as
perf evidence (same-binary spread is 20-25% when idle, worse loaded).
This runner makes every cross-round query delta self-evidencing:

  - checks out the comparison rev into a git worktree (/tmp/ab_<rev>),
  - runs bench.py (SPARK_GRAFT_BENCH_ONLY=<queries>) in ALTERNATING
    processes old/new/old/new... with the order swapped every pair so
    slow host drift cancels instead of biasing one side,
  - each process already reports per-query min-of-RUNS plus per-run
    host busy/steal (bench.py), so each delta carries its own control,
  - prints a markdown table: per-query old/new run arrays, min-of-all,
    ratio, and a verdict (separated vs overlapping-with-spread).

Usage:
  python scripts/bench_ab.py --old=faee011 --queries=a,b,c \
      [--pairs=3] [--runs=3] [--json=/tmp/ab.json] [--full]

  --full runs each process over the WHOLE registry in bench order (the
  driver's operating point) while still reporting only --queries.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd: list[str], **kw) -> str:
    return subprocess.run(
        cmd, check=True, capture_output=True, text=True, **kw
    ).stdout


def ensure_worktree(rev: str) -> str:
    path = f"/tmp/ab_{rev}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, rev],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def run_bench(tree: str, queries: list[str], runs: int, full: bool = False) -> dict:
    """One bench.py process in `tree`; returns its JSON line + context.

    ``full`` runs the ENTIRE registry in its bench order (reported queries
    are still just `queries`) — the round-6 VERDICT wrong-#2 protocol: a
    delta reproduced by the driver's full-bench run must be controlled at
    the same operating point, i.e. with the same preceding-query session
    state (JVM/codegen warmth, GC pressure), not in an isolated process
    that runs the target query cold-session."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY="" if full else ",".join(queries),
        SPARK_GRAFT_BENCH_RUNS=str(runs),
        PYTHONPATH=tree,
    )
    # Run-count symmetry (round-11 lesson): bench.py's contention-aware
    # clean-run extension can hand the two SIDES different run counts when
    # steal fluctuates (one side's single run counts clean, the other
    # extends to 8 warm repeats -> min-of-8-warm vs min-of-1-cold read as a
    # fake 0.28x).  Cross-rev A/B therefore pins the steal gate OFF so every
    # process does exactly `runs` runs; contention still shows in the
    # per-run busy/steal arrays and cancels across swapped pairs.
    env.setdefault("SPARK_GRAFT_BENCH_STEAL_MAX", "100")
    t0 = time.time()
    load0 = os.getloadavg()[0]
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}:\n{proc.stderr[-3000:]}")
    # bench.py emits the full record first and the compact headline last
    # (round-7 emission-order fix); merge every JSON line — later keys win —
    # so `runs` (full record) and `queries`/`value` (headline) are both
    # present.  Old revs emit a single line; the merge is a no-op there.
    out: dict = {}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            out.update(json.loads(line))
    out["_wall"] = round(time.time() - t0, 1)
    out["_load_before"] = round(load0, 1)
    out["_load_after"] = round(os.getloadavg()[0], 1)
    out["_t_start"] = round(t0, 1)
    return out


def main() -> None:
    old_rev, queries, pairs, runs, json_path = None, None, 3, 3, None
    full = False
    for a in sys.argv[1:]:
        if a == "--full":
            full = True
            continue
        if a.startswith("--old="):
            old_rev = a.split("=", 1)[1]
        elif a.startswith("--queries="):
            queries = [q for q in a.split("=", 1)[1].split(",") if q]
        elif a.startswith("--pairs="):
            pairs = int(a.split("=", 1)[1])
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--json="):
            json_path = a.split("=", 1)[1]
    assert old_rev and queries, "--old=<rev> --queries=a,b,c required"

    old_tree = ensure_worktree(old_rev)
    results: dict[str, list[dict]] = {"old": [], "new": []}
    for p in range(pairs):
        order = [("old", old_tree), ("new", REPO)]
        if p % 2:  # swap per pair so drift cancels
            order.reverse()
        for label, tree in order:
            r = run_bench(tree, queries, runs, full=full)
            results[label].append(r)
            print(
                f"# pair{p} {label}: "
                + " ".join(
                    f"{q}={min(r['runs'][q]):.2f}" for q in queries
                    if r["runs"].get(q)
                )
                + f"  busy={r['host_busy_per_run']} load={r['_load_before']}"
                  f"->{r['_load_after']}",
                file=sys.stderr, flush=True,
            )

    if json_path:
        with open(json_path, "w") as f:
            json.dump(
                {"old_rev": old_rev, "pairs": pairs, "runs": runs,
                 "results": results},
                f, indent=1,
            )

    print(f"\n## interleaved A/B: {old_rev} (old) vs HEAD (new), "
          f"{pairs} alternating process pairs, min-of-{runs} internal\n")
    print("| query | old runs (s) | new runs (s) | old min | new min |"
          " new/old | verdict |")
    print("|---|---|---|---|---|---|---|")
    for q in queries:
        olds = [t for r in results["old"] for t in r["runs"].get(q, [])]
        news = [t for r in results["new"] for t in r["runs"].get(q, [])]
        omin, nmin = min(olds), min(news)
        # per-pair process mins, the unit the protocol compares
        opm = [min(r["runs"][q]) for r in results["old"]]
        npm = [min(r["runs"][q]) for r in results["new"]]
        # separated iff the process-min bands do not overlap
        sep = min(npm) > max(opm) or max(npm) < min(opm)
        verdict = (
            "separated (regression)" if sep and nmin > omin
            else "separated (improvement)" if sep
            else "overlapping — host noise"
        )
        fmt = lambda xs: "{" + ", ".join(f"{x:.2f}" for x in xs) + "}"
        print(f"| {q} | {fmt(opm)} | {fmt(npm)} | {omin:.2f} | {nmin:.2f} |"
              f" {nmin / omin:.2f}x | {verdict} |")
    busy = [b for r in results["old"] + results["new"]
            for b in r["host_busy_per_run"]]
    print(f"\nhost busy per bench run across all processes: "
          f"min {min(busy):.0f}% / median "
          f"{sorted(busy)[len(busy) // 2]:.0f}% / max {max(busy):.0f}%")


if __name__ == "__main__":
    main()
