#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python scripts/dump_plans.py --tag=r11_before [--only=q1,q2] [--suffix=_before]

Writes plans/<round>/<query><suffix>.txt (round/suffix split from --tag at the
last underscore), e.g. --tag=r11_before -> plans/r11/<query>_before.txt.
Building a query's DataFrame may run eager prep jobs (quantile boundaries,
model fits, streaming snapshots); that is the price of the real plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = "r11_before"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    rnd, _, suffix = tag.rpartition("_")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", rnd)
    os.makedirs(outdir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from melody_join_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            failed.append(name)
            txt = f"PLAN CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"{name}: {'FAIL' if name in failed else 'ok'}", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    if failed:
        print(f"FAILED: {sorted(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
