#!/usr/bin/env python
"""Per-query phase profiler: splits a query's wall time into
  build  — Python-side DataFrame construction (py4j expression tree)
  plan   — analysis + optimization + physical planning + codegen
           (forcing queryExecution().executedPlan())
  exec   — actual execution (collect) after the plan is forced
so optimization effort lands on the right phase (guide §1: measure
first; §7.3: large plans make PLANNING the bottleneck — driver-side,
single-threaded, unaffected by cluster size).

Usage: python scripts/profile_phases.py [--sf-dir D] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hummingbird_spark.plans.queries import QUERIES  # noqa: E402
from hummingbird_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="profile_phases")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    warm_dir = "/root/testdata/sf0.001"
    names = (list(QUERIES) if args.names == ["ALL"] else args.names)
    for name in names:
        spec = QUERIES[name]
        try:
            spec.spark(spark, warm_dir).collect()  # codegen/JIT warm
        except Exception:
            pass
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = spec.spark(spark, args.sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            n = len(df.collect())
            t3 = time.perf_counter()
            cur = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
            if best is None or cur[3] < best[3]:
                best = cur
        b, p, e, tot = best
        print(f"{name}: build={b:.3f} plan={p:.3f} exec={e:.3f} "
              f"total={tot:.3f} rows={n}", flush=True)


if __name__ == "__main__":
    main()
