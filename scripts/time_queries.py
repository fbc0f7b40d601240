#!/usr/bin/env python
"""Standalone per-query timing harness: warms each named query's plan
at sf0.001 (codegen/JIT), then times N reps at sf0.1 and prints
min/median/max per query. Used to adjudicate bench drift without the
~5-minute full bench.py run (r5 verdict items 3-5)."""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hummingbird_spark.plans.queries import QUERIES  # noqa: E402
from hummingbird_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    # spin up the Arrow worker pool once (same rationale as bench.py)
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    warm_dir = "/root/testdata/sf0.001"
    for name in args.names:
        spec = QUERIES[name]
        if os.path.isdir(warm_dir):
            try:
                spec.spark(spark, warm_dir).collect()
            except Exception:
                pass
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = len(spec.spark(spark, args.sf_dir).collect())
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times):.3f} med={statistics.median(times):.3f}"
              f" max={max(times):.3f} rows={n}", flush=True)


if __name__ == "__main__":
    main()
