#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hummingbird_spark.plans.queries import QUERIES  # noqa: E402
from hummingbird_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="hummingbird_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup
    QUERIES["status_counts"].spark(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        n = df.count() if "stream" in name else len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }))


if __name__ == "__main__":
    main()
