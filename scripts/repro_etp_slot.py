#!/usr/bin/env python
"""Reproduce embedding_top_pairs' full-bench-slot anomaly (r5/r6
verdict watch item): the committed driver bench read 6.2s vs a 1.0s
baseline in three consecutive rounds, while standalone re-times are
always clean. This harness replays the bench context faithfully —
full sf0.001 warm pass over the WHOLE registry, then the timed loop
in registry order up to and including embedding_top_pairs — and then
re-times the query in isolation in the SAME session, printing both
numbers so the slot interaction (if any) is observable directly."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hummingbird_spark.plans.queries import QUERIES  # noqa: E402
from hummingbird_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = "embedding_top_pairs"


def main() -> None:
    spark = get_spark(app_name="repro_etp_slot")
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["status_counts"].spark(spark, SF_DIR).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    warm_dir = "/root/testdata/sf0.001"
    names = list(QUERIES)
    upto = names.index(TARGET)
    print(f"[repro] target at slot {upto} of {len(names)}", flush=True)
    t0 = time.perf_counter()
    for name, spec in QUERIES.items():
        try:
            spec.spark(spark, warm_dir).collect()
        except Exception:
            pass
    print(f"[repro] warm pass done in {time.perf_counter()-t0:.1f}s",
          flush=True)

    for name in names[:upto]:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        n = df.count() if "stream" in name else len(df.collect())
        print(f"[slot] {name}: {time.perf_counter()-t0:.2f}s "
              f"rows={n}", flush=True)

    spec = QUERIES[TARGET]
    t0 = time.perf_counter()
    n = len(spec.spark(spark, SF_DIR).collect())
    in_slot = time.perf_counter() - t0
    print(f"[IN-SLOT] {TARGET}: {in_slot:.2f}s rows={n}", flush=True)

    for rep in range(4):
        t0 = time.perf_counter()
        n = len(spec.spark(spark, SF_DIR).collect())
        print(f"[RETIME {rep}] {TARGET}: {time.perf_counter()-t0:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
