#!/usr/bin/env python
"""Compare the latest BENCH_DETAIL_r3.json against the committed
round-2 baseline (BENCH_BASELINE.json) and flag regressions.

The baseline was captured on a different VM boot; successive boots of
the harness differ in raw CPU throughput by 1.5x+ UNIFORMLY (measured:
median ratio 1.5x across 67 untouched queries after a reboot, CPU idle,
zero steal). Raw per-query ratios therefore conflate machine drift
with plan regressions. Normalization: divide each query's ratio by the
median ratio over ALL shared queries — a genuine plan regression shows
up as an outlier against the fleet-wide drift, while a uniformly
slower machine cancels out. A query "regresses" when its normalized
ratio exceeds 1.5x. Sub-0.3 s baselines are exempt (timing noise).
Exit 1 when any headline query regresses; print a table either way.

Usage: python scripts/check_bench_regression.py [detail_json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

HEADLINE = [
    "waiting_suppliers", "migration_copy_lineitem", "min_cost_supplier",
    "cdc_apply_20k_events", "revenue_by_nation", "important_stock",
]
TOLERANCE = 1.5
MIN_BASELINE_SEC = 0.3

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_DETAIL_r3.json")
    with open(os.path.join(ROOT, "BENCH_BASELINE.json")) as f:
        baseline = json.load(f)["queries"]
    with open(detail_path) as f:
        current = json.load(f)["queries"]

    shared = sorted(set(baseline) & set(current))
    drift = statistics.median(
        current[n] / baseline[n] for n in shared
        if baseline[n] >= MIN_BASELINE_SEC) or 1.0
    print(f"machine drift (median ratio, n={len(shared)}): {drift:.2f}x")

    rows, failures = [], []
    for name in shared:
        base, cur = baseline[name], current[name]
        ratio = cur / base if base else float("inf")
        norm = ratio / drift
        flag = ""
        if base >= MIN_BASELINE_SEC and norm > TOLERANCE:
            flag = "REGRESSED" if name in HEADLINE else "slower"
            if name in HEADLINE:
                failures.append(name)
        rows.append((name, base, cur, norm, flag))

    width = max(len(r[0]) for r in rows)
    for name, base, cur, norm, flag in rows:
        if flag or name in HEADLINE:
            print(f"{name:<{width}}  {base:7.3f}s -> {cur:7.3f}s  "
                  f"({norm:4.2f}x normalized) {flag}")
    if failures:
        print(f"\nFAIL: headline regressions: {failures}")
        return 1
    print("\nOK: no headline regression vs r2 baseline "
          f"(drift-normalized at {drift:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
