#!/usr/bin/env python
"""Compare the latest BENCH_DETAIL.json against the committed
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
        ROOT, "BENCH_DETAIL.json")
    with open(os.path.join(ROOT, "BENCH_BASELINE.json")) as f:
        base_doc = json.load(f)
    with open(detail_path) as f:
        cur_doc = json.load(f)
    baseline, current = base_doc["queries"], cur_doc["queries"]

    shared = sorted(set(baseline) & set(current))
    ratios = [current[n] / baseline[n] for n in shared
              if baseline[n] >= MIN_BASELINE_SEC]
    # statistics.median raises on an empty list (e.g. disjoint query
    # sets or all-sub-second baselines) — fall back to no-drift
    median_drift = statistics.median(ratios) if ratios else 1.0
    median_drift = median_drift or 1.0
    # When both runs carry the fixed-slot calibration probe (bench.py::
    # _calibrate, r4+), drift is MEASURED as the ratio of a
    # data-independent CPU-bound job, not inferred from the query
    # median — the median stays printed as a cross-check.
    cal_b = base_doc.get("calibration_sec")
    cal_c = cur_doc.get("calibration_sec")
    if cal_b and cal_c:
        drift = cal_c / cal_b
        print(f"machine drift (calibration probe): {drift:.2f}x "
              f"[query-median cross-check: {median_drift:.2f}x, "
              f"n={len(ratios)}]")
    else:
        drift = median_drift
        print(f"machine drift (median ratio, n={len(ratios)} of "
              f"{len(shared)} shared; no calibration in baseline): "
              f"{drift:.2f}x")

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

    if not rows:
        print("\nOK: no shared queries to compare")
        return 0
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
