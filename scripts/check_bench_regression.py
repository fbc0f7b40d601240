#!/usr/bin/env python
"""Compare the latest BENCH_DETAIL.json against the committed
baselines and flag regressions.

Two baselines, two normalizations:
  - BENCH_BASELINE.json (round-2): predates the calibration probe, so
    drift is INFERRED as the median ratio across all shared queries
    with baseline >= 0.3 s (measured: successive VM boots differ
    1.3-1.5x uniformly in raw CPU throughput).
  - BENCH_BASELINE_R4.json (round-4): carries `calibration_sec` — the
    fixed-slot, data-independent CPU probe bench.py times first every
    run — so drift is MEASURED as the calibration ratio; the query
    median is printed as a cross-check.

A query "regresses" when its drift-normalized ratio exceeds 1.5x.
Sub-0.3 s baselines are exempt (timing noise). Exit 1 when any
headline query regresses against ANY baseline; print tables either way.

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
    # r4 additions: the oracle-proven effectful pipelines
    "migration_copy_verify", "cdc_apply_verify",
]
TOLERANCE = 1.5
MIN_BASELINE_SEC = 0.3

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def compare(base_path: str, cur_doc: dict, label: str) -> list[str]:
    """Run one baseline comparison; returns headline failure names."""
    with open(base_path) as f:
        base_doc = json.load(f)
    baseline, current = base_doc["queries"], cur_doc["queries"]

    shared = sorted(set(baseline) & set(current))
    ratios = [current[n] / baseline[n] for n in shared
              if baseline[n] >= MIN_BASELINE_SEC]
    # statistics.median raises on an empty list (e.g. disjoint query
    # sets or all-sub-second baselines) — fall back to no-drift
    median_drift = statistics.median(ratios) if ratios else 1.0
    median_drift = median_drift or 1.0
    cal_b = base_doc.get("calibration_sec")
    cal_c = cur_doc.get("calibration_sec")
    print(f"== vs {label} ==")
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
        # a true plan regression is slower under ANY drift estimate;
        # an artifact of the normalization appears under only one —
        # the CPU-bound probe and the mixed query workload can drift
        # differently (measured: probe 0.71x vs query-median 0.93x in
        # one boot), so require both estimates to agree before
        # flagging
        if (base >= MIN_BASELINE_SEC and norm > TOLERANCE
                and ratio / median_drift > TOLERANCE):
            flag = "REGRESSED" if name in HEADLINE else "slower"
            if name in HEADLINE:
                failures.append(name)
        rows.append((name, base, cur, norm, flag))

    if not rows:
        print("no shared queries to compare\n")
        return []
    width = max(len(r[0]) for r in rows)
    for name, base, cur, norm, flag in rows:
        if flag or name in HEADLINE:
            print(f"{name:<{width}}  {base:7.3f}s -> {cur:7.3f}s  "
                  f"({norm:4.2f}x normalized) {flag}")
    if failures:
        print(f"FAIL: headline regressions vs {label}: {failures}\n")
    else:
        print(f"OK: no headline regression vs {label} "
              f"(drift-normalized at {drift:.2f}x)\n")
    return failures


def main() -> int:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        cur_doc = json.load(f)

    failures: list[str] = []
    for fname, label in (
        ("BENCH_BASELINE_R4.json", "r4 baseline (calibration-pinned)"),
        ("BENCH_BASELINE.json", "r2 baseline (median-normalized)"),
    ):
        path = os.path.join(ROOT, fname)
        if os.path.exists(path):
            failures += compare(path, cur_doc, label)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
