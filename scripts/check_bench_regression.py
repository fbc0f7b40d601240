#!/usr/bin/env python
"""Compare the latest BENCH_DETAIL_r3.json against the committed
round-2 baseline (BENCH_BASELINE.json) and flag regressions.

A query "regresses" when its wall-clock exceeds 1.5x its baseline
(the VERDICT r2 tolerance). Timing noise at sub-second scale is real,
so queries under 0.3 s baseline are exempt. Exit 1 when any headline
query regresses; print a table either way.

Usage: python scripts/check_bench_regression.py [detail_json]
"""

from __future__ import annotations

import json
import os
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

    rows, failures = [], []
    for name in sorted(set(baseline) & set(current)):
        base, cur = baseline[name], current[name]
        ratio = cur / base if base else float("inf")
        flag = ""
        if base >= MIN_BASELINE_SEC and ratio > TOLERANCE:
            flag = "REGRESSED" if name in HEADLINE else "slower"
            if name in HEADLINE:
                failures.append(name)
        rows.append((name, base, cur, ratio, flag))

    width = max(len(r[0]) for r in rows)
    for name, base, cur, ratio, flag in rows:
        if flag or name in HEADLINE:
            print(f"{name:<{width}}  {base:7.3f}s -> {cur:7.3f}s  "
                  f"({ratio:4.2f}x) {flag}")
    if failures:
        print(f"\nFAIL: headline regressions: {failures}")
        return 1
    print("\nOK: no headline regression vs r2 baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
