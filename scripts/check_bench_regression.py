#!/usr/bin/env python
"""Compare the latest BENCH_DETAIL.json against the committed
baseline and flag regressions.

The baseline (BENCH_BASELINE_R10.json, refrozen per round) carries
`calibration_sec` — the fixed-slot, data-independent CPU probe
bench.py times first every run. When both sides have it, the
calibration ratio IS the drift estimate and is AUTHORITATIVE: a query
is flagged on its calibration-normalized ratio alone. The query-median
ratio is printed as a cross-check, and a loud DRIFT-DISAGREEMENT
warning fires when the two estimates differ by more than 1.3x —
requiring consensus instead would re-introduce median masking (a
uniform plan regression across many queries inflates the median drift
estimate, so ratio/median_drift stays ~1.0 and nothing flags, which is
exactly the failure mode the calibration probe was added to catch).
Median normalization is used only as a fallback for a baseline with no
calibration record.

A query "regresses" when its drift-normalized ratio exceeds 1.5x.
Sub-0.3 s baselines are exempt (timing noise). Exit 1 when any
headline query regresses; print tables either way.

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
DRIFT_DISAGREE = 1.3  # calibration vs query-median: warn beyond this

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
        # the calibration probe is data-independent, so its ratio is
        # the authoritative drift estimate; the query median is only a
        # cross-check (it is contaminated by any uniform plan
        # regression, which is the thing we're trying to detect)
        drift = cal_c / cal_b
        print(f"machine drift (calibration probe, authoritative): "
              f"{drift:.2f}x [query-median cross-check: "
              f"{median_drift:.2f}x, n={len(ratios)}]")
        disagree = (max(drift, median_drift)
                    / max(min(drift, median_drift), 1e-9))
        if disagree > DRIFT_DISAGREE:
            print(f"WARNING: DRIFT-DISAGREEMENT {disagree:.2f}x — the "
                  f"CPU probe ({drift:.2f}x) and the query median "
                  f"({median_drift:.2f}x) tell different stories; "
                  f"either the boot changed character (I/O vs CPU) or "
                  f"a uniform plan regression is inflating the "
                  f"median. Inspect before trusting a green result.")
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

    # single calibration-bearing baseline since r5: the r2
    # median-normalized baseline was dropped once the calibration
    # protocol was confirmed across a boot change (continuity note
    # SURVEY $13.2) — two baselines with different normalizations gave
    # two verdicts for one run. Refrozen per round from a clean
    # BENCH_DETAIL.json so every current entry is baselined. The r7
    # freeze was measured idle (load 0.00), covers all 195 entries
    # (191 queries + 4 throughput jobs), and the per-query median vs
    # the r6 baseline is ~0.99x raw — the round got faster per query
    # while adding 7 entries; notably embedding_top_pairs 1.00 ->
    # 0.72s after the parallelism-floor fix ended its three-round
    # slot-variance saga.
    failures = compare(
        os.path.join(ROOT, "BENCH_BASELINE_R11.json"), cur_doc,
        "r11 baseline (calibration-pinned)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
