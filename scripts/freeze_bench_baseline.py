#!/usr/bin/env python
"""Freeze a per-round bench baseline the r10 way: run bench.py N
times back-to-back on an idle machine, take PER-QUERY MEDIANS and the
median calibration probe (single-run freezes bake in per-entry luck —
the r9 canonical_consolidation false flag), and write
BENCH_BASELINE_R{N}.json. Prints the drift vs the previous baseline
for the freeze decision.

Usage: python scripts/freeze_bench_baseline.py --round 11 [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--prev", default=None,
                    help="previous baseline json (drift report)")
    args = ap.parse_args()

    runs: list[dict] = []
    for i in range(args.runs):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, cwd=ROOT, check=True)
        # the stdout line carries only the total (the per-query map
        # overflowed the fd-1 buffer back in r02) — the full map is
        # persisted to BENCH_DETAIL.json each run
        with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as fh:
            doc = json.load(fh)
        runs.append(doc)
        print(f"run {i + 1}/{args.runs}: total={doc['value']:.1f}s "
              f"calibration={doc.get('calibration_sec')}",
              flush=True)

    names = set().union(*(r["queries"] for r in runs))
    medians = {
        n: round(statistics.median(
            r["queries"][n] for r in runs if n in r["queries"]), 4)
        for n in sorted(names)
    }
    base = dict(runs[-1])
    base["queries"] = medians
    base["value"] = round(sum(medians.values()), 2)
    cals = [r["calibration_sec"] for r in runs
            if r.get("calibration_sec") is not None]
    if cals:
        base["calibration_sec"] = round(statistics.median(cals), 4)
    base["freeze_runs"] = args.runs

    out_path = os.path.join(ROOT, f"BENCH_BASELINE_R{args.round}.json")
    with open(out_path, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
    print(f"froze {len(medians)} query medians -> {out_path}")

    prev = args.prev or os.path.join(
        ROOT, f"BENCH_BASELINE_R{args.round - 1}.json")
    if os.path.exists(prev):
        with open(prev) as fh:
            pdoc = json.load(fh)
        shared = sorted(set(pdoc["queries"]) & set(medians))
        ratios = sorted(
            ((medians[n] / pdoc["queries"][n], n) for n in shared
             if pdoc["queries"][n] >= 0.3), reverse=True)
        tot_prev = sum(pdoc["queries"][n] for n in shared)
        tot_now = sum(medians[n] for n in shared)
        print(f"vs {os.path.basename(prev)}: shared total "
              f"{tot_prev:.1f}s -> {tot_now:.1f}s "
              f"({tot_now / tot_prev:.2f}x)")
        for r, n in ratios[:8]:
            print(f"  {r:5.2f}x  {n} "
                  f"({pdoc['queries'][n]:.2f} -> {medians[n]:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
