"""Plan-shape baseline: freeze the physical-plan fingerprint of every
registry query and flag regressions mechanically.

The bench catches time regressions; this catches PLAN regressions —
the kind that are invisible at sf0.1 but melt a 1000-executor run: an
extra shuffle, a broadcast that silently became a sort-merge join, a
staged frame that started re-scanning parquet, a built-in expression
that fell back to Python. Each query's fingerprint is:

    exchanges   — count of Exchange operators (shuffles + broadcasts)
    scans       — count of parquet scans (staging regressions double it)
    smj         — SortMergeJoin count (broadcast fallbacks show here)
    pyeval      — BatchEvalPython / row-at-a-time Python (must stay 0)
    arrow       — Arrow-batched Python ops (mapInPandas etc.; the
                  sanctioned kernel seams — should only move by design)
    nlj         — BroadcastNestedLoopJoin + CartesianProduct: the
                  classic fatal-at-scale drift (a join predicate that
                  silently stopped being an equi-join). Pinned per
                  query: by-design cross joins (all-pairs kernels,
                  range joins) keep their count; any CHANGE flags

Fingerprints come from the INITIAL physical plan (pre-AQE, nothing
materialized) at sf0.001, so the audit is fast and deterministic:
same data + same config -> same plan. Effectful verify queries
(copy/CDC/rollup/z-order) RUN their pipeline at build time by design;
they are fingerprinted too — their collect is bounded at sf0.001.

Usage:
    python scripts/plan_audit.py --freeze   # write PLAN_BASELINE.json
    python scripts/plan_audit.py --check    # diff vs baseline, exit 1 on drift
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASELINE = os.path.join(ROOT, "PLAN_BASELINE.json")
SF = "/root/testdata/sf0.001"

# Python-eval seams: row-at-a-time is banned outright; Arrow seams are
# design decisions that should change only deliberately.
_ARROW_OPS = ("MapInPandas", "FlatMapGroupsInPandas",
              "FlatMapGroupsInPandasWithState", "ArrowEvalPython")


def fingerprint(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "scans": plan.count("Scan parquet"),
        "smj": plan.count("SortMergeJoin"),
        "pyeval": plan.count("BatchEvalPython"),
        "arrow": sum(plan.count(op) for op in _ARROW_OPS),
        "nlj": (plan.count("BroadcastNestedLoopJoin")
                + plan.count("CartesianProduct")),
    }


def collect(spark) -> dict:
    from hummingbird_spark.plans.queries import QUERIES

    out = {}
    for name in sorted(QUERIES):
        try:
            out[name] = fingerprint(QUERIES[name].spark(spark, SF))
        except Exception as exc:  # pragma: no cover - audit robustness
            out[name] = {"error": str(exc)[:200]}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--freeze", action="store_true")
    mode.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from hummingbird_spark.session import get_spark

    spark = get_spark(app_name="hb_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    current = collect(spark)

    if args.freeze:
        with open(BASELINE, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
        bad = [n for n, f in current.items() if f.get("pyeval")]
        print(f"froze {len(current)} fingerprints -> {BASELINE}")
        if bad:
            print(f"WARNING: row-at-a-time Python in: {bad}")
            return 1
        return 0

    with open(BASELINE) as fh:
        base = json.load(fh)
    drift = []
    for name, cur in current.items():
        old = base.get(name)
        if old is None:
            drift.append((name, "NEW (not in baseline — re-freeze)", cur))
        elif old != cur:
            drift.append((name, old, cur))
    for name in base:
        if name not in current:
            drift.append((name, base[name], "REMOVED"))
    hard = [d for d in drift
            if isinstance(d[2], dict) and d[2].get("pyeval")]
    if drift:
        print(f"PLAN DRIFT in {len(drift)} queries:")
        for name, old, cur in drift:
            print(f"  {name}: {old} -> {cur}")
        if hard:
            print(f"row-at-a-time Python appeared in: "
                  f"{[d[0] for d in hard]}")
        return 1
    print(f"plan audit clean: {len(current)} fingerprints match baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
