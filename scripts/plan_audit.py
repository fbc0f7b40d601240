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

EXECUTED-plan audit (r11 verdict item 7): the static fingerprint is
taken pre-execution, so a localCheckpoint built during query
construction hides its subtree's exchanges, and three r11 refreezes
were needed just to re-count them. The --executed-* modes run the
top-N most expensive queries (frozen-median rank, pinned below) at
sf0.001 and fingerprint the FINAL adaptive plan (isFinalPlan=true) —
including a ReusedExchange count, so losing an exchange-reuse (a
regression invisible statically) flags, and an injected extra shuffle
in the executed path cannot hide behind a checkpoint boundary
(pinned by tests/test_plan_quality.py).

Usage:
    python scripts/plan_audit.py --freeze   # write PLAN_BASELINE.json
    python scripts/plan_audit.py --check    # diff vs baseline, exit 1 on drift
    python scripts/plan_audit.py --executed-freeze  # PLAN_BASELINE_EXECUTED.json
    python scripts/plan_audit.py --executed-check
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
EXEC_BASELINE = os.path.join(ROOT, "PLAN_BASELINE_EXECUTED.json")
SF = "/root/testdata/sf0.001"

# The executed audit's query set: the 20 most expensive registry
# entries by the r11 frozen medians, PINNED (not recomputed from the
# current freeze) so the audited set cannot silently rotate away from
# a regressed query. link_canonical_docs (rank 9) is EXCLUDED as
# AQE-nondeterministic at sf0.001: one of its joins sits on a size
# threshold and flips SMJ<->broadcast between identical runs (measured
# 39 exchanges/10 SMJ vs 38/9 back to back), so its executed
# fingerprint cannot be a baseline; dsir_logweights (rank 21) takes
# its slot.
EXECUTED_TOP = [
    "versioned_pagerank", "curation_composite_weights",
    "kn_perplexity_capped", "trustrank_scores", "winnow_pairs",
    "classifier_scores", "classifier_eval", "quality_canonical_dedup",
    "cross_source_dups",
    "migration_copy_verify", "cdc_apply_verify", "kn_perplexity",
    "corpus_curation", "dup_clusters", "web_link_pagerank",
    "link_pagerank_weighted", "link_pagerank", "bpe_fertility",
    "gopher_repetition", "dsir_logweights",
]

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


def executed_fingerprint(df) -> dict:
    """Fingerprint of the FINAL adaptive plan: run the query, then
    read the executed plan (AQE re-optimizes per stage; after the
    action the tree prints isFinalPlan=true). ReusedExchange is part
    of the fingerprint — the single-plan staging optimizations are
    claimed on it, and losing one is a real regression the static
    audit cannot see."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": plan.count("ReusedExchange"),
        "scans": plan.count("Scan parquet"),
        "imr_scans": plan.count("InMemoryTableScan"),
        "smj": plan.count("SortMergeJoin"),
        "pyeval": plan.count("BatchEvalPython"),
        "arrow": sum(plan.count(op) for op in _ARROW_OPS),
        "nlj": (plan.count("BroadcastNestedLoopJoin")
                + plan.count("CartesianProduct")),
        "final": "isFinalPlan=true" in plan,
    }


def collect_executed(spark) -> dict:
    from hummingbird_spark.plans.queries import QUERIES

    out = {}
    for name in EXECUTED_TOP:
        if name not in QUERIES:  # pragma: no cover - registry drift
            out[name] = {"error": "not in registry"}
            continue
        try:
            out[name] = executed_fingerprint(
                QUERIES[name].spark(spark, SF))
        except Exception as exc:  # pragma: no cover - audit robustness
            out[name] = {"error": str(exc)[:200]}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--freeze", action="store_true")
    mode.add_argument("--check", action="store_true")
    mode.add_argument("--executed-freeze", action="store_true")
    mode.add_argument("--executed-check", action="store_true")
    args = ap.parse_args()

    from hummingbird_spark.session import get_spark

    spark = get_spark(app_name="hb_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    if args.executed_freeze or args.executed_check:
        current = collect_executed(spark)
        if args.executed_freeze:
            with open(EXEC_BASELINE, "w") as fh:
                json.dump(current, fh, indent=1, sort_keys=True)
            print(f"froze {len(current)} executed fingerprints -> "
                  f"{EXEC_BASELINE}")
            return 0
        with open(EXEC_BASELINE) as fh:
            base = json.load(fh)
        drift = [(n, base.get(n), cur) for n, cur in current.items()
                 if base.get(n) != cur]
        if drift:
            print(f"EXECUTED-PLAN DRIFT in {len(drift)} queries:")
            for name, old, cur in drift:
                print(f"  {name}: {old} -> {cur}")
            return 1
        print(f"executed-plan audit clean: {len(current)} "
              "fingerprints match baseline")
        return 0

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
